"""Duplicate n-gram character coverage (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better" — the ExactSubstr coverage
metric): for every document, the fraction of its characters covered by at
least one 40-char gram that occurs >= 2 times anywhere in the corpus
(including a second occurrence inside the same document).

Contract both engines are pinned to (DuckDB oracle in __ray_entry__):

- a gram is the CHARACTER substring ``text[p : p+40]`` at every offset
  ``p in [0, len-40]``; docs shorter than 40 chars contribute nothing and
  score 0.0;
- "duplicate" means total occurrence count >= ``min_count`` (default 2)
  over all positions of all docs;
- per-doc coverage is the interval-union length of ``[p, p+40)`` over the
  doc's duplicate positions; ``dup_cov = covered_chars / n_chars``
  (0.0 when ``n_chars == 0``).

The corpus contract is ASCII text (asserted per batch: utf8 char count ==
byte count), so char offsets == byte offsets and the whole explode is one
numpy pass over the batch's flat string buffer — no per-row Python.

Gram identity is a 128-bit pair of independent polynomial rolling hashes
(multiplicative, mod 2**64; O(1) per position via prefix sums and the
modular inverse of the odd base). Two DIFFERENT grams colliding on both
64-bit hashes would be counted as one (P ~ n^2 / 2^128; ~1e-14 even at
10^12 grams) — documented approximation; the exact-guarantee substring
path for dedup DECISIONS is ops/substring.py's winnowing pipeline, this
op is the corpus-quality METRIC.

Scale shape:

- census: per-batch combiner folds each batch's positions to distinct
  (h1, h2, count) partials (repetition collapses before the exchange),
  then ONE h1-keyed exchange merges partials and keeps count >= 2 — the
  exchange is distinct-gram-bounded, the output duplicate-gram-bounded;
- mark, ``mode="broadcast"`` (auto while the dup census fits the gate):
  the census ships ONCE via ray.put as lexsorted (h1, h2) arrays; each
  explode batch probes by two-level searchsorted and computes its docs'
  interval unions IN THE BATCH (each row is a whole doc), so there is no
  second corpus-sized exchange at all;
- mark, ``mode="exchange"`` (no-broadcast fallback past the gate): the
  position table moves through an h1-keyed exchange (corpus-char-sized —
  the honest cost of exact global gram counting without a broadcast;
  Lee et al. pay the equivalent suffix-array sort), groups with
  count >= 2 emit their (doc_id, pos) rows (duplicate-bounded), and a
  doc-keyed exchange unions intervals per doc; both modes parity-tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from nise_ray.ops.groupapply import (default_concurrency, hash_group_apply,
                                     segments)

GRAM_CHARS = 40
_P1 = 0x9E3779B97F4A7C15  # odd -> invertible mod 2**64
_P2 = 0xC2B2AE3D27D4EB4F
_INV1 = pow(_P1, -1, 1 << 64)
_INV2 = pow(_P2, -1, 1 << 64)


class _PowCache:
    """Per-actor cache of the rolling-hash power/inverse-power tables
    (p^i and p^-i for i < n), grown geometrically as longer batches
    arrive — the stateful-stage pattern: amortized one multiply chain per
    actor lifetime, not one per batch."""

    def __init__(self) -> None:
        self._n = 0
        self._tabs: tuple[np.ndarray, ...] | None = None

    def tables(self, n: int):
        if n > self._n:
            m = max(2 * self._n, n, 4096)
            tabs = []
            for base in (_P1, _INV1, _P2, _INV2):
                t = np.full(m, np.uint64(base), dtype=np.uint64)
                t[0] = np.uint64(1)
                np.multiply.accumulate(t, out=t)
                tabs.append(t)
            self._tabs = tuple(tabs)
            self._n = m
        return self._tabs


def _flat_ascii(txt: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint8 byte buffer, per-row [start, end) byte offsets) of a
    StringArray, asserting the ASCII contract (char count == byte count)
    so char-offset semantics hold on the byte buffer."""
    import pyarrow.compute as pc

    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    bufs = txt.buffers()
    off = np.frombuffer(bufs[1], dtype=np.int32,
                        count=len(txt) + 1 + txt.offset)[txt.offset:]
    off = off.astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8, count=int(off[-1]))
    n_chars = pc.sum(pc.utf8_length(txt)).as_py() or 0
    n_bytes = int(off[-1] - off[0])
    if n_chars != n_bytes:
        raise ValueError(
            "dup_ngram_coverage requires ASCII text (char==byte offsets); "
            f"batch has {n_bytes} bytes but {n_chars} chars")
    return data, off


def _positions(off: np.ndarray, gram: int):
    """(row, intra, gstart) for every gram start position: row index,
    char offset within the doc, and global byte offset into the flat
    buffer. Rows shorter than ``gram`` contribute no positions."""
    ln = np.diff(off)
    npos = np.maximum(ln - gram + 1, 0)
    total = int(npos.sum())
    if total == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z
    row = np.repeat(np.arange(len(ln), dtype=np.int64), npos)
    first = np.zeros(len(ln) + 1, dtype=np.int64)
    np.cumsum(npos, out=first[1:])
    intra = np.arange(total, dtype=np.int64) - first[:-1][row]
    return row, intra, off[:-1][row] + intra


def _gram_hashes(data: np.ndarray, off: np.ndarray, gstart: np.ndarray,
                 gram: int, pows) -> tuple[np.ndarray, np.ndarray]:
    """128-bit rolling hashes of the ``gram``-byte windows at ``gstart``:
    H(s) = sum_{j<gram} data[s+j] * p^j, via prefix sums S[i] =
    sum_{j<i} data[j]*p^j and H(s) = (S[s+gram]-S[s]) * p^-s — one O(n)
    pass per base, uint64 wraparound arithmetic throughout."""
    p1, i1, p2, i2 = pows
    base = int(off[0])
    n = int(off[-1]) - base
    w = data[base:base + n].astype(np.uint64)
    out = []
    for pw, ipw in ((p1, i1), (p2, i2)):
        s = np.zeros(n + 1, dtype=np.uint64)
        np.cumsum(w * pw[:n], out=s[1:])
        gs = gstart - base
        out.append((s[gs + gram] - s[gs]) * ipw[gs])
    return out[0], out[1]


def _pair_segments(h1: np.ndarray, h2: np.ndarray):
    """(order, starts, counts) of equal (h1, h2) runs after lexsort."""
    order = np.lexsort((h2, h1))
    h1s, h2s = h1[order], h2[order]
    chg = np.empty(len(order), dtype=bool)
    chg[0] = True
    chg[1:] = (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])
    starts = np.flatnonzero(chg)
    counts = np.diff(np.append(starts, len(order)))
    return order, starts, counts


class _CensusPartial:
    """Explode + per-batch combiner: distinct (h1, h2, n_p) per batch."""

    def __init__(self, gram: int = GRAM_CHARS) -> None:
        self._gram = gram
        self._pows = _PowCache()

    def __call__(self, b: pa.Table) -> pa.Table:
        empty = pa.table({"h1": pa.array([], pa.uint64()),
                          "h2": pa.array([], pa.uint64()),
                          "n_p": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        data, off = _flat_ascii(b.column("text"))
        _row, _intra, gstart = _positions(off, self._gram)
        if len(gstart) == 0:
            return empty
        pows = self._pows.tables(int(off[-1] - off[0]) + 1)
        h1, h2 = _gram_hashes(data, off, gstart, self._gram, pows)
        order, starts, counts = _pair_segments(h1, h2)
        return pa.table({"h1": pa.array(h1[order[starts]], pa.uint64()),
                         "h2": pa.array(h2[order[starts]], pa.uint64()),
                         "n_p": pa.array(counts, pa.int64())})


def _dup_gram_census(sf_dir: str, gram: int,
                     min_count: int) -> "ray.data.Dataset":
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])
    partials = ds.map_batches(_CensusPartial, fn_constructor_args=(gram,),
                              batch_format="pyarrow", zero_copy_batch=True,
                              concurrency=default_concurrency())

    def merge(b: pa.Table) -> pa.Table:
        empty = pa.table({"h1": pa.array([], pa.uint64()),
                          "h2": pa.array([], pa.uint64()),
                          "n_occurrences": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        h1 = b.column("h1").to_numpy(zero_copy_only=False)
        h2 = b.column("h2").to_numpy(zero_copy_only=False)
        np_ = b.column("n_p").to_numpy(zero_copy_only=False)
        order, starts, _counts = _pair_segments(h1, h2)
        tot = np.add.reduceat(np_[order], starts)
        keep = tot >= min_count
        if not keep.any():
            return empty
        sel = order[starts[keep]]
        return pa.table({"h1": pa.array(h1[sel], pa.uint64()),
                         "h2": pa.array(h2[sel], pa.uint64()),
                         "n_occurrences": pa.array(tot[keep], pa.int64())})

    return hash_group_apply(partials, ["h1"], merge)


def _probe_pairs(h1c: np.ndarray, h2c: np.ndarray,
                 h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """Exact membership of query pairs (h1, h2) in the lexsorted census
    arrays: two-level searchsorted — h1 run located by binary search,
    the (almost always length-1) run scanned by a max-run-bounded loop
    of full-vector compares, so exactness does not depend on h1 alone."""
    if len(h1c) == 0 or len(h1) == 0:
        return np.zeros(len(h1), dtype=bool)
    lo = np.searchsorted(h1c, h1, side="left")
    hi = np.searchsorted(h1c, h1, side="right")
    hit = np.zeros(len(h1), dtype=bool)
    width = int((hi - lo).max()) if len(lo) else 0
    for k in range(width):
        idx = lo + k
        valid = idx < hi
        if not valid.any():
            break
        safe = np.where(valid, idx, 0)
        hit |= valid & (h2c[safe] == h2)
    return hit


def _coverage_by_row(row: np.ndarray, intra: np.ndarray, nrows: int,
                     gram: int) -> np.ndarray:
    """Interval-union length per row of [intra, intra+gram) over the
    (row-major, intra-ascending) duplicate positions."""
    covered = np.zeros(nrows, dtype=np.int64)
    if len(row) == 0:
        return covered
    new_run = np.empty(len(row), dtype=bool)
    new_run[0] = True
    new_run[1:] = (row[1:] != row[:-1]) | (intra[1:] - intra[:-1] > gram)
    rs = np.flatnonzero(new_run)
    run_first = intra[rs]
    run_last = intra[np.append(rs[1:], len(row)) - 1]
    cov_run = run_last - run_first + gram
    run_row = row[rs]
    row_starts, _cnt = segments(run_row)
    covered[run_row[row_starts]] = np.add.reduceat(cov_run, row_starts)
    return covered


def _finish(doc: np.ndarray, n_chars: np.ndarray,
            covered: np.ndarray) -> pa.Table:
    cov = np.where(n_chars > 0, covered / np.maximum(n_chars, 1), 0.0)
    return pa.table({"doc_id": pa.array(doc, pa.int64()),
                     "n_chars": pa.array(n_chars, pa.int64()),
                     "covered_chars": pa.array(covered, pa.int64()),
                     "dup_cov": pa.array(cov, pa.float64())})


_OUT_EMPTY = pa.table({"doc_id": pa.array([], pa.int64()),
                       "n_chars": pa.array([], pa.int64()),
                       "covered_chars": pa.array([], pa.int64()),
                       "dup_cov": pa.array([], pa.float64())})


class _BroadcastMark:
    """Probe every gram position against the broadcast dup census and
    fold each doc's interval union inside the batch (rows are whole
    docs, so no doc-keyed exchange is needed in this mode)."""

    def __init__(self, census_ref, gram: int) -> None:
        self._h1c, self._h2c = ray.get(census_ref)
        self._gram = gram
        self._pows = _PowCache()

    def __call__(self, b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _OUT_EMPTY
        data, off = _flat_ascii(b.column("text"))
        doc = b.column("doc_id").to_numpy(zero_copy_only=False)
        n_chars = np.diff(off)
        row, intra, gstart = _positions(off, self._gram)
        covered = np.zeros(b.num_rows, dtype=np.int64)
        if len(gstart):
            pows = self._pows.tables(int(off[-1] - off[0]) + 1)
            h1, h2 = _gram_hashes(data, off, gstart, self._gram, pows)
            dup = _probe_pairs(self._h1c, self._h2c, h1, h2)
            covered = _coverage_by_row(row[dup], intra[dup],
                                       b.num_rows, self._gram)
        return _finish(doc, n_chars, covered)


class _PositionExplode:
    """(h1, h2, doc_id, pos, n_chars) row per gram position — the
    exchange-mode position table (corpus-char-sized by construction)."""

    def __init__(self, gram: int) -> None:
        self._gram = gram
        self._pows = _PowCache()

    def __call__(self, b: pa.Table) -> pa.Table:
        empty = pa.table({"h1": pa.array([], pa.uint64()),
                          "h2": pa.array([], pa.uint64()),
                          "doc_id": pa.array([], pa.int64()),
                          "pos": pa.array([], pa.int64()),
                          "n_chars": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        data, off = _flat_ascii(b.column("text"))
        doc = b.column("doc_id").to_numpy(zero_copy_only=False)
        ln = np.diff(off)
        row, intra, gstart = _positions(off, self._gram)
        if len(gstart) == 0:
            return empty
        pows = self._pows.tables(int(off[-1] - off[0]) + 1)
        h1, h2 = _gram_hashes(data, off, gstart, self._gram, pows)
        return pa.table({"h1": pa.array(h1, pa.uint64()),
                         "h2": pa.array(h2, pa.uint64()),
                         "doc_id": pa.array(doc[row], pa.int64()),
                         "pos": pa.array(intra, pa.int64()),
                         "n_chars": pa.array(ln[row], pa.int64())})


def dup_ngram_coverage(sf_dir: str, gram_chars: int = GRAM_CHARS,
                       min_count: int = 2, mode: str = "auto",
                       census_broadcast_max: int = 2_000_000
                       ) -> "ray.data.Dataset":
    """Per-document duplicate-gram coverage over ``documents``:
    (doc_id, n_chars, covered_chars, dup_cov) for EVERY doc (0.0 when
    nothing is duplicated or the doc is shorter than ``gram_chars``).
    See the module docstring for the pinned contract and both modes'
    scale shapes."""
    census = _dup_gram_census(sf_dir, gram_chars, min_count)

    if mode in ("auto", "broadcast"):
        census = census.materialize()
        if mode == "auto":
            mode = "broadcast" \
                if census.count() <= census_broadcast_max else "exchange"

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])

    if mode == "broadcast":
        from nise_ray.util import collect_table
        ct = collect_table(census)
        if ct.num_rows:
            h1c = ct.column("h1").to_numpy(zero_copy_only=False)
            h2c = ct.column("h2").to_numpy(zero_copy_only=False)
            order = np.lexsort((h2c, h1c))
            ref = ray.put((h1c[order], h2c[order]))
        else:
            ref = ray.put((np.empty(0, np.uint64), np.empty(0, np.uint64)))
        return docs.map_batches(_BroadcastMark,
                                fn_constructor_args=(ref, gram_chars),
                                batch_format="pyarrow", zero_copy_batch=True,
                                concurrency=default_concurrency())

    if mode != "exchange":
        raise ValueError(f"unknown mode {mode!r}")

    positions = docs.map_batches(_PositionExplode,
                                 fn_constructor_args=(gram_chars,),
                                 batch_format="pyarrow",
                                 zero_copy_batch=True,
                                 concurrency=default_concurrency())

    def mark(b: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "pos": pa.array([], pa.int64()),
                          "n_chars": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        h1 = b.column("h1").to_numpy(zero_copy_only=False)
        h2 = b.column("h2").to_numpy(zero_copy_only=False)
        order, starts, counts = _pair_segments(h1, h2)
        seg_of = np.zeros(len(order), dtype=np.int64)
        seg_of[starts[1:]] = 1
        np.cumsum(seg_of, out=seg_of)
        dup = (counts >= min_count)[seg_of]
        sel = order[dup]
        if len(sel) == 0:
            return empty
        return pa.table({
            "doc_id": pa.array(
                b.column("doc_id").to_numpy(zero_copy_only=False)[sel],
                pa.int64()),
            "pos": pa.array(
                b.column("pos").to_numpy(zero_copy_only=False)[sel],
                pa.int64()),
            "n_chars": pa.array(
                b.column("n_chars").to_numpy(zero_copy_only=False)[sel],
                pa.int64())})

    dup_pos = hash_group_apply(positions, ["h1"], mark)

    def doc_cover(b: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_chars": pa.array([], pa.int64()),
                          "covered_chars": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        doc = b.column("doc_id").to_numpy(zero_copy_only=False)
        pos = b.column("pos").to_numpy(zero_copy_only=False)
        nch = b.column("n_chars").to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, doc))
        doc_s, pos_s = doc[order], pos[order]
        starts, _cnt = segments(doc_s)
        # row ids 0..nsegs-1 for the coverage kernel
        seg_of = np.zeros(len(order), dtype=np.int64)
        seg_of[starts[1:]] = 1
        np.cumsum(seg_of, out=seg_of)
        covered = _coverage_by_row(seg_of, pos_s, len(starts), gram_chars)
        return pa.table({"doc_id": pa.array(doc_s[starts], pa.int64()),
                         "n_chars": pa.array(nch[order][starts], pa.int64()),
                         "covered_chars": pa.array(covered, pa.int64())})

    cov = hash_group_apply(dup_pos, ["doc_id"], doc_cover)

    def base(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "doc_id": b.column("doc_id").cast(pa.int64()),
            "n_chars": pc.utf8_length(b.column("text")).cast(pa.int64()),
            "covered_chars": pa.array(
                np.zeros(b.num_rows, dtype=np.int64), pa.int64())})

    zeros = docs.map_batches(base, batch_format="pyarrow",
                             zero_copy_batch=True)

    def merge_doc(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _OUT_EMPTY
        doc = b.column("doc_id").to_numpy(zero_copy_only=False)
        nch = b.column("n_chars").to_numpy(zero_copy_only=False)
        cv = b.column("covered_chars").to_numpy(zero_copy_only=False)
        order = np.argsort(doc, kind="stable")
        doc_s = doc[order]
        starts, _cnt = segments(doc_s)
        n_chars = np.maximum.reduceat(nch[order], starts)
        covered = np.maximum.reduceat(cv[order], starts)
        return _finish(doc_s[starts], n_chars, covered)

    return hash_group_apply(zeros.union(cov), ["doc_id"], merge_doc)
