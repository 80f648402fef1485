"""Stage E'' — substring-level duplication via winnowing fingerprints.

Instead of a monolithic suffix array (which only sees within-partition
repeats), we use winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the MOSS
algorithm): a rolling polynomial hash over every k-char gram of the
normalized text, then the minimum hash in every w-wide window is selected
as a fingerprint. GUARANTEE: any shared substring of length >= k + w - 1
(= cfg.substring_min_len with the pinned k=64, w=37) produces at least one
shared fingerprint, globally — across partitions, which a per-partition
suffix array cannot promise. Docs sharing a fingerprint are joined by a
``groupby(fingerprint)`` shuffle exactly like the LSH band stage.

SPANS: each fingerprint carries its gram's byte offset in the NORMALIZED
text, so every emitted pair reports actionable span bounds
(u_start/u_end/v_start/v_end) — the bounding range of all shared-
fingerprint anchors per side, each anchor covering k bytes. A user
stripping duplicated license headers cuts [start, end) of the normalized
text. The bounds are a bounding box: two disjoint shared blocks merge
into one span (n_shared_fps tells density).

Substring edges are reported as their own output (license headers / copied
functions do NOT imply whole-file near-duplication) and are only merged
into clustering when explicitly configured.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from nise_ray.config import DedupConfig
from nise_ray.hashing import U64, rolling_poly_hash, sliding_min
from nise_ray.ops.lsh import edges_table, empty_edges
from nise_ray.ops.normalize import normalize_text

# The winnowing exchange is the corpus-dominating byte mover (measured
# 30.5M rows at the sf0.1 bench tier), so its rows are 20 bytes, not 28:
# doc identity on the exchange is the CONTENT hash (sha64) — identical
# files winnow once per block and pair as one member — and the
# sha -> min-doc_key translation needed for the output contract rides
# the SAME exchange as one 20-byte "map row" per distinct sha per block
# (fp = the doc's sha64 so map rows hash-distribute like any other key;
# pos = -1 marks them). Translation then touches only the OUTPUT-sized
# pair set (pipeline.substring_pairs).
FP_SCHEMA = pa.schema([
    ("fp", pa.uint64()),
    ("id", pa.uint64()),  # real row: sha64 of the doc; map row: doc_key
    ("pos", pa.int32()),  # byte offset in normalized text; -1 = map row
])

SPAN_SCHEMA = pa.schema([
    ("u", pa.uint64()), ("v", pa.uint64()),
    ("n_shared_fps", pa.int64()),
    ("u_start", pa.int64()), ("u_end", pa.int64()),
    ("v_start", pa.int64()), ("v_end", pa.int64()),
])

# per-block PARTIAL span aggregate — the pair gen pre-aggregates each
# block's (u, v) anchors into one row (count + position bounds), so the
# (u, v) exchange / driver collect moves distinct-pair-sized partials
# instead of one row per shared fingerprint (measured 5.1M raw anchor
# rows vs 108k distinct pairs at the sf0.1 bench tier)
PAIR_PARTIAL_SCHEMA = pa.schema([
    ("u", pa.uint64()), ("v", pa.uint64()), ("n_fps", pa.int64()),
    ("u_min", pa.int64()), ("u_max", pa.int64()),
    ("v_min", pa.int64()), ("v_max", pa.int64()),
])


def winnow_fingerprints(text: str, k: int, w: int) -> np.ndarray:
    """Unique winnowing fingerprints of one normalized document."""
    return winnow_fingerprints_pos(text, k, w)[0]


def winnow_fingerprints_pos(text: str, k: int, w: int) -> tuple[np.ndarray, np.ndarray]:
    """(unique fingerprints, first byte offset of each fingerprint's gram
    in the normalized utf-8 text). Offsets anchor the span reporting."""
    data = np.frombuffer(text.encode("utf-8", errors="surrogatepass"), dtype=np.uint8)
    n = len(data)
    if n < k:
        return np.empty(0, dtype=U64), np.empty(0, dtype=np.int64)
    h = rolling_poly_hash(data, k)  # one hash per gram position
    mins = sliding_min(h, w)  # O(n) two-pass block min, not O(n*w)
    uniq = np.unique(mins)
    # first occurrence position of each selected fingerprint in h —
    # WITHOUT a stable argsort of the full gram-hash array (that sort was
    # the explode stage's dominant CPU): membership-probe h against the
    # (much smaller) selected set, then a reverse-order scatter so the
    # earliest position wins each slot. Output is identical to the old
    # argsort+searchsorted form.
    idx = np.searchsorted(uniq, h)
    idx[idx == len(uniq)] = 0       # out-of-range probes can never match
    hit_pos = np.flatnonzero(uniq[idx] == h)
    hit_val = idx[hit_pos]
    pos = np.empty(len(uniq), dtype=np.int64)
    pos[hit_val[::-1]] = hit_pos[::-1]   # duplicate slots: first index wins
    return uniq, pos


def explode_fingerprints(batch: pa.Table, cfg: DedupConfig) -> pa.Table:
    """corpus rows -> winnowing-exchange rows (see FP_SCHEMA): real
    fingerprint rows (fp, sha64, pos) for each DISTINCT content hash in
    the block — exact in-block duplicates winnow once — plus one map row
    (sha64 -> block-min doc_key, pos = -1) per distinct sha so the final
    pair translation never re-reads content."""
    from nise_ray.ops.normalize import batch_normalize
    repo = batch.column("repo").to_pylist()
    path = batch.column("path").to_pylist()
    commit = batch.column("commit").to_pylist()
    contents = batch.column("content").to_pylist()
    n = batch.num_rows
    if n == 0:
        return FP_SCHEMA.empty_table()
    # normalization runs as a column kernel (parity-tested against the
    # per-row normalize_text), not once per row
    normed = batch_normalize(batch.column("content")).to_pylist()
    shas = np.fromiter(
        (int.from_bytes(hashlib.sha256(
            t.encode("utf-8", errors="surrogatepass")).digest()[:8],
            "little") for t in contents), dtype=U64, count=n)
    dks = np.fromiter(
        (int.from_bytes(hashlib.blake2b(
            repo[i].encode() + b"\x00" + path[i].encode() + b"\x00"
            + commit[i].encode(), digest_size=8).digest(), "little")
         for i in range(n)), dtype=U64, count=n)
    # one representative per distinct sha, carrying the block-min doc_key
    order = np.lexsort((dks, shas))
    first = np.ones(n, dtype=bool)
    first[1:] = shas[order][1:] != shas[order][:-1]
    reps = order[first]
    fps: list[np.ndarray] = []
    poss: list[np.ndarray] = []
    rep_shas: list[int] = []
    rep_dks: list[int] = []
    for i in reps:
        f, p = winnow_fingerprints_pos(normed[i], cfg.winnow_k,
                                       cfg.winnow_window)
        if len(f) == 0:
            continue
        rep_shas.append(int(shas[i]))
        rep_dks.append(int(dks[i]))
        fps.append(f)
        poss.append(p)
    if not fps:
        return FP_SCHEMA.empty_table()
    counts = [len(f) for f in fps]
    sha_arr = np.array(rep_shas, dtype=U64)
    return pa.table({
        "fp": pa.array(np.concatenate([np.concatenate(fps), sha_arr]),
                       pa.uint64()),
        "id": pa.array(np.concatenate([np.repeat(sha_arr, counts),
                                       np.array(rep_dks, dtype=U64)]),
                       pa.uint64()),
        "pos": pa.array(np.concatenate(
            [np.concatenate(poss),
             np.full(len(sha_arr), -1, np.int64)]).astype(np.int32),
            pa.int32()),
    })


def _all_bucket_pairs(keys: np.ndarray, ids: np.ndarray,
                      pos: np.ndarray, cap: int):
    """(u, v, u_pos, v_pos) for ALL fingerprint buckets in a partition at
    once — one lexsort plus index arithmetic, zero per-bucket Python
    (round-4 rewrite of the per-bucket argsort loop, which was the
    partition kernel's dominant CPU at the bench tier). Semantics per
    bucket are unchanged: members are the DISTINCT content hashes
    (cross-block copies of identical files collapse here), full pairwise
    with u < v below `cap`, star-to-min-sha for hot fingerprints
    (ubiquitous boilerplate). One deliberate tightening: when a doc
    repeats the same fingerprint value at several positions, the MIN
    position is kept (the loop version kept an unstable argsort pick) —
    span bounds are anchor-granular either way, and determinism no
    longer depends on exchange row order."""
    from nise_ray.ops.groupapply import segments
    from nise_ray.ops.simjoin import _ranges

    if len(keys) > 1 and bool((keys[1:] >= keys[:-1]).all()):
        # the fp exchange delivers keys pre-sorted: singleton buckets
        # (the vast majority) can never pair, so gather only multi-member
        # bucket rows BEFORE the lexsort — at the bench tier this cuts
        # sort traffic ~4x, which matters because 32 concurrent sorts
        # are memory-bandwidth-bound, not compute-bound
        s_all, c_all = segments(keys)
        multi_rows = _ranges(s_all[c_all >= 2], c_all[c_all >= 2])
        keys, ids, pos = keys[multi_rows], ids[multi_rows], pos[multi_rows]
        if len(keys) == 0:
            return None
    order = np.lexsort((pos, ids, keys))
    k_s, id_s, pos_s = keys[order], ids[order], pos[order]
    new = np.ones(len(k_s), dtype=bool)
    new[1:] = (k_s[1:] != k_s[:-1]) | (id_s[1:] != id_s[:-1])
    k_d, id_d, pos_d = k_s[new], id_s[new], pos_s[new]
    starts, counts = segments(k_d)
    small = (counts >= 2) & (counts <= cap)
    hot = counts > cap
    u_parts, v_parts = [], []
    if small.any():
        s0, c0 = starts[small], counts[small]
        # level 1: one row per (segment, i) for i = 0..c-2 — the 'u' slot
        u_idx = _ranges(s0, c0 - 1)
        i_off = u_idx - np.repeat(s0, c0 - 1)
        # level 2: each u-slot pairs with the (c-1-i) members after it
        vcnt = np.repeat(c0, c0 - 1) - 1 - i_off
        u_parts.append(np.repeat(u_idx, vcnt))
        v_parts.append(_ranges(u_idx + 1, vcnt))
    if hot.any():
        s0, c0 = starts[hot], counts[hot]
        u_parts.append(np.repeat(s0, c0 - 1))
        v_parts.append(_ranges(s0 + 1, c0 - 1))
    if not u_parts:
        return None
    ui = np.concatenate(u_parts)
    vi = np.concatenate(v_parts)
    # ids ascend within a segment (lexsort key order), so u < v holds
    return id_d[ui], id_d[vi], pos_d[ui], pos_d[vi]


def _span_partials(u: np.ndarray, v: np.ndarray, u_pos: np.ndarray,
                   v_pos: np.ndarray) -> pa.Table:
    """Collapse raw (u, v, anchor, anchor) rows into one partial row per
    distinct (u, v): fp count + position bounds. One lexsort + reduceat.
    Distinct fps never repeat across blocks (fp is the partition key), so
    partial counts add exactly downstream."""
    order = np.lexsort((v, u))
    su, sv = u[order], v[order]
    n = len(order)
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = (su[1:] != su[:-1]) | (sv[1:] != sv[:-1])
    starts = np.flatnonzero(change)
    counts = np.diff(np.append(starts, n))
    up = u_pos[order].astype(np.int64)
    vp = v_pos[order].astype(np.int64)
    return pa.table({
        "u": pa.array(su[starts], pa.uint64()),
        "v": pa.array(sv[starts], pa.uint64()),
        "n_fps": pa.array(counts, pa.int64()),
        "u_min": pa.array(np.minimum.reduceat(up, starts), pa.int64()),
        "u_max": pa.array(np.maximum.reduceat(up, starts), pa.int64()),
        "v_min": pa.array(np.minimum.reduceat(vp, starts), pa.int64()),
        "v_max": pa.array(np.maximum.reduceat(vp, starts), pa.int64()),
    })


def make_batch_substring_pair_gen(cfg: DedupConfig):
    """Block-level fn for hash_group_apply keyed on fp: generates
    candidate pairs (u, v = content hashes) with anchor positions, then
    PRE-AGGREGATES them into per-(u, v) span partials before anything
    leaves the block. Map rows (pos = -1) reduce to ONE
    (sha -> min doc_key) row per sha, re-encoded in the partial schema
    as (u = sha, v = doc_key, n_fps = -1) for the translation passes."""
    from nise_ray.ops.groupapply import segments
    cap = cfg.bucket_cap

    def batch_fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return PAIR_PARTIAL_SCHEMA.empty_table()
        pos_all = batch.column("pos").to_numpy(zero_copy_only=False)
        fp_all = batch.column("fp").to_numpy(
            zero_copy_only=False).astype(U64)
        id_all = batch.column("id").to_numpy(
            zero_copy_only=False).astype(U64)
        parts: list[pa.Table] = []
        is_map = pos_all < 0
        if is_map.any():
            mf, mid = fp_all[is_map], id_all[is_map]
            order = np.lexsort((mid, mf))
            starts, _ = segments(mf[order])
            nm = len(starts)
            zeros = pa.array(np.zeros(nm, np.int64), pa.int64())
            parts.append(pa.table({
                "u": pa.array(mf[order][starts], pa.uint64()),
                "v": pa.array(mid[order][starts], pa.uint64()),
                "n_fps": pa.array(np.full(nm, -1, np.int64), pa.int64()),
                "u_min": zeros, "u_max": zeros,
                "v_min": zeros, "v_max": zeros,
            }))
        real = ~is_map
        keys, ids, pos = fp_all[real], id_all[real], pos_all[real]
        pair = _all_bucket_pairs(keys, ids, pos, cap)
        if pair is not None:
            parts.append(_span_partials(*pair))
        if not parts:
            return PAIR_PARTIAL_SCHEMA.empty_table()
        return pa.concat_tables(parts)

    return batch_fn


def _split_map_rows(t: pa.Table):
    """(real-partial table, sorted sha array, doc_key array) from a mixed
    partial stream — map rows are n_fps < 0 with (u = sha, v = doc_key)."""
    n_fps = t.column("n_fps").to_numpy(zero_copy_only=False)
    is_map = n_fps < 0
    if not is_map.any():
        return t, np.empty(0, dtype=U64), np.empty(0, dtype=U64)
    mu = t.column("u").to_numpy(zero_copy_only=False).astype(U64)[is_map]
    mv = t.column("v").to_numpy(zero_copy_only=False).astype(U64)[is_map]
    order = np.lexsort((mv, mu))
    first = np.ones(len(order), dtype=bool)
    first[1:] = mu[order][1:] != mu[order][:-1]
    keep = order[first]  # min doc_key per sha (defensive; one row/sha)
    real = t.filter(pa.array(~is_map))
    return real, mu[keep], mv[keep]


def _translate(keys: np.ndarray, map_sha: np.ndarray, map_dk: np.ndarray,
               what: str) -> np.ndarray:
    if len(map_sha) == 0:
        if len(keys):
            raise AssertionError(f"substring translate: no map rows for "
                                 f"{what}")
        return keys
    pos = np.clip(np.searchsorted(map_sha, keys), 0, len(map_sha) - 1)
    if not (map_sha[pos] == keys).all():
        raise AssertionError(f"substring translate: sha missing from "
                             f"{what} map")
    return map_dk[pos]


def _merge_real_partials(t: pa.Table) -> dict[str, np.ndarray]:
    """Sum counts / min-max bounds per distinct (u, v). Returns plain
    arrays so callers can translate / swap before boxing."""
    u = t.column("u").to_numpy(zero_copy_only=False).astype(U64)
    v = t.column("v").to_numpy(zero_copy_only=False).astype(U64)
    order = np.lexsort((v, u))
    su, sv = u[order], v[order]
    n = len(order)
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = (su[1:] != su[:-1]) | (sv[1:] != sv[:-1])
    starts = np.flatnonzero(change)
    cols = {name: t.column(name).to_numpy(zero_copy_only=False)[order]
            for name in ("n_fps", "u_min", "u_max", "v_min", "v_max")}
    return {
        "u": su[starts], "v": sv[starts],
        "n_fps": np.add.reduceat(cols["n_fps"], starts),
        "u_min": np.minimum.reduceat(cols["u_min"], starts),
        "u_max": np.maximum.reduceat(cols["u_max"], starts),
        "v_min": np.minimum.reduceat(cols["v_min"], starts),
        "v_max": np.maximum.reduceat(cols["v_max"], starts),
    }


def _finalize_spans(m: dict[str, np.ndarray], k: int) -> pa.Table:
    """Canonicalize u < v by doc_key (swapping span bounds with their
    side) and box into SPAN_SCHEMA; each anchor covers k bytes."""
    if len(m["u"]) == 0:
        return SPAN_SCHEMA.empty_table()
    swap = m["u"] > m["v"]
    u = np.where(swap, m["v"], m["u"])
    v = np.where(swap, m["u"], m["v"])
    u_min = np.where(swap, m["v_min"], m["u_min"])
    u_max = np.where(swap, m["v_max"], m["u_max"])
    v_min = np.where(swap, m["u_min"], m["v_min"])
    v_max = np.where(swap, m["u_max"], m["v_max"])
    order = np.lexsort((v, u))
    return pa.table({
        "u": pa.array(u[order], pa.uint64()),
        "v": pa.array(v[order], pa.uint64()),
        "n_shared_fps": pa.array(m["n_fps"][order], pa.int64()),
        "u_start": pa.array(u_min[order], pa.int64()),
        "u_end": pa.array((u_max[order] + k).astype(np.int64), pa.int64()),
        "v_start": pa.array(v_min[order], pa.int64()),
        "v_end": pa.array((v_max[order] + k).astype(np.int64), pa.int64()),
    })


def merge_span_partials(t: pa.Table, k: int) -> pa.Table:
    """Driver-path merge of the mixed partial stream: split out the
    sha -> doc_key map rows, merge real partials per (u, v), translate
    both sides, canonicalize and box. One pass, output-sized."""
    if t.num_rows == 0:
        return SPAN_SCHEMA.empty_table()
    real, map_sha, map_dk = _split_map_rows(t)
    if real.num_rows == 0:
        return SPAN_SCHEMA.empty_table()
    m = _merge_real_partials(real)
    m["u"] = _translate(m["u"], map_sha, map_dk, "driver")
    m["v"] = _translate(m["v"], map_sha, map_dk, "driver")
    return _finalize_spans(m, k)


def make_u_translate_batch(cfg: DedupConfig):
    """Distributed pass 1, keyed on u (= sha): each partition holds
    complete u groups, so (u, v) merges complete here; u translates to
    its doc_key; map rows forward unchanged (their v = sha keys them
    into pass 2 alongside the pairs that still need that sha)."""

    def batch_fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return PAIR_PARTIAL_SCHEMA.empty_table()
        real, map_sha, map_dk = _split_map_rows(batch)
        parts: list[pa.Table] = []
        if len(map_sha):
            nm = len(map_sha)
            zeros = pa.array(np.zeros(nm, np.int64), pa.int64())
            parts.append(pa.table({
                "u": pa.array(map_dk, pa.uint64()),
                "v": pa.array(map_sha, pa.uint64()),
                "n_fps": pa.array(np.full(nm, -1, np.int64), pa.int64()),
                "u_min": zeros, "u_max": zeros,
                "v_min": zeros, "v_max": zeros,
            }))
        if real.num_rows:
            m = _merge_real_partials(real)
            m["u"] = _translate(m["u"], map_sha, map_dk, "pass-1 (u)")
            parts.append(pa.table({
                "u": pa.array(m["u"], pa.uint64()),
                "v": pa.array(m["v"], pa.uint64()),
                "n_fps": pa.array(m["n_fps"], pa.int64()),
                "u_min": pa.array(m["u_min"], pa.int64()),
                "u_max": pa.array(m["u_max"], pa.int64()),
                "v_min": pa.array(m["v_min"], pa.int64()),
                "v_max": pa.array(m["v_max"], pa.int64()),
            }))
        if not parts:
            return PAIR_PARTIAL_SCHEMA.empty_table()
        return pa.concat_tables(parts)

    return batch_fn


def make_v_finalize_batch(cfg: DedupConfig):
    """Distributed pass 2, keyed on v (= sha): translate v via the
    co-located map rows (now encoded u = doc_key, v = sha), canonicalize
    and box into SPAN_SCHEMA."""
    k = cfg.winnow_k

    def batch_fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return SPAN_SCHEMA.empty_table()
        n_fps = batch.column("n_fps").to_numpy(zero_copy_only=False)
        is_map = n_fps < 0
        real = batch.filter(pa.array(~is_map))
        if real.num_rows == 0:
            return SPAN_SCHEMA.empty_table()
        mu = batch.column("u").to_numpy(
            zero_copy_only=False).astype(U64)[is_map]
        mv = batch.column("v").to_numpy(
            zero_copy_only=False).astype(U64)[is_map]
        order = np.lexsort((mu, mv))  # min doc_key first per sha
        map_sha, map_dk = mv[order], mu[order]
        m = {name: real.column(col).to_numpy(zero_copy_only=False)
             for name, col in (("u", "u"), ("v", "v"), ("n_fps", "n_fps"),
                               ("u_min", "u_min"), ("u_max", "u_max"),
                               ("v_min", "v_min"), ("v_max", "v_max"))}
        m["u"] = m["u"].astype(U64)
        m["v"] = _translate(m["v"].astype(U64), map_sha, map_dk,
                            "pass-2 (v)")
        return _finalize_spans(m, k)

    return batch_fn


def containment_pairs_documents(sf_dir: str,
                                cfg: DedupConfig | None = None) -> pa.Table:
    """SQL-subset oracle surface for the winnowing stage: the substring
    pair set restricted to NORMALIZED-TEXT CONTAINMENT cases, as
    (doc_id_u, doc_id_v) with u < v. DuckDB-expressible as
    ``position(a.nt IN b.nt) > 0`` over normalized texts with the
    contained side >= substring_min_len — the winnowing guarantee says
    every such pair shares at least one fingerprint, so the candidate
    stage finds them all (bucket star-caps aside, which need >cap docs on
    one fingerprint).

    Scale shape: candidates come from the distributed winnowing exchange;
    only pair ENDPOINTS' texts are gathered to the driver (two broadcast-
    needed-keys filter passes), so driver memory scales with the pair
    set, not the corpus. The SQL equivalence assumes ASCII text (NFC is
    identity); non-ASCII corpora get the rows-only check.
    """
    import hashlib as _hashlib

    import ray

    from nise_ray.util import collect_table
    cfg = cfg or DedupConfig()
    from nise_ray.io import corpus_from_documents
    from nise_ray.pipeline import substring_pairs as _sp
    corpus = corpus_from_documents(sf_dir)
    pairs = collect_table(_sp(corpus, cfg).select_columns(["u", "v"]))
    empty = pa.table({"doc_id_u": pa.array([], pa.int64()),
                      "doc_id_v": pa.array([], pa.int64())})
    if pairs.num_rows == 0:
        return empty
    pu = pairs.column("u").to_numpy(zero_copy_only=False).astype(U64)
    pv = pairs.column("v").to_numpy(zero_copy_only=False).astype(U64)
    needed = np.unique(np.concatenate([pu, pv]))
    needed_ref = ray.put(needed)

    def doc_key_of(repo: str, path: str, commit: str) -> int:
        blob = repo.encode() + b"\x00" + path.encode() + b"\x00" + commit.encode()
        return int.from_bytes(
            _hashlib.blake2b(blob, digest_size=8).digest(), "little")

    class GatherEndpoints:
        def __init__(self) -> None:
            self.needed = ray.get(needed_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            repo = b.column("repo").to_pylist()
            path = b.column("path").to_pylist()
            commit = b.column("commit").to_pylist()
            dks = np.fromiter(
                (doc_key_of(r, p, c) for r, p, c in zip(repo, path, commit)),
                dtype=U64, count=b.num_rows)
            pos = np.clip(np.searchsorted(self.needed, dks), 0,
                          len(self.needed) - 1)
            mask = self.needed[pos] == dks
            if not mask.any():
                return pa.table({"doc_key": pa.array([], pa.uint64()),
                                 "doc_id": pa.array([], pa.int64()),
                                 "sha64": pa.array([], pa.uint64()),
                                 "text": pa.array([], pa.string())})
            sel = b.filter(pa.array(mask))
            sha = np.fromiter(
                (int.from_bytes(_hashlib.sha256(
                    t.encode("utf-8", errors="surrogatepass")).digest()[:8],
                    "little")
                 for t in sel.column("content").to_pylist()),
                dtype=U64, count=sel.num_rows)
            return pa.table({
                "doc_key": pa.array(dks[mask], pa.uint64()),
                "doc_id": sel.column("doc_id").cast(pa.int64()),
                "sha64": pa.array(sha, pa.uint64()),
                "text": sel.column("content"),
            })

    from nise_ray.ops.groupapply import default_concurrency
    eps = collect_table(corpus.map_batches(
        GatherEndpoints, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=default_concurrency()))
    dk_arr = eps.column("doc_key").to_numpy(zero_copy_only=False).astype(U64)
    did_arr = eps.column("doc_id").to_numpy(zero_copy_only=False)
    sha_arr = eps.column("sha64").to_numpy(zero_copy_only=False).astype(U64)
    nts = [normalize_text(t) for t in eps.column("text").to_pylist()]

    # second pass: canonical doc_id = min doc_id over each endpoint's
    # raw-text group (matters only when exact-duplicate texts exist — the
    # oracle's GROUP BY text picks min(doc_id), the engine's sha-dedup
    # picks min doc_KEY, and those can differ)
    shas_ref = ray.put(np.unique(sha_arr))

    class GroupMin:
        def __init__(self) -> None:
            self.shas = ray.get(shas_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            sha = np.fromiter(
                (int.from_bytes(_hashlib.sha256(
                    t.encode("utf-8", errors="surrogatepass")).digest()[:8],
                    "little")
                 for t in b.column("content").to_pylist()),
                dtype=U64, count=b.num_rows)
            pos = np.clip(np.searchsorted(self.shas, sha), 0,
                          len(self.shas) - 1)
            mask = self.shas[pos] == sha
            return pa.table({
                "sha64": pa.array(sha[mask], pa.uint64()),
                "doc_id": b.filter(pa.array(mask)).column("doc_id").cast(pa.int64()),
            })

    gm = collect_table(corpus.map_batches(
        GroupMin, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=default_concurrency()))
    gm_sha = gm.column("sha64").to_numpy(zero_copy_only=False).astype(U64)
    gm_did = gm.column("doc_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((gm_did, gm_sha))
    first = np.ones(len(order), dtype=bool)
    first[1:] = gm_sha[order][1:] != gm_sha[order][:-1]
    min_sha = gm_sha[order][first]
    min_did = gm_did[order][first]

    by_key = {int(k): i for i, k in enumerate(dk_arr)}
    min_len = cfg.substring_min_len
    out: set[tuple[int, int]] = set()
    for a, b_ in zip(pu, pv):
        ia, ib = by_key.get(int(a)), by_key.get(int(b_))
        if ia is None or ib is None:
            raise AssertionError("pair endpoint missing from gathered docs")
        na, nb = nts[ia], nts[ib]
        if na == nb:
            continue
        if not ((len(na) >= min_len and na in nb)
                or (len(nb) >= min_len and nb in na)):
            continue
        ca = int(min_did[np.searchsorted(min_sha, sha_arr[ia])])
        cb = int(min_did[np.searchsorted(min_sha, sha_arr[ib])])
        out.add((min(ca, cb), max(ca, cb)))
    if not out:
        return empty
    rows = sorted(out)
    return pa.table({
        "doc_id_u": pa.array([r[0] for r in rows], pa.int64()),
        "doc_id_v": pa.array([r[1] for r in rows], pa.int64()),
    })


def make_substring_pair_gen(cfg: DedupConfig):
    """Legacy per-group variant (tests only — the pipeline uses the
    block-level generator above). Emits plain edges without spans."""
    cap = cfg.bucket_cap

    def pair_gen(group: pa.Table) -> pa.Table:
        doc_keys = group.column("doc_key").to_numpy(zero_copy_only=False).astype(U64)
        sha64 = group.column("sha64").to_numpy(zero_copy_only=False).astype(U64)
        order = np.lexsort((doc_keys, sha64))
        first = np.ones(len(order), dtype=bool)
        first[1:] = sha64[order][1:] != sha64[order][:-1]
        doc_keys = np.sort(doc_keys[order[first]])
        m = len(doc_keys)
        if m < 2:
            return empty_edges()
        if m <= cap:
            ii, jj = np.triu_indices(m, k=1)
            u, v = doc_keys[ii], doc_keys[jj]
        else:
            # hot fingerprint (ubiquitous boilerplate): star to bucket min
            u = np.full(m - 1, doc_keys[0], dtype=U64)
            v = doc_keys[1:]
        return edges_table(u, v, np.ones(len(u), dtype=np.float32), "substring")

    return pair_gen
