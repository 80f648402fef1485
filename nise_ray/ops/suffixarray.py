"""True SUFFIX-ARRAY substring-repeat stage — the literal reading of the
north rule's "suffix-array substring dedup" (R8), complementing the
winnowing stage in ops/substring.py.

Division of labor (SURVEY §8's original plan, now both halves exist):
  * this module: per-partition suffix array over the concatenated block
    text (prefix-doubling construction, every round one vectorized
    np.lexsort — no per-character Python), adjacent-suffix LCP tested
    against `min_len` with a capped vectorized comparison sweep, exact
    WITHIN-PARTITION repeated-substring pairs with offsets;
  * ops/substring.py (winnowing): the GLOBAL cross-partition guarantee
    (any shared run >= 100 normalized chars yields a shared fingerprint
    wherever the two docs live).

The SA path is exact for pairs co-located in one batch: it reports a
pair iff the two documents share a substring of >= min_len characters
(in the normalized text by default — same normalization contract as the
winnowing stage). Adjacent SA entries suffice for dedup connectivity: a
run of m suffixes sharing a >= min_len prefix links all m docs through
m-1 adjacent pairs.

Memory shape per block: the prefix-doubling loop holds O(n) int64 arrays
(~5 per round, reused), n = total characters + one unique separator per
doc; separators are codepoints > 0x10FFFF so no match can span a
document boundary. LCP work is capped at min_len comparison rounds over
a shrinking active set — exact lengths above min_len are not needed for
the >= test and are not computed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

_EMPTY_SA_PAIRS = pa.schema([
    ("u", pa.int64()), ("v", pa.int64()),
    ("u_start", pa.int64()), ("v_start", pa.int64()),
])


def suffix_array(codes: np.ndarray) -> np.ndarray:
    """Suffix array by prefix doubling (Manber-Myers): O(log n) rounds,
    each ONE np.lexsort over (rank, rank-shifted-by-k) — fully
    vectorized. Requires the ranks to become all-distinct, which the
    caller guarantees via unique per-doc separator sentinels."""
    n = len(codes)
    if n == 0:
        return np.empty(0, np.int64)
    _, rank = np.unique(codes, return_inverse=True)
    rank = rank.astype(np.int64)
    k = 1
    while True:
        r2 = np.full(n, -1, dtype=np.int64)
        if k < n:
            r2[:n - k] = rank[k:]
        order = np.lexsort((r2, rank))
        ro, r2o = rank[order], r2[order]
        new = np.ones(n, dtype=bool)
        new[1:] = (ro[1:] != ro[:-1]) | (r2o[1:] != r2o[:-1])
        nr = np.cumsum(new) - 1
        rank = np.empty(n, dtype=np.int64)
        rank[order] = nr
        if nr[-1] == n - 1:  # all ranks distinct -> done
            return order
        k *= 2


def _adjacent_lcp_ge(codes: np.ndarray, sa: np.ndarray,
                     min_len: int) -> np.ndarray:
    """LCP of each adjacent suffix pair, CAPPED at min_len (we only test
    >= min_len): at most min_len vectorized comparison rounds over the
    still-active pair set, which collapses fast on real text."""
    n = len(codes)
    a, b = sa[:-1].copy(), sa[1:].copy()
    lcp = np.zeros(len(a), dtype=np.int64)
    active = np.ones(len(a), dtype=bool)
    for _ in range(min_len):
        idx = np.flatnonzero(active)
        if len(idx) == 0:
            break
        ia, ib = a[idx], b[idx]
        ok = (ia < n) & (ib < n)
        ok[ok] = codes[ia[ok]] == codes[ib[ok]]
        lcp[idx[ok]] += 1
        active[idx[~ok]] = False
        a[idx[ok]] += 1
        b[idx[ok]] += 1
    return lcp


def sa_block_pairs(texts: "list[str]", doc_ids: np.ndarray,
                   min_len: int) -> pa.Table:
    """Exact repeated-substring doc pairs within one block: concatenate
    the texts with unique super-codepoint separators, build the SA, and
    emit (u, v, u_start, v_start) for adjacent suffixes from different
    docs whose LCP >= min_len (u < v by doc_id; starts are codepoint
    offsets of the shared run in each doc's text)."""
    if not texts:
        return _EMPTY_SA_PAIRS.empty_table()
    parts = []
    starts = np.zeros(len(texts) + 1, dtype=np.int64)
    for i, t in enumerate(texts):
        c = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
        parts.append(c.astype(np.int64))
        # unique separator per doc: no fake separator==separator matches
        parts.append(np.array([0x110000 + i], dtype=np.int64))
        starts[i + 1] = starts[i] + len(c) + 1
    codes = np.concatenate(parts)
    sa = suffix_array(codes)
    lcp = _adjacent_lcp_ge(codes, sa, min_len)
    ge = lcp >= min_len
    if not ge.any():
        return _EMPTY_SA_PAIRS.empty_table()
    # maximal runs of adjacent-LCP >= min_len: every suffix pair INSIDE a
    # run shares a >= min_len prefix (pairwise LCP = min of the adjacent
    # LCPs between them), so each run emits ALL its distinct-doc pairs —
    # adjacent pairs alone would under-report vs the gram-join oracle
    # (run A,A,C,B would miss (A,B)). The per-run loop is bounded by the
    # number of repeat regions, not by text size.
    edges = np.flatnonzero(np.diff(np.concatenate(
        [[False], ge, [False]]).astype(np.int8)))
    run_starts, run_ends = edges[0::2], edges[1::2]  # ge[s:e] all True
    us, vs, uss, vss = [], [], [], []
    for s, e in zip(run_starts, run_ends):
        posn = sa[s:e + 1]  # e - s + 1 suffixes in the run's interval
        docs = np.searchsorted(starts, posn, side="right") - 1
        uniq, first = np.unique(docs, return_index=True)
        if len(uniq) < 2:
            continue
        ids = doc_ids[uniq]
        offs = posn[first] - starts[uniq]
        order = np.argsort(ids)
        ids, offs = ids[order], offs[order]
        ii, jj = np.triu_indices(len(ids), k=1)
        us.append(ids[ii])
        vs.append(ids[jj])
        uss.append(offs[ii])
        vss.append(offs[jj])
    if not us:
        return _EMPTY_SA_PAIRS.empty_table()
    return pa.table({
        "u": pa.array(np.concatenate(us), pa.int64()),
        "v": pa.array(np.concatenate(vs), pa.int64()),
        "u_start": pa.array(np.concatenate(uss), pa.int64()),
        "v_start": pa.array(np.concatenate(vss), pa.int64()),
    })


def substring_pairs_sa(sf_dir: str, min_len: int = 100,
                       batch_size: int = 8192,
                       normalize: bool = True) -> pa.Table:
    """Suffix-array substring-repeat pairs over the documents table:
    distinct (u, v) doc pairs sharing a run of >= min_len characters,
    with one witness offset pair, sorted by (u, v). Exact within each
    SA block (batch); cross-block repeats are the winnowing stage's job
    (ops/substring.py — global fingerprint exchange). `normalize=True`
    applies the same NFC + blank-run-collapse contract as the winnowing
    stage so the two stages report spans in the same coordinate space.

    For a GLOBALLY exact result (the oracled query wrapper), pass a
    batch_size >= the corpus row count — substring_pairs_sa_exact gates
    on that so the SQL-equivalence contract (pairs sharing a run of
    >= min_len chars == pairs sharing an exact min_len-gram) either
    holds or fails loudly."""
    from nise_ray.ops.groupapply import hash_group_apply
    from nise_ray.ops.normalize import normalize_text
    from nise_ray.util import collect_table

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def block(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        if normalize:
            texts = [normalize_text(t) for t in texts]
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return sa_block_pairs(texts, ids, min_len)

    # task path (no per-worker state to amortize): Ray autoscales tasks;
    # batch_size bounds each SA block
    pairs = ds.map_batches(block, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=batch_size)

    def distinct_uv(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, u))
        first = np.ones(len(order), dtype=bool)
        first[1:] = (u[order][1:] != u[order][:-1]) | \
                    (v[order][1:] != v[order][:-1])
        return batch.take(pa.array(order[first]))

    out = collect_table(hash_group_apply(pairs, ["u", "v"], distinct_uv,
                                         sort=False))
    if out.num_rows == 0:
        return _EMPTY_SA_PAIRS.empty_table()
    return out.sort_by([("u", "ascending"), ("v", "ascending")])


def substring_pairs_sa_exact(sf_dir: str, min_len: int = 100,
                             max_docs: int = 1 << 20) -> pa.Table:
    """GLOBALLY exact SA substring pairs — the SQL-oracled baseline for
    the suffix-array stage (a pair shares a >= min_len-char run iff it
    shares some exact min_len-gram, which the DuckDB oracle checks with
    a gram equi-join). One SA block must see the whole corpus, so this
    refuses beyond `max_docs` and points at the per-block SA +
    winnowing combination (the scale path, same relationship as
    embedding_dup_pairs_exact -> SRP-LSH). Raw text (normalize=False):
    the oracle's substr grams are over the stored text."""
    n_docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]).count()
    if n_docs > max_docs:
        raise ValueError(
            f"substring_pairs_sa_exact: {n_docs} docs > max_docs="
            f"{max_docs}; one SA block cannot see the whole corpus — "
            "use substring_pairs_sa per block + the winnowing stage "
            "for cross-block repeats")
    out = substring_pairs_sa(sf_dir, min_len=min_len,
                             batch_size=max(int(n_docs), 1),
                             normalize=False)
    return out.select(["u", "v"])
