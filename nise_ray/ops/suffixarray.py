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
    from nise_ray.ops.simjoin import distinct_uv_batch
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

    out = collect_table(hash_group_apply(pairs, ["u", "v"], distinct_uv_batch,
                                         sort=False))
    if out.num_rows == 0:
        return _EMPTY_SA_PAIRS.empty_table()
    return out.sort_by([("u", "ascending"), ("v", "ascending")])


def substring_pairs_sa_global(sf_dir: str, min_len: int = 100,
                              normalize: bool = False) -> pa.Table:
    """SA-exact repeated-substring pairs that survive ARBITRARY
    partitioning — the co-location pass the per-block SA stage
    documents as its missing half. Three stages:

      1. candidate generation by WINNOWING fingerprints (k = min_len//2,
         w = min_len - k + 1, so k + w - 1 = min_len): the robust
         winnowing guarantee says any shared run of >= min_len bytes
         shares at least one selected fingerprint REGARDLESS of where
         the two docs live — this is the cross-block routing key. One
         (fp, doc_id) exchange, per-bucket pairs, (u, v) distinct.
      2. both texts attach to each candidate pair via two hash joins
         (pair-bounded, no resident map — same shape as the simjoin
         verify fallback).
      3. per-pair SA VERIFY: a two-doc suffix array + capped-LCP test
         decides >= min_len exactly, so winnowing's false positives
         (a shared k-gram without a shared min_len run) are removed
         and the output equals the single-block SA on the whole corpus.

    Output (u, v) doc_id pairs, sorted. Parity with
    substring_pairs_sa_exact is pinned by a planted cross-block-clone
    test. Candidate count is bounded by fp-bucket co-occurrence
    (boilerplate-skew handling beyond that is the production winnowing
    stage's job — ops/substring.py bucket caps)."""
    from nise_ray.ops.groupapply import hash_group_apply
    from nise_ray.ops.normalize import batch_normalize
    from nise_ray.ops.simjoin import (all_bucket_size_filtered_pairs,
                                      distinct_uv_batch)
    from nise_ray.ops.substring import winnow_fingerprints
    from nise_ray.util import collect_table

    # largest power-of-two gram size <= min_len/2 (rolling_poly_hash
    # needs 2^i for the O(1) window roll); k + w - 1 == min_len keeps
    # the winnowing guarantee exactly at the SA threshold
    k = 1 << max((min_len // 2).bit_length() - 1, 0)
    w = min_len - k + 1
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])

    def fps(b: pa.Table) -> pa.Table:
        col = batch_normalize(b.column("text")) if normalize \
            else b.column("text")
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        out_f, out_i = [], []
        for i, t in enumerate(col.to_pylist()):
            f = winnow_fingerprints(t, k, w)
            if len(f):
                out_f.append(f)
                out_i.append(np.full(len(f), ids[i], np.int64))
        if not out_f:
            return pa.table({"fp": pa.array([], pa.uint64()),
                             "doc_id": pa.array([], pa.int64())})
        return pa.table({"fp": pa.array(np.concatenate(out_f), pa.uint64()),
                         "doc_id": pa.array(np.concatenate(out_i),
                                            pa.int64())})

    fp_ds = docs.map_batches(fps, batch_format="pyarrow",
                             zero_copy_batch=True)

    def pair_gen(batch: pa.Table) -> pa.Table:
        empty = pa.table({"u": pa.array([], pa.int64()),
                          "v": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        keys = batch.column("fp").to_numpy(zero_copy_only=False)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        out = all_bucket_size_filtered_pairs(
            keys.astype(np.uint64), ids,
            np.ones(len(ids), np.int64), 0.0)
        if out is None:
            return empty
        return pa.table({"u": pa.array(out[0], pa.int64()),
                         "v": pa.array(out[1], pa.int64())})

    cands = hash_group_apply(fp_ds, ["fp"], pair_gen, sort=False)

    pairs_ds = hash_group_apply(cands, ["u", "v"], distinct_uv_batch,
                                sort=False).materialize()
    if pairs_ds.count() == 0:
        return pa.table({"u": pa.array([], pa.int64()),
                         "v": pa.array([], pa.int64())})

    # attach both texts per pair: two hash joins, pair-bounded; sparse
    # join inputs wrapped in join_input (see groupapply — Ray's join
    # loses its schema broadcast when a side's first block is empty)
    from nise_ray.ops.groupapply import join_input
    from nise_ray.ops.relational import _join_partitions
    np_ = _join_partitions()
    j1 = join_input(pairs_ds).join(docs, join_type="left_outer", on=("u",),
                                   right_on=("doc_id",), num_partitions=np_)

    def proj_u(b: pa.Table) -> pa.Table:
        if b.column("text").null_count:
            raise AssertionError("pair endpoint missing from documents")
        return pa.table({"u": b.column("u"), "v": b.column("v"),
                         "text_u": b.column("text")})

    j2 = join_input(j1.map_batches(proj_u, batch_format="pyarrow")) \
        .join(docs, join_type="left_outer", on=("v",),
              right_on=("doc_id",), num_partitions=np_)

    def verify(b: pa.Table) -> pa.Table:
        empty = pa.table({"u": pa.array([], pa.int64()),
                          "v": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        if b.column("text").null_count:
            raise AssertionError("pair endpoint missing from documents")
        u = b.column("u").to_numpy(zero_copy_only=False)
        v = b.column("v").to_numpy(zero_copy_only=False)
        tu = b.column("text_u").to_pylist()
        tv = b.column("text").to_pylist()
        if normalize:
            from nise_ray.ops.normalize import normalize_text
            tu = [normalize_text(t) for t in tu]
            tv = [normalize_text(t) for t in tv]
        keep = np.zeros(len(u), dtype=bool)
        for i in range(len(u)):
            t = sa_block_pairs([tu[i], tv[i]],
                               np.array([u[i], v[i]], np.int64), min_len)
            keep[i] = t.num_rows > 0
        return pa.table({"u": pa.array(u[keep], pa.int64()),
                         "v": pa.array(v[keep], pa.int64())})

    out = collect_table(j2.map_batches(verify, batch_format="pyarrow"))
    if out.num_rows == 0:
        return pa.table({"u": pa.array([], pa.int64()),
                         "v": pa.array([], pa.int64())})
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
