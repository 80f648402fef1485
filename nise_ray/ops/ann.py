"""Similarity search over an embedding column (list<float>).

* brute_force_topk — exact cosine top-k: the query matrix is broadcast
  ONCE via ray.put and every batch does one numpy matmul against it
  (never re-shipped per batch); per-query global top-k via a tiny
  driver-side merge of per-batch partial top-ks. This is the correctness
  baseline and stays exact at any corpus size (the merge is only
  |queries| x k rows per block).

* lsh_topk — the scale path: sign-random-projection LSH buckets both
  sides; only same-bucket candidates are scored. Probes multiple hash
  tables for recall; approximate by design (recall measured in tests).

* embedding_dup_pairs — embedding-cosine near-dup pairs via SRP-LSH
  bucketing + within-bucket exact scoring, routed through the explicit
  hash-partitioned exchange (ops.groupapply.hash_group_apply — never
  groupby().map_groups). Projection planes are built once on the driver
  and broadcast via ray.put. Oversized buckets are block-wise scored up
  to a hard cap with LOGGED truncation (no silent drops).
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

import ray

from nise_ray.util import collect_table

logger = logging.getLogger(__name__)


def _embedding_matrix(b: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = b.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.FixedSizeListArray):
        dim = arr.type.list_size
        return arr.flatten().to_numpy(zero_copy_only=False).reshape(-1, dim).astype(np.float64)
    offsets = arr.offsets.to_numpy(zero_copy_only=False)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = offsets[1] - offsets[0]
    assert (np.diff(offsets) == dim).all(), "ragged embedding column"
    return flat.reshape(-1, dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _query_head(ds: "ray.data.Dataset", n: int) -> pa.Table:
    """The n smallest-vec_id rows WITHOUT a global sort: each batch emits
    its local n smallest (a filter, not a shuffle), the driver merges the
    tiny union. At any corpus size only n rows per block move."""

    def local_head(b: pa.Table) -> pa.Table:
        if b.num_rows <= n:
            return b
        vids = b.column("vec_id").to_numpy(zero_copy_only=False)
        keep = np.sort(np.argpartition(vids, n - 1)[:n])
        return b.take(pa.array(keep))

    cand = collect_table(ds.map_batches(local_head, batch_format="pyarrow",
                                        zero_copy_batch=True))
    return cand.sort_by("vec_id").slice(0, n)


def brute_force_topk(sf_dir: str, n_queries: int = 5, k: int = 10,
                     round_to: int = 4) -> pa.Table:
    """Exact cosine top-k of every corpus vector against the first
    n_queries vectors (by vec_id), self-matches excluded.
    Returns (query_id, vec_id, cosine) with cosine rounded for stable
    cross-engine comparison."""
    from nise_ray.ops.groupapply import default_concurrency
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    # small, deterministic query set: lowest n_queries vec_ids (no global sort)
    head = _query_head(ds, n_queries)
    q_ids = head.column("vec_id").to_numpy(zero_copy_only=False)
    q_mat = _normalize(_embedding_matrix(head))
    ref = ray.put((q_ids, q_mat))

    class Scorer:
        def __init__(self) -> None:
            self.q_ids, self.q_mat = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            m = _normalize(_embedding_matrix(b))
            vec_ids = b.column("vec_id").to_numpy(zero_copy_only=False)
            sims = m @ self.q_mat.T  # n x q
            nq = len(self.q_ids)
            n = len(vec_ids)
            # per-batch pre-topk: keep only k best per query to shrink the merge
            keep = min(k + 1, n)
            out_q, out_v, out_s = [], [], []
            for j in range(nq):
                idx = np.argpartition(-sims[:, j], keep - 1)[:keep]
                out_q.append(np.full(len(idx), self.q_ids[j], dtype=np.int64))
                out_v.append(vec_ids[idx])
                out_s.append(sims[idx, j])
            return pa.table({
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "cosine": pa.array(np.concatenate(out_s), pa.float64()),
            })

    partial = ds.map_batches(Scorer, batch_format="pyarrow",
                             zero_copy_batch=True,
                             concurrency=default_concurrency())
    # per-batch pre-topk already shrank the data to ~|queries| x k rows per
    # block — the global merge is driver-sized, no shuffle needed
    return _merge_topk(collect_table(partial), k, round_to, exclude_self=True)


def _merge_topk(partial: pa.Table, k: int, round_to: int,
                exclude_self: bool = False) -> pa.Table:
    """Driver-side per-query top-k merge of partial candidate tables."""
    if partial.num_rows == 0:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    qid = partial.column("query_id").to_numpy(zero_copy_only=False)
    vid = partial.column("vec_id").to_numpy(zero_copy_only=False)
    cos = partial.column("cosine").to_numpy(zero_copy_only=False)
    out_q, out_v, out_c = [], [], []
    for q in np.unique(qid):
        m = qid == q
        if exclude_self:
            m &= vid != q
        v, c = vid[m], cos[m]
        # dedupe matches (several blocks/tables can emit the same vec)
        order = np.lexsort((-c, v))
        first = np.ones(len(order), dtype=bool)
        first[1:] = v[order][1:] != v[order][:-1]
        keep = order[first]
        sel = keep[np.lexsort((v[keep], -c[keep]))][:k]
        out_q.append(np.full(len(sel), q, dtype=np.int64))
        out_v.append(v[sel])
        out_c.append(np.round(c[sel], round_to))
    return pa.table({
        "query_id": pa.array(np.concatenate(out_q), pa.int64()),
        "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
        "cosine": pa.array(np.concatenate(out_c), pa.float64()),
    })


def hard_negatives(sf_dir: str, n_queries: int = 5, k: int = 10,
                   round_to: int = 4) -> pa.Table:
    """Hard-negative mining for embedding-model training: for each query
    vector (first n_queries by vec_id), the k most-similar vectors with a
    DIFFERENT label — the near-miss negatives a contrastive trainer
    wants. Exact cosine, same broadcast-matmul shape as brute_force_topk
    (query matrix + labels ray.put ONCE, per-batch matmul with the
    same-label columns masked to -inf before the per-batch pre-top-k);
    the driver merge stays |queries| x k rows per block at any corpus
    size. Returns (query_id, vec_id, cosine)."""
    from nise_ray.ops.groupapply import default_concurrency
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding", "label"])
    head = _query_head(ds, n_queries)
    q_ids = head.column("vec_id").to_numpy(zero_copy_only=False)
    q_labels = head.column("label").to_numpy(
        zero_copy_only=False).astype(np.int64)
    q_mat = _normalize(_embedding_matrix(head))
    ref = ray.put((q_ids, q_labels, q_mat))

    class NegScorer:
        def __init__(self) -> None:
            self.q_ids, self.q_labels, self.q_mat = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            m = _normalize(_embedding_matrix(b))
            vec_ids = b.column("vec_id").to_numpy(zero_copy_only=False)
            labels = b.column("label").to_numpy(
                zero_copy_only=False).astype(np.int64)
            sims = m @ self.q_mat.T  # n x q
            # same-label rows can never be negatives for that query
            sims[labels[:, None] == self.q_labels[None, :]] = -np.inf
            out_q, out_v, out_s = [], [], []
            for j in range(len(self.q_ids)):
                col = sims[:, j]
                ok = np.flatnonzero(np.isfinite(col))
                if len(ok) == 0:
                    continue
                keep = ok[np.argpartition(-col[ok],
                                          min(k, len(ok)) - 1)[:k]] \
                    if len(ok) > k else ok
                out_q.append(np.full(len(keep), self.q_ids[j],
                                     dtype=np.int64))
                out_v.append(vec_ids[keep])
                out_s.append(col[keep])
            if not out_q:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "vec_id": pa.array([], pa.int64()),
                                 "cosine": pa.array([], pa.float64())})
            return pa.table({
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "cosine": pa.array(np.concatenate(out_s), pa.float64()),
            })

    partial = ds.map_batches(NegScorer, batch_format="pyarrow",
                             zero_copy_batch=True,
                             concurrency=default_concurrency())
    return _merge_topk(collect_table(partial), k, round_to,
                       exclude_self=True)


def _srp_codes(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-random-projection bucket codes: one uint64 per (row, table)."""
    bits = (m @ planes.reshape(-1, planes.shape[-1]).T) > 0  # n x (T*B)
    t, bperm = planes.shape[0], planes.shape[1]
    codes = np.zeros((m.shape[0], t), dtype=np.uint64)
    for ti in range(t):
        for bi in range(bperm):
            codes[:, ti] |= bits[:, ti * bperm + bi].astype(np.uint64) << np.uint64(bi)
        codes[:, ti] |= np.uint64(ti) << np.uint64(56)  # table id in high bits
    return codes


def lsh_topk(sf_dir: str, n_queries: int = 5, k: int = 10, n_tables: int = 8,
             n_bits: int = 10, seed: int = 42, round_to: int = 4) -> pa.Table:
    """Approximate cosine top-k via sign-random-projection LSH: vectors are
    bucketed by n_tables independent b-bit codes; queries only score
    vectors sharing a bucket. Scale path for when the corpus side is too
    large for brute-force scoring."""
    from nise_ray.ops.groupapply import default_concurrency
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    head = _query_head(ds, n_queries)
    q_ids = head.column("vec_id").to_numpy(zero_copy_only=False)
    q_mat = _normalize(_embedding_matrix(head))
    dim = q_mat.shape[1]
    rng = np.random.Generator(np.random.PCG64(seed))
    planes = rng.standard_normal((n_tables, n_bits, dim))
    q_codes = _srp_codes(q_mat, planes)
    ref = ray.put((q_ids, q_mat, planes, q_codes))

    class Bucketer:
        def __init__(self) -> None:
            self.q_ids, self.q_mat, self.planes, self.q_codes = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            m = _normalize(_embedding_matrix(b))
            vec_ids = b.column("vec_id").to_numpy(zero_copy_only=False)
            codes = _srp_codes(m, self.planes)  # n x T
            # candidate (query, vector) hits where any table bucket matches
            out_q, out_v, out_s = [], [], []
            for j in range(len(self.q_ids)):
                hit = (codes == self.q_codes[j][None, :]).any(axis=1)
                hit &= vec_ids != self.q_ids[j]
                if not hit.any():
                    continue
                sims = m[hit] @ self.q_mat[j]
                out_q.append(np.full(hit.sum(), self.q_ids[j], dtype=np.int64))
                out_v.append(vec_ids[hit])
                out_s.append(sims)
            if not out_q:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "vec_id": pa.array([], pa.int64()),
                                 "cosine": pa.array([], pa.float64())})
            return pa.table({
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "cosine": pa.array(np.concatenate(out_s), pa.float64()),
            })

    partial = ds.map_batches(Bucketer, batch_format="pyarrow",
                             zero_copy_batch=True,
                             concurrency=default_concurrency())
    return _merge_topk(collect_table(partial), k, round_to)


def embedding_norms(sf_dir: str, round_to: int = 4) -> "ray.data.Dataset":
    """(vec_id, l2_norm) — vectorized norm per batch."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    def norms(b: pa.Table) -> pa.Table:
        m = _embedding_matrix(b)
        return pa.table({
            "vec_id": b.column("vec_id"),
            "l2_norm": pa.array(np.round(np.linalg.norm(m, axis=1), round_to),
                                pa.float64()),
        })

    return ds.map_batches(norms, batch_format="pyarrow", zero_copy_batch=True)


# hard ceiling on members scored per LSH bucket (block-wise O(m^2) scoring
# below it; above it the bucket is truncated deterministically and LOGGED)
_DUP_BUCKET_HARD_CAP = 20_000
_DUP_SCORE_BLOCK = 512


def _dup_pair_batch_fn(threshold: float):
    """Block fn for hash_group_apply keyed on `bucket`: per bucket segment,
    block-wise cosine scoring of unique members (memory-bounded: one
    _DUP_SCORE_BLOCK x m slab at a time, never an m x m matrix)."""
    from nise_ray.ops.groupapply import segments

    def batch_fn(batch: pa.Table) -> pa.Table:
        empty = pa.table({"u": pa.array([], pa.int64()),
                          "v": pa.array([], pa.int64()),
                          "cosine": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        buckets = batch.column("bucket").to_numpy(zero_copy_only=False)
        starts, counts = segments(buckets)
        multi = counts >= 2
        if not multi.any():
            return empty
        vids_all = batch.column("vec_id").to_numpy(zero_copy_only=False)
        out_u, out_v, out_c = [], [], []
        for s, c in zip(starts[multi], counts[multi]):
            vids = vids_all[s:s + c]
            uniq, idx = np.unique(vids, return_index=True)
            m = len(uniq)
            if m < 2:
                continue
            if m > _DUP_BUCKET_HARD_CAP:
                logger.warning(
                    "embedding_dup_pairs: bucket %d has %d members; scoring "
                    "the %d smallest vec_ids only (deterministic truncation)",
                    int(buckets[s]), m, _DUP_BUCKET_HARD_CAP)
                uniq = uniq[:_DUP_BUCKET_HARD_CAP]
                idx = idx[:_DUP_BUCKET_HARD_CAP]
                m = _DUP_BUCKET_HARD_CAP
            mat = _normalize(_embedding_matrix(
                batch.slice(s, c).take(pa.array(idx))))
            for b0 in range(0, m - 1, _DUP_SCORE_BLOCK):
                blk = mat[b0:b0 + _DUP_SCORE_BLOCK]
                sims = blk @ mat.T  # block x m
                ii, jj = np.nonzero(sims >= threshold)
                gi = ii + b0
                keep = gi < jj  # upper triangle only
                if keep.any():
                    out_u.append(uniq[gi[keep]])
                    out_v.append(uniq[jj[keep]])
                    out_c.append(np.round(sims[ii[keep], jj[keep]], 4))
        if not out_u:
            return empty
        return pa.table({
            "u": pa.array(np.concatenate(out_u), pa.int64()),
            "v": pa.array(np.concatenate(out_v), pa.int64()),
            "cosine": pa.array(np.concatenate(out_c), pa.float64()),
        })

    return batch_fn


def _dup_distinct_batch(batch: pa.Table) -> pa.Table:
    """(u, v) distinct across LSH tables — one lexsort per block."""
    if batch.num_rows <= 1:
        return batch
    u = batch.column("u").to_numpy(zero_copy_only=False)
    v = batch.column("v").to_numpy(zero_copy_only=False)
    order = np.lexsort((v, u))
    first = np.ones(len(order), dtype=bool)
    first[1:] = (u[order][1:] != u[order][:-1]) | (v[order][1:] != v[order][:-1])
    return batch.take(pa.array(order[first]))


def embedding_dup_pairs(sf_dir: str, threshold: float = 0.98,
                        seed: int = 42, n_tables: int = 8,
                        n_bits: int = 8) -> "ray.data.Dataset":
    """Embedding-cosine near-duplicate pairs (u < v, cosine >= threshold):
    SRP-LSH bucketing (planes broadcast once via ray.put), ONE hash
    exchange on bucket, vectorized within-bucket scoring, then a (u, v)
    distinct exchange across tables."""
    from nise_ray.ops.groupapply import hash_group_apply
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    # planes built ONCE on the driver and broadcast — not per task
    meta = collect_table(ds.limit(1))
    dim = _embedding_matrix(meta).shape[1]
    planes = np.random.Generator(np.random.PCG64(seed)).standard_normal(
        (n_tables, n_bits, dim))
    planes_ref = ray.put(planes)

    class Bucketer:
        def __init__(self) -> None:
            self.planes = ray.get(planes_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            m = _normalize(_embedding_matrix(b))
            codes = _srp_codes(m, self.planes)  # n x T
            n, t = codes.shape
            vec_ids = b.column("vec_id").to_numpy(zero_copy_only=False)
            rep = np.repeat(np.arange(n), t)
            emb = b.column("embedding")
            if isinstance(emb, pa.ChunkedArray):
                emb = emb.combine_chunks()
            return pa.table({
                "bucket": pa.array(codes.ravel(), pa.uint64()),
                "vec_id": pa.array(vec_ids[rep], pa.int64()),
                "embedding": emb.take(pa.array(rep)),
            })

    from nise_ray.ops.groupapply import default_concurrency
    bucketed = ds.map_batches(Bucketer, batch_format="pyarrow",
                              zero_copy_batch=True,
                              concurrency=default_concurrency())
    pairs = hash_group_apply(bucketed, ["bucket"],
                             _dup_pair_batch_fn(threshold)).materialize()
    if pairs.count() == 0:
        return pairs
    # no output sort: the pair SET is deterministic across runs; a global
    # sort here is pure cosmetics (see dedupx.ngram_jaccard_pairs)
    return hash_group_apply(pairs, ["u", "v"], _dup_distinct_batch,
                            sort=False)


def _exact_pair_ds(sf_dir: str, threshold: float, round_to: int,
                   broadcast_max: int) -> "ray.data.Dataset":
    """Streaming Dataset of exact embedding-cosine pairs (u < v,
    round(cosine, round_to) >= threshold) — the shared candidate
    generator behind `embedding_dup_pairs_exact` (collected + sorted
    oracle baseline) and `embedding_clusters` (fed straight into the
    distributed components exchange without a driver materialization).

    Shape: the normalized corpus matrix is built once on the driver and
    broadcast via ray.put; every batch does ONE numpy matmul against it
    (batch x N sims, never an N x N matrix) and emits only its qualifying
    upper-triangle pairs. Work is inherently O(N^2/batches) — exact
    all-pairs does not scale past ~1M vectors, which is why the gate
    refuses beyond `broadcast_max` and points at the SRP-LSH / IVF paths."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    n_vecs = ds.count()  # parquet metadata count — no read
    if n_vecs > broadcast_max:
        raise ValueError(
            f"exact embedding pairs: {n_vecs} vectors > broadcast_max="
            f"{broadcast_max}; exact all-pairs is O(N^2) — use "
            "embedding_dup_pairs (SRP-LSH) at this scale")
    full = collect_table(ds)
    order = np.argsort(full.column("vec_id").to_numpy(zero_copy_only=False))
    full = full.take(pa.array(order))
    vids = full.column("vec_id").to_numpy(zero_copy_only=False)
    mat = _normalize(_embedding_matrix(full))
    corpus_ref = ray.put((vids, mat))

    class ExactScorer:
        def __init__(self) -> None:
            self.vids, self.mat = ray.get(corpus_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            bm = _normalize(_embedding_matrix(b))
            bv = b.column("vec_id").to_numpy(zero_copy_only=False)
            sims = np.round(bm @ self.mat.T, round_to)  # batch x N
            ii, jj = np.nonzero(sims >= threshold)
            keep = bv[ii] < self.vids[jj]  # u < v (also drops self-pairs)
            return pa.table({
                "u": pa.array(bv[ii[keep]], pa.int64()),
                "v": pa.array(self.vids[jj[keep]], pa.int64()),
                "cosine": pa.array(sims[ii[keep], jj[keep]], pa.float64()),
            })

    from nise_ray.ops.groupapply import default_concurrency
    return ds.map_batches(ExactScorer, batch_format="pyarrow",
                          zero_copy_batch=True,
                          concurrency=default_concurrency())


def embedding_dup_pairs_exact(sf_dir: str, threshold: float = 0.5,
                              round_to: int = 4,
                              broadcast_max: int = 1_000_000) -> pa.Table:
    """EXACT embedding-cosine pairs (u < v, round(cosine, 4) >= threshold)
    — the SQL-oracled correctness baseline for `embedding_dup_pairs`.
    This op exists to *measure* the LSH/IVF paths' recall, not to replace
    them; see _exact_pair_ds for the shape and the O(N^2) scale gate."""
    out = collect_table(_exact_pair_ds(sf_dir, threshold, round_to,
                                       broadcast_max))
    return out.sort_by([("u", "ascending"), ("v", "ascending")])


def embedding_clusters(sf_dir: str, threshold: float = 0.35,
                       round_to: int = 4,
                       broadcast_max: int = 1_000_000) -> pa.Table:
    """EMBEDDING-DUPLICATE CLUSTERING: connected components over the
    exact cosine-duplicate pair graph — every vector labeled with the
    min vec_id of its component (singletons label themselves). This is
    the first externally-oracled run of the engine's core union-find
    replacement: the DuckDB oracle computes the same components with a
    recursive min-label CTE, so the alternating large-star/small-star
    exchange (ops/components.py, Kiveris et al. SoCC'14) is verified
    against an independent engine, not just internal parity tests.

    Scale shape: pair generation is the gated exact path here (the
    oracle needs a deterministic edge set); at corpus scale the same
    components code consumes the SRP-LSH pair Dataset instead — the CC
    exchange itself never materializes more than the edge set per round
    and the label attach is broadcast-gated with a distributed
    left-outer-join fallback (attach_labels)."""
    from nise_ray.config import DedupConfig
    from nise_ray.ops.components import attach_labels, distributed_components

    cfg = DedupConfig()
    pairs = _exact_pair_ds(sf_dir, threshold, round_to,
                           broadcast_max).select_columns(["u", "v"])
    labels = distributed_components(pairs, cfg)

    vecs = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id"])

    def as_doc_key(b: pa.Table) -> pa.Table:
        return pa.table({"doc_key": b.column("vec_id").cast(pa.uint64())})

    keyed = vecs.map_batches(as_doc_key, batch_format="pyarrow",
                             zero_copy_batch=True)
    labeled = attach_labels(keyed, labels, cfg)

    def to_int64(b: pa.Table) -> pa.Table:
        return pa.table({
            "vec_id": b.column("doc_key").cast(pa.int64()),
            "cluster_id": b.column("cluster_id").cast(pa.int64()),
        })

    out = collect_table(labeled.map_batches(to_int64,
                                            batch_format="pyarrow",
                                            zero_copy_batch=True))
    return out.sort_by("vec_id")


def _uniform_sample(ds: "ray.data.Dataset", n: int) -> pa.Table:
    """~n uniformly-sampled rows, deterministic and order-independent:
    keep rows where splitmix64(vec_id) < threshold (threshold sized from
    the metadata-only parquet row count with 1.5x headroom), then trim to
    exactly <=n by the hash value so the chosen set never depends on block
    order. Only the sampled rows leave the tasks — no shuffle."""
    from nise_ray.hashing import splitmix64, U64
    total = ds.count()  # parquet metadata, no scan
    if total <= n:
        return collect_table(ds)
    frac = 1.5 * n / total
    if frac >= 1.0:
        # headroom covers the whole corpus (n < total < 1.5n): collect
        # and trim below — int(1.0 * 2^64) would overflow the uint64
        # threshold
        t = collect_table(ds)
    else:
        thresh = U64(int(frac * float(2**64 - 1)))

        def keep_fn(b: pa.Table) -> pa.Table:
            vids = b.column("vec_id").to_numpy(
                zero_copy_only=False).astype(U64)
            return b.filter(pa.array(splitmix64(vids) < thresh))

        t = collect_table(ds.map_batches(keep_fn, batch_format="pyarrow",
                                         zero_copy_batch=True))
    if t.num_rows <= n:
        return t
    h = splitmix64(t.column("vec_id").to_numpy(zero_copy_only=False).astype(U64))
    return t.take(pa.array(np.sort(np.argsort(h, kind="stable")[:n])))


def _kmeans_centroids(sample: np.ndarray, n_centroids: int, seed: int,
                      iters: int = 4) -> np.ndarray:
    """Deterministic mini k-means on a driver-side sample (spherical:
    centroids re-normalized every iteration, cosine assignment)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    n = sample.shape[0]
    k = min(n_centroids, n)
    cent = sample[rng.choice(n, size=k, replace=False)]
    cent = _normalize(cent)
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_topk(sf_dir: str, n_queries: int = 5, k: int = 10,
             n_centroids: int = 64, n_probe: int = 16, seed: int = 42,
             sample_size: int = 4096, round_to: int = 4) -> pa.Table:
    """IVF (inverted-file) approximate cosine top-k — the classic
    many-query scale path: k-means centroids are trained ONCE on a
    driver-side sample and broadcast; each batch assigns its vectors to
    their nearest centroid and scores ONLY vectors falling in a query's
    n_probe closest cells. Cell assignment costs one matmul against
    n_centroids regardless of query count, so for large query sets this
    beats brute force by ~n_probe/n_centroids while LSH (lsh_topk)
    remains the single-pass alternative. Approximate by design; recall
    measured in tests."""
    from nise_ray.ops.groupapply import default_concurrency
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    # deterministic UNIFORM training sample: keep rows whose
    # splitmix64(vec_id) falls below a threshold sized from the (metadata-
    # only) row count — lowest-vec_id sampling would bias centroids when
    # vec_id order correlates with the embedding distribution (data
    # appended by source)
    sample_t = _uniform_sample(ds, sample_size)
    sample = _normalize(_embedding_matrix(sample_t))
    cent = _kmeans_centroids(sample, n_centroids, seed)

    head = _query_head(ds, n_queries)
    q_ids = head.column("vec_id").to_numpy(zero_copy_only=False)
    q_mat = _normalize(_embedding_matrix(head))
    # each query probes its n_probe nearest cells
    q_cells = np.argsort(-(q_mat @ cent.T), axis=1)[:, :n_probe]
    ref = ray.put((q_ids, q_mat, cent, q_cells))

    class Prober:
        def __init__(self) -> None:
            self.q_ids, self.q_mat, self.cent, self.q_cells = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            m = _normalize(_embedding_matrix(b))
            vec_ids = b.column("vec_id").to_numpy(zero_copy_only=False)
            cells = np.argmax(m @ self.cent.T, axis=1)
            out_q, out_v, out_s = [], [], []
            for j in range(len(self.q_ids)):
                hit = np.isin(cells, self.q_cells[j])
                hit &= vec_ids != self.q_ids[j]
                if not hit.any():
                    continue
                sims = m[hit] @ self.q_mat[j]
                keep = min(k, int(hit.sum()))
                top = np.argpartition(-sims, keep - 1)[:keep]
                out_q.append(np.full(keep, self.q_ids[j], dtype=np.int64))
                out_v.append(vec_ids[hit][top])
                out_s.append(sims[top])
            if not out_q:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "vec_id": pa.array([], pa.int64()),
                                 "cosine": pa.array([], pa.float64())})
            return pa.table({
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "cosine": pa.array(np.concatenate(out_s), pa.float64()),
            })

    partial = ds.map_batches(Prober, batch_format="pyarrow",
                             zero_copy_batch=True,
                             concurrency=default_concurrency())
    return _merge_topk(collect_table(partial), k, round_to)


def _train_centroids(ds: "ray.data.Dataset", n_centroids: int, seed: int,
                     sample_size: int) -> np.ndarray:
    """Shared trainer: spherical k-means on a deterministic uniform
    driver-side sample (splitmix64 thinning — see _uniform_sample),
    centroids broadcast-ready. Sample-trained Lloyd is the standard
    web-scale recipe (IVF/SemDeDup): the sample is statistics-sized, the
    corpus is touched only by the single assignment pass."""
    sample = _normalize(_embedding_matrix(_uniform_sample(ds, sample_size)))
    return _kmeans_centroids(sample, n_centroids, seed)


def _cluster_assigner(cent_ref, out_col: str = "cluster"):
    """Actor-pool stage: nearest-centroid (cosine) assignment, one matmul
    per batch against the broadcast centroid matrix."""

    class AssignCluster:
        def __init__(self) -> None:
            self.cent = ray.get(cent_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            m = _normalize(_embedding_matrix(b))
            cells = np.argmax(m @ self.cent.T, axis=1).astype(np.int64)
            return b.append_column(out_col, pa.array(cells, pa.int64()))

    return AssignCluster


def embedding_kmeans(sf_dir: str, n_centroids: int = 32, seed: int = 42,
                     sample_size: int = 4096) -> "ray.data.Dataset":
    """Distributed k-means clustering of the embedding corpus: centroids
    trained once on a uniform sample (driver-side Lloyd, deterministic),
    then ONE stateless assignment pass over the corpus — (vec_id,
    cluster). This is the partitioning primitive semantic dedup, IVF
    search and curriculum bucketing all share; at 100 TB the corpus pass
    is embarrassingly parallel and the only broadcast is the k x dim
    centroid matrix."""
    from nise_ray.ops.groupapply import default_concurrency
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    cent_ref = ray.put(_train_centroids(ds, n_centroids, seed, sample_size))
    assigned = ds.map_batches(_cluster_assigner(cent_ref),
                              batch_format="pyarrow", zero_copy_batch=True,
                              concurrency=default_concurrency())
    return assigned.select_columns(["vec_id", "cluster"])


def semantic_dedup(sf_dir: str, threshold: float = 0.95,
                   n_centroids: int = 32, seed: int = 42,
                   sample_size: int = 4096) -> "ray.data.Dataset":
    """SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embeddings, then score cosine
    similarity ONLY within each cluster — pairs (u < v, cosine >=
    threshold). The cluster exchange replaces the all-pairs matrix with
    k independent m_c^2 problems; within-cluster scoring reuses the
    blocked slab kernel from embedding_dup_pairs (memory-bounded,
    deterministic truncation on pathological clusters). Approximate by
    design — a near-dup pair split across two clusters is missed; recall
    vs the exact oracle is measured in tests, and raising n_centroids
    trades recall for speed exactly as in the paper."""
    from nise_ray.ops.groupapply import default_concurrency, hash_group_apply
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    cent_ref = ray.put(_train_centroids(ds, n_centroids, seed, sample_size))
    bucketed = ds.map_batches(_cluster_assigner(cent_ref, out_col="bucket"),
                              batch_format="pyarrow", zero_copy_batch=True,
                              concurrency=default_concurrency())
    # one cluster-keyed exchange (sort=True: the pair kernel segments on
    # contiguous bucket runs); single table, so pairs are already
    # distinct (unlike the multi-table LSH path)
    return hash_group_apply(bucketed, ["bucket"],
                            _dup_pair_batch_fn(threshold))


def semantic_dedup_keep(sf_dir: str, threshold: float = 0.95,
                        n_centroids: int = 32, seed: int = 42,
                        sample_size: int = 4096) -> pa.Table:
    """SemDeDup's end artifact: the KEEP LIST. Near-dup pairs from
    semantic_dedup are resolved to connected components (transitive
    closure — A~B, B~C dedups all three together even when A~C is
    missed), each group keeps its min vec_id as representative, every
    other member is dropped. Returns (vec_id, rep_id, kept) for the
    whole corpus, kept-count = n - sum(group_size - 1).

    Scale shape: the pair set is near-dup-sized (not corpus-sized); the
    CC here uses the vectorized driver path — past the flagship's
    driver_cc_max_edges gate the same pairs feed
    ops.components.distributed_components instead. The final kept flag
    attaches with one broadcast of the (dup-member -> rep) map into a
    stateless corpus map — no shuffle."""
    from nise_ray.ops.components import driver_components
    from nise_ray.ops.groupapply import default_concurrency
    pairs = semantic_dedup(sf_dir, threshold=threshold,
                           n_centroids=n_centroids, seed=seed,
                           sample_size=sample_size)
    labels = driver_components(pairs)   # (doc_key, cluster_id), edge nodes
    mem = labels.column("doc_key").to_numpy(
        zero_copy_only=False).astype(np.int64)
    rep = labels.column("cluster_id").to_numpy(
        zero_copy_only=False).astype(np.int64)
    order = np.argsort(mem)
    mem, rep = mem[order], rep[order]
    ref = ray.put((mem, rep))

    class KeepFlag:
        def __init__(self) -> None:
            self.mem, self.rep = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            vid = b.column("vec_id").to_numpy(zero_copy_only=False)
            hi = max(len(self.mem) - 1, 0)
            pos = np.clip(np.searchsorted(self.mem, vid), 0, hi)
            in_grp = (self.mem[pos] == vid) if len(self.mem) else \
                np.zeros(len(vid), dtype=bool)
            rep_id = np.where(in_grp, self.rep[pos] if len(self.mem)
                              else 0, vid)
            return pa.table({
                "vec_id": pa.array(vid, pa.int64()),
                "rep_id": pa.array(rep_id, pa.int64()),
                "kept": pa.array(rep_id == vid, pa.bool_()),
            })

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id"])
    out = collect_table(ds.map_batches(KeepFlag, batch_format="pyarrow",
                                       zero_copy_batch=True,
                                       concurrency=default_concurrency()))
    return out.sort_by([("vec_id", "ascending")])


def dup_graph_triangles(sf_dir: str, threshold: float = 0.3,
                        round_to: int = 4,
                        broadcast_max: int = 1_000_000) -> pa.Table:
    """TRIANGLE COUNT over the exact cosine-duplicate pair graph — the
    graph-motif (3-way self-join) primitive: how many vector triples are
    mutually near-duplicate. Dense triangle neighborhoods are the signal
    that a near-dup CLUSTER is real rather than a chain of borderline
    pairs, so this is the cluster-quality audit a dedup pipeline runs on
    its own edge set.

    Plan (node-iterator as two distributed phases, no driver graph):
    1. wedges — one hash exchange of the edge set on the LOW endpoint;
       each u-segment emits every neighbor pair (v1 < v2) via a
       vectorized triu expansion (no per-wedge Python). Wedge volume is
       sum(deg_u^2)/2 over low endpoints — the u<v orientation is the
       standard degree-splitting bound.
    2. closure — wedges (tagged 1) union the edge set (tagged 0), ONE
       hash exchange on the (a, b) pair key; a segment contributes its
       wedge count iff an edge row is present. Block partials sum to a
       single driver row. Returns (n_triangles,) as a 1-row table."""
    edges = _exact_pair_ds(sf_dir, threshold, round_to, broadcast_max) \
        .select_columns(["u", "v"])
    # the edge set feeds BOTH the wedge exchange and the closure union;
    # Ray Data does not share common sub-DAGs, so an unmaterialized
    # reuse duplicates the whole scorer pipeline (two actor pools + two
    # reads) and the doubled reservation deadlocked a 4-CPU session.
    # One materialize of the (candidate-pair-sized, never corpus-sized)
    # edge set is the correct barrier here.
    edges = edges.materialize()
    from nise_ray.ops.groupapply import hash_group_apply, segments

    def wedges(batch: pa.Table) -> pa.Table:
        empty = pa.table({"x": pa.array([], pa.int64()),
                          "y": pa.array([], pa.int64()),
                          "wedge": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        starts, counts = segments(u)
        pos_in = np.arange(len(u), dtype=np.int64) - np.repeat(starts, counts)
        total = int(pos_in.sum())
        if total == 0:
            return empty
        second = np.repeat(np.arange(len(u), dtype=np.int64), pos_in)
        cum = np.cumsum(pos_in) - pos_in
        cc = np.arange(total, dtype=np.int64) - np.repeat(cum, pos_in)
        first = second - np.repeat(pos_in, pos_in) + cc
        return pa.table({"x": pa.array(v[first], pa.int64()),
                         "y": pa.array(v[second], pa.int64()),
                         "wedge": pa.array(np.ones(total, np.int64))})

    wedge_ds = hash_group_apply(edges, ["u"], wedges, 0, sort=False)

    def edge_rows(batch: pa.Table) -> pa.Table:
        return pa.table({"x": batch.column("u"),
                         "y": batch.column("v"),
                         "wedge": pa.array(np.zeros(batch.num_rows,
                                                    np.int64))})

    tagged = wedge_ds.union(edges.map_batches(
        edge_rows, batch_format="pyarrow", zero_copy_batch=True))

    def close_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"n_triangles": pa.array([0], pa.int64())})
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        w = batch.column("wedge").to_numpy(zero_copy_only=False)
        order = np.lexsort((y, x))
        xs, ys, ws = x[order], y[order], w[order]
        change = np.empty(len(xs), dtype=bool)
        change[0] = True
        change[1:] = (xs[1:] != xs[:-1]) | (ys[1:] != ys[:-1])
        starts = np.flatnonzero(change)
        n_wedge = np.add.reduceat(ws, starts)
        n_rows = np.diff(np.append(starts, len(xs)))
        has_edge = n_rows > n_wedge  # edge rows carry wedge=0
        return pa.table({"n_triangles":
                         pa.array([int(n_wedge[has_edge].sum())],
                                  pa.int64())})

    partials = collect_table(hash_group_apply(tagged, ["x", "y"],
                                              close_partial, 0, sort=False))
    total = int(np.sum(partials.column("n_triangles")
                       .to_numpy(zero_copy_only=False))) \
        if partials.num_rows else 0
    return pa.table({"n_triangles": pa.array([total], pa.int64())})


def ann_recall_report(sf_dir: str, n_queries: int = 5, k: int = 10
                      ) -> pa.Table:
    """First-class recall measurement for the approximate ANN paths:
    run SRP-LSH and IVF top-k against the exact brute-force baseline on
    the same queries and report per-method recall@k — the audit a
    retrieval pipeline publishes alongside its index build (mirrors
    dedup_recall_report for the dedup flagship). Returns one row per
    method: (method, n_queries, k, n_hits, n_truth, recall).

    Cost shape: all three paths are the existing operators (baseline =
    one streaming matmul pass; LSH/IVF are the bucketed paths), so this
    report costs what its inputs cost — nothing new materializes beyond
    their top-k outputs."""
    exact = brute_force_topk(sf_dir, n_queries=n_queries, k=k)
    truth = set(zip(exact.column("query_id").to_pylist(),
                    exact.column("vec_id").to_pylist()))
    # each method runs at its gated operating point (the configs the
    # recall tests pin), not the cheap defaults
    rows = []
    for method, fn, kw in (
            ("lsh", lsh_topk, {"n_tables": 16, "n_bits": 6}),
            ("ivf", ivf_topk, {"n_centroids": 32, "n_probe": 16})):
        got = fn(sf_dir, n_queries=n_queries, k=k, **kw)
        approx = set(zip(got.column("query_id").to_pylist(),
                         got.column("vec_id").to_pylist()))
        hits = len(truth & approx)
        rows.append((method, hits))
    n_truth = len(truth)
    return pa.table({
        "method": pa.array([r[0] for r in rows], pa.string()),
        "n_queries": pa.array([n_queries] * len(rows), pa.int64()),
        "k": pa.array([k] * len(rows), pa.int64()),
        "n_hits": pa.array([r[1] for r in rows], pa.int64()),
        "n_truth": pa.array([n_truth] * len(rows), pa.int64()),
        "recall": pa.array([round(r[1] / n_truth, 4) if n_truth else 1.0
                            for r in rows], pa.float64()),
    })
