"""Product-quantization (PQ) approximate nearest neighbor.

The memory-scale path for similarity search at 100 TB (Jégou et al.,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011): split
each d-dim vector into m subspaces, k-means each subspace into ks
codes, store one byte per subspace — a 64-dim float32 corpus shrinks
32× (256 B → 8 B per vector), which is what lets the candidate scan
live in memory cluster-wide. Queries score encoded vectors with
asymmetric distance computation (ADC): per query, one (m × ks) lookup
table of exact query-to-codeword inner products, then each vector's
score is a table-gather sum — no decode, vectorized as a numpy fancy
index over the whole batch.

Scale contracts:
- codebooks train driver-side on a deterministic uniform sample
  (order-independent splitmix64 thresholding, same machinery as IVF)
  — sample- not corpus-sized;
- encode + ADC run in ONE stateless actor-pool pass (codebooks + LUTs
  broadcast once via ray.put); per-block pre-top-k means the driver
  merges block-count × k candidate rows, never the corpus. A
  production layout would persist the codes table (vec_id + m bytes)
  once and scan only codes thereafter — the encode stage here emits
  exactly that schema, exercised in tests;
- like all PQ, recall is bounded by quantization distortion; the
  recall gate in tests pins it against the exact oracle on clustered
  data (the regime PQ is built for) and `ops/ann.recall_report`-style
  honesty applies: use brute_force_topk as the measurement baseline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from nise_ray.ops.ann import (_embedding_matrix, _merge_topk, _normalize,
                              _query_head, _uniform_sample)
from nise_ray.util import collect_table


def _train_codebooks(sample: np.ndarray, m: int, ks: int, seed: int,
                     iters: int = 8) -> np.ndarray:
    """(m, ks, d//m) L2 k-means codebooks, one independent k-means per
    subspace, deterministic."""
    n, d = sample.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    dsub = d // m
    ks = min(ks, n)
    books = np.empty((m, ks, dsub))
    rng = np.random.Generator(np.random.PCG64(seed))
    for s in range(m):
        x = sample[:, s * dsub:(s + 1) * dsub]
        cent = x[rng.choice(n, size=ks, replace=False)].copy()
        for _ in range(iters):
            # L2 assignment via the expanded form (no n×ks×dsub temp)
            d2 = (x * x).sum(1)[:, None] - 2.0 * (x @ cent.T) \
                + (cent * cent).sum(1)[None, :]
            assign = np.argmin(d2, axis=1)
            for c in range(ks):
                members = x[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[s] = cent
    return books


def _encode(x: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) uint8 codes: nearest codeword per subspace."""
    n = x.shape[0]
    m, ks, dsub = books.shape
    codes = np.empty((n, m), dtype=np.uint8)
    for s in range(m):
        xs = x[:, s * dsub:(s + 1) * dsub]
        cent = books[s]
        d2 = (xs * xs).sum(1)[:, None] - 2.0 * (xs @ cent.T) \
            + (cent * cent).sum(1)[None, :]
        codes[:, s] = np.argmin(d2, axis=1).astype(np.uint8)
    return codes


def pq_encode(sf_dir: str, m: int = 8, ks: int = 16, seed: int = 42,
              sample_size: int = 2048) -> "ray.data.Dataset":
    """The persistent-codes surface: (vec_id, code_0..code_{m-1}) with
    one uint8 column per subspace — m bytes per vector."""
    from nise_ray.ops.groupapply import default_concurrency
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    sample = _normalize(_embedding_matrix(_uniform_sample(ds, sample_size)))
    books_ref = ray.put(_train_codebooks(sample, m, ks, seed))

    class Encoder:
        def __init__(self) -> None:
            self.books = ray.get(books_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table(
                    {"vec_id": pa.array([], pa.int64()),
                     **{f"code_{s}": pa.array([], pa.uint8())
                        for s in range(m)}})
            codes = _encode(_normalize(_embedding_matrix(b)), self.books)
            return pa.table(
                {"vec_id": b.column("vec_id"),
                 **{f"code_{s}": pa.array(codes[:, s], pa.uint8())
                    for s in range(m)}})

    return ds.map_batches(Encoder, batch_format="pyarrow",
                          zero_copy_batch=True,
                          concurrency=default_concurrency())


def pq_topk(sf_dir: str, n_queries: int = 5, k: int = 10, m: int = 8,
            ks: int = 16, seed: int = 42, sample_size: int = 2048,
            round_to: int = 4, rerank: int = 0) -> pa.Table:
    """ADC top-k of every corpus vector against the first n_queries
    vectors: encode + LUT-gather score fused in one actor-pool pass,
    per-block pre-top-k, driver merge. Returns
    (query_id, vec_id, cosine), self-matches excluded.

    rerank=0 reports the raw ADC estimate as `cosine`. rerank=R>0 is
    the standard deployment (ADC candidate generation + exact re-rank):
    each block keeps its top-R by ADC and re-scores JUST those R with
    exact dot products against the query — O(R·d) instead of O(n·d)
    per query per block — and `cosine` is then exact for every emitted
    row. Tight clusters make raw ADC ranking within a cluster
    arbitrary (quantization collapses near-identical vectors to the
    same codes), which re-rank repairs at negligible cost."""
    from nise_ray.ops.groupapply import default_concurrency
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    sample = _normalize(_embedding_matrix(_uniform_sample(ds, sample_size)))
    books = _train_codebooks(sample, m, ks, seed)

    head = _query_head(ds, n_queries)
    q_ids = head.column("vec_id").to_numpy(zero_copy_only=False)
    q_mat = _normalize(_embedding_matrix(head))
    # per-query LUT: exact inner product of each query subvector with
    # each codeword — (nq, m, ks); queries stay exact, corpus quantized
    dsub = books.shape[2]
    luts = np.einsum("qsd,skd->qsk",
                     q_mat.reshape(len(q_ids), m, dsub), books)
    ref = ray.put((q_ids, q_mat, books, luts))

    class AdcScorer:
        def __init__(self) -> None:
            self.q_ids, self.q_mat, self.books, self.luts = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            empty = pa.table({"query_id": pa.array([], pa.int64()),
                              "vec_id": pa.array([], pa.int64()),
                              "cosine": pa.array([], pa.float64())})
            if b.num_rows == 0:
                return empty
            x = _normalize(_embedding_matrix(b))
            codes = _encode(x, self.books)
            vid = b.column("vec_id").to_numpy(zero_copy_only=False)
            n = len(vid)
            keep = min(max(k + 1, rerank), n)
            sub = np.arange(m)[None, :]
            out_q, out_v, out_s = [], [], []
            for j in range(len(self.q_ids)):
                # gather-sum over the LUT: score_i = Σ_s lut[s, code_is]
                score = self.luts[j][sub, codes].sum(axis=1)
                idx = np.argpartition(-score, keep - 1)[:keep]
                if rerank > 0:
                    # exact re-rank of the R ADC candidates only
                    score = x[idx] @ self.q_mat[j]
                    top = np.argpartition(-score, min(k, len(idx) - 1)) \
                        [:k + 1]
                    idx, score = idx[top], score[top]
                else:
                    score = score[idx]
                out_q.append(np.full(len(idx), self.q_ids[j], np.int64))
                out_v.append(vid[idx])
                out_s.append(score)
            return pa.table({
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "cosine": pa.array(np.concatenate(out_s), pa.float64())})

    partial = ds.map_batches(AdcScorer, batch_format="pyarrow",
                             zero_copy_batch=True,
                             concurrency=default_concurrency())
    return _merge_topk(collect_table(partial), k, round_to,
                       exclude_self=True)
