"""Similarity search over an embedding column (list<float>).

* brute_force_topk — exact cosine top-k: the query matrix is broadcast
  ONCE via ray.put and every batch does one numpy matmul against it
  (never re-shipped per batch); per-query global top-k via a tiny
  groupby. This is the correctness baseline and stays exact at any corpus
  size (the shuffle is only |queries| x k rows).

* lsh_topk — the scale path: sign-random-projection LSH buckets both
  sides; only same-bucket candidates are scored. Probes multiple hash
  tables for recall; approximate by design (recall measured in tests).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from nise_ray.util import collect_table


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


def brute_force_topk(sf_dir: str, n_queries: int = 5, k: int = 10,
                     round_to: int = 4) -> pa.Table:
    """Exact cosine top-k of every corpus vector against the first
    n_queries vectors (by vec_id), self-matches excluded.
    Returns (query_id, vec_id, cosine) with cosine rounded for stable
    cross-engine comparison."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    # small, deterministic query set: lowest n_queries vec_ids
    head = collect_table(ds.sort("vec_id").limit(n_queries))
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
            # per-batch pre-topk: keep only k best per query to shrink shuffle
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
                             zero_copy_batch=True, concurrency=(1, 8))
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
    vectors sharing a bucket (a groupby shuffle, no broadcast of the
    corpus). Scale path for when the corpus side is too large for
    brute-force scoring."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    head = collect_table(ds.sort("vec_id").limit(n_queries))
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
                             zero_copy_batch=True, concurrency=(1, 8))
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


def embedding_dup_pairs(sf_dir: str, threshold: float = 0.98,
                        seed: int = 42) -> pa.Table:
    """Embedding-cosine near-duplicate pairs (u < v, cosine >= threshold)
    via LSH bucketing + within-bucket exact scoring."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    planes_holder = {}

    def bucket(b: pa.Table) -> pa.Table:
        m = _normalize(_embedding_matrix(b))
        if "planes" not in planes_holder:
            planes_holder["planes"] = np.random.Generator(
                np.random.PCG64(seed)).standard_normal((8, 8, m.shape[1]))
        codes = _srp_codes(m, planes_holder["planes"])  # n x T
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

    bucketed = ds.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)

    def pair_gen(group: pa.Table) -> pa.Table:
        empty = pa.table({"u": pa.array([], pa.int64()),
                          "v": pa.array([], pa.int64()),
                          "cosine": pa.array([], pa.float64())})
        if group.num_rows < 2:
            return empty
        vids = group.column("vec_id").to_numpy(zero_copy_only=False)
        uniq, idx = np.unique(vids, return_index=True)
        if len(uniq) < 2 or len(uniq) > 2000:
            return empty
        m = _normalize(_embedding_matrix(group.take(pa.array(idx))))
        sims = m @ m.T
        ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
        if not len(ii):
            return empty
        return pa.table({
            "u": pa.array(np.minimum(uniq[ii], uniq[jj]), pa.int64()),
            "v": pa.array(np.maximum(uniq[ii], uniq[jj]), pa.int64()),
            "cosine": pa.array(np.round(sims[ii, jj], 4), pa.float64()),
        })

    pairs = bucketed.groupby("bucket").map_groups(pair_gen, batch_format="pyarrow")
    t = collect_table(pairs)
    if t.num_rows == 0:
        return t
    # distinct across tables
    df = t.to_pandas().drop_duplicates(subset=["u", "v"]).sort_values(["u", "v"])
    return pa.Table.from_pandas(df, preserve_index=False)
