"""Batch equivalent of the reference's online index surface (SURVEY §4.2).

The reference (inferred from BASELINE.json north_star) exposes
insert-into-LSH-index / query-for-near-dups over an in-memory index. The
capability-preserving batch mapping:

    build_index(corpus, index_dir)  == sign + persist the signed table
                                       (the "index" = signed parquet)
    query_index(index_dir, queries) == sign the query set, band-explode
                                       BOTH sides, one groupby(band_key)
                                       shuffle restricted to cross pairs,
                                       verify, rank per query by estimated
                                       Jaccard, top-k

A query set is just a second dataset unioned into the same shuffle — no
per-query lookups, no driver-side index.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from nise_ray.config import DedupConfig
from nise_ray.io import read_corpus
from nise_ray.ops.lsh import explode_bands, sig_matrix
from nise_ray.ops.sign import Signer, make_sign_fn

MATCH_SCHEMA = pa.schema([
    ("query_key", pa.uint64()),
    ("match_key", pa.uint64()),
    ("est", pa.float32()),
])


def sign_dataset(ds: "ray.data.Dataset", cfg: DedupConfig) -> "ray.data.Dataset":
    if cfg.sign_concurrency:
        return ds.map_batches(Signer, fn_constructor_args=(cfg,),
                              batch_format="pyarrow", batch_size=cfg.batch_size,
                              zero_copy_batch=True,
                              concurrency=cfg.sign_concurrency)
    return ds.map_batches(make_sign_fn(cfg), batch_format="pyarrow",
                          batch_size=cfg.batch_size, zero_copy_batch=True)


def build_index(corpus: "str | list[str] | ray.data.Dataset", index_dir: str,
                cfg: DedupConfig | None = None) -> None:
    """Sign the corpus and persist the signed table — the distributed
    equivalent of populating the in-memory LSH index."""
    cfg = cfg or DedupConfig()
    corpus_ds = (read_corpus(corpus) if isinstance(corpus, (str, list)) else corpus)
    sign_dataset(corpus_ds, cfg).write_parquet(index_dir)


def _cross_pairs_for_bucket(doc_keys, sigs, q_mask, cap, k, min_est):
    qi = np.flatnonzero(q_mask)
    ci = np.flatnonzero(~q_mask)
    if len(qi) == 0 or len(ci) == 0:
        return None
    if len(ci) > cap:  # hot bucket: truncate deterministically
        ci = ci[np.argsort(doc_keys[ci])[:cap]]
    out_q, out_c, out_e = [], [], []
    for s0 in range(0, len(qi), 128):
        block = qi[s0 : s0 + 128]
        eq = (sigs[block][:, None, :] == sigs[ci][None, :, :]).sum(
            axis=2, dtype=np.int32)
        est = eq.astype(np.float32) / np.float32(k)
        ii, jj = np.nonzero(est >= min_est)
        out_q.append(doc_keys[block][ii])
        out_c.append(doc_keys[ci][jj])
        out_e.append(est[ii, jj])
    return out_q, out_c, out_e


def _make_cross_pair_batch_gen(cfg: DedupConfig, min_est: float):
    """Block-level fn (hash_group_apply on bkey): cross-side candidate
    pairs with inline verification, vectorized over each bucket."""
    from nise_ray.ops.groupapply import segments
    k = cfg.minhash_k
    cap = cfg.bucket_cap

    def batch_fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return MATCH_SCHEMA.empty_table()
        keys = batch.column("bkey").to_numpy(zero_copy_only=False)
        starts, counts = segments(keys)
        multi = counts >= 2
        if not multi.any():
            return MATCH_SCHEMA.empty_table()
        doc_keys = batch.column("doc_key").to_numpy(zero_copy_only=False)
        sigs = sig_matrix(batch.column("minhash"), k)
        q_mask = pa.compute.equal(
            batch.column("side"), "q").combine_chunks().to_numpy(
                zero_copy_only=False)
        out_q, out_c, out_e = [], [], []
        for s, c in zip(starts[multi], counts[multi]):
            r = _cross_pairs_for_bucket(doc_keys[s:s + c], sigs[s:s + c],
                                        q_mask[s:s + c], cap, k, min_est)
            if r is not None:
                out_q.extend(r[0]); out_c.extend(r[1]); out_e.extend(r[2])
        if not out_q:
            return MATCH_SCHEMA.empty_table()
        return pa.table({
            "query_key": pa.array(np.concatenate(out_q), pa.uint64()),
            "match_key": pa.array(np.concatenate(out_c), pa.uint64()),
            "est": pa.array(np.concatenate(out_e), pa.float32()),
        })

    return batch_fn


def _batch_topk_gen(top_k: int):
    """Block-level per-query top-k (batch sorted by query_key): dedupe
    matches found via several bands (max est per match), rank est desc."""
    from nise_ray.ops.groupapply import segments

    def topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        qk = batch.column("query_key").to_numpy(zero_copy_only=False)
        starts, counts = segments(qk)
        est = batch.column("est").to_numpy(zero_copy_only=False)
        mk = batch.column("match_key").to_numpy(zero_copy_only=False)
        keep_rows = []
        for s, c in zip(starts, counts):
            sl = slice(s, s + c)
            order = np.lexsort((-est[sl], mk[sl])) + s
            first = np.ones(len(order), dtype=bool)
            first[1:] = mk[order][1:] != mk[order][:-1]
            kept = order[first]
            sel = kept[np.lexsort((mk[kept], -est[kept]))][:top_k]
            keep_rows.append(sel)
        return batch.take(pa.array(np.concatenate(keep_rows)))

    return topk


def query_index(index_dir: str, queries: "ray.data.Dataset | pa.Table",
                cfg: DedupConfig | None = None, top_k: int = 10,
                min_est: float = 0.5) -> "ray.data.Dataset":
    """Near-dup matches (query_key, match_key, est) — top_k per query,
    ranked by estimated Jaccard."""
    cfg = cfg or DedupConfig()
    if isinstance(queries, pa.Table):
        queries = ray.data.from_arrow(queries)
    signed_q = sign_dataset(queries, cfg)
    signed_c = ray.data.read_parquet(index_dir, partitioning=None)

    def tag(side: str):
        def fn(b: pa.Table) -> pa.Table:
            ex = explode_bands(b, cfg)
            return ex.append_column("side", pa.array([side] * ex.num_rows))
        return fn

    from nise_ray.ops.groupapply import hash_group_apply

    exploded = signed_q.map_batches(tag("q"), batch_format="pyarrow").union(
        signed_c.map_batches(tag("c"), batch_format="pyarrow"))
    matches = hash_group_apply(exploded, ["bkey"],
                               _make_cross_pair_batch_gen(cfg, min_est),
                               cfg.shuffle_partitions)
    return hash_group_apply(matches, ["query_key"], _batch_topk_gen(top_k),
                            cfg.shuffle_partitions)
