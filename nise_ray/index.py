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
from nise_ray.ops.sign import Signer

MATCH_SCHEMA = pa.schema([
    ("query_key", pa.uint64()),
    ("match_key", pa.uint64()),
    ("est", pa.float32()),
])


def sign_dataset(ds: "ray.data.Dataset", cfg: DedupConfig) -> "ray.data.Dataset":
    return ds.map_batches(Signer, fn_constructor_args=(cfg,),
                          batch_format="pyarrow", batch_size=cfg.batch_size,
                          zero_copy_batch=True,
                          concurrency=cfg.sign_concurrency or (1, 32))


def build_index(corpus: "str | list[str] | ray.data.Dataset", index_dir: str,
                cfg: DedupConfig | None = None) -> None:
    """Sign the corpus and persist the signed table — the distributed
    equivalent of populating the in-memory LSH index."""
    cfg = cfg or DedupConfig()
    corpus_ds = (read_corpus(corpus) if isinstance(corpus, (str, list)) else corpus)
    sign_dataset(corpus_ds, cfg).write_parquet(index_dir)


def _make_cross_pair_gen(cfg: DedupConfig, min_est: float):
    k = cfg.minhash_k
    cap = cfg.bucket_cap

    def pair_gen(group: pa.Table) -> pa.Table:
        side = np.asarray(group.column("side").to_pylist())
        q_mask = side == "q"
        if not q_mask.any() or q_mask.all():
            return MATCH_SCHEMA.empty_table()
        doc_keys = group.column("doc_key").to_numpy(zero_copy_only=False)
        sigs = sig_matrix(group.column("minhash"), k)
        qi = np.flatnonzero(q_mask)
        ci = np.flatnonzero(~q_mask)
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
        if not out_q:
            return MATCH_SCHEMA.empty_table()
        return pa.table({
            "query_key": pa.array(np.concatenate(out_q), pa.uint64()),
            "match_key": pa.array(np.concatenate(out_c), pa.uint64()),
            "est": pa.array(np.concatenate(out_e), pa.float32()),
        })

    return pair_gen


def _topk_gen(top_k: int):
    def topk(group: pa.Table) -> pa.Table:
        est = group.column("est").to_numpy(zero_copy_only=False)
        mk = group.column("match_key").to_numpy(zero_copy_only=False)
        # dedupe matches found via several bands: keep max est per match
        order = np.lexsort((-est, mk))
        first = np.ones(len(order), dtype=bool)
        first[1:] = mk[order][1:] != mk[order][:-1]
        keep = order[first]
        sel = keep[np.lexsort((mk[keep], -est[keep]))][:top_k]
        return group.take(pa.array(sel))

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
    signed_c = ray.data.read_parquet(index_dir)

    def tag(side: str):
        def fn(b: pa.Table) -> pa.Table:
            ex = explode_bands(b, cfg)
            return ex.append_column("side", pa.array([side] * ex.num_rows))
        return fn

    exploded = signed_q.map_batches(tag("q"), batch_format="pyarrow").union(
        signed_c.map_batches(tag("c"), batch_format="pyarrow"))
    matches = exploded.groupby("bkey").map_groups(
        _make_cross_pair_gen(cfg, min_est), batch_format="pyarrow")
    return matches.groupby("query_key").map_groups(
        _topk_gen(top_k), batch_format="pyarrow")
