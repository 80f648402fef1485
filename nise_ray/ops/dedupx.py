"""Dedup operators specialised for the `documents` table — the
training-data-pipeline surface (exact / MinHash-LSH / SimHash /
n-gram-Jaccard dedup), re-using the corpus engine via the
documents→corpus adapter.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from nise_ray.util import collect_table

from nise_ray.config import DedupConfig
from nise_ray.io import corpus_from_documents
from nise_ray.pipeline import dedup_pipeline


def exact_dedup_documents(sf_dir: str) -> "ray.data.Dataset":
    """Exact dedup groups: (rep_doc_id, n_dups) — one row per distinct
    text, representative = min doc_id (hash-partition + per-group first)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def group_fn(g: pa.Table) -> pa.Table:
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "rep_doc_id": pa.array([int(ids.min())], pa.int64()),
            "n_dups": pa.array([len(ids)], pa.int64()),
        })

    return ds.groupby("text").map_groups(group_fn, batch_format="pyarrow")


def minhash_dedup_documents(sf_dir: str, cfg: DedupConfig | None = None) -> pa.Table:
    """Near-dup clustering of documents: (doc_id, cluster_size) via the
    full corpus engine over the adapted documents table. cluster ids are
    internal doc_keys, so the stable output is per-doc cluster size."""
    cfg = cfg or DedupConfig()
    corpus = corpus_from_documents(sf_dir)
    res = dedup_pipeline(corpus, cfg)
    t = collect_table(res.assignments)
    # path is "doc{doc_id}" by construction of the adapter
    doc_ids = np.array([int(p[3:]) for p in t.column("path").to_pylist()],
                       dtype=np.int64)
    clusters = t.column("cluster_id").to_numpy(zero_copy_only=False)
    uniq, inv, counts = np.unique(clusters, return_inverse=True, return_counts=True)
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "cluster_size": pa.array(counts[inv], pa.int64()),
    }).sort_by("doc_id")


def simhash_documents(sf_dir: str, cfg: DedupConfig | None = None) -> "ray.data.Dataset":
    """(doc_id, simhash_hex) fingerprints for every document."""
    cfg = cfg or DedupConfig()
    from nise_ray.ops.sign import make_sign_fn
    corpus = corpus_from_documents(sf_dir)
    signed = corpus.map_batches(make_sign_fn(cfg), batch_format="pyarrow",
                                zero_copy_batch=True, batch_size=cfg.batch_size)

    def project(b: pa.Table) -> pa.Table:
        doc_ids = np.array([int(p[3:]) for p in b.column("path").to_pylist()],
                           dtype=np.int64)
        sh = b.column("simhash").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "simhash_hex": pa.array([f"{int(x):016x}" for x in sh], pa.string()),
        })

    return signed.map_batches(project, batch_format="pyarrow")


def ngram_jaccard_pairs(sf_dir: str, tau: float = 0.7,
                        cfg: DedupConfig | None = None) -> pa.Table:
    """Verified near-dup pairs (doc_id_u, doc_id_v, est) between documents
    — the n-gram-Jaccard dedup surface (LSH candidates, signature-verified
    at threshold tau)."""
    cfg = cfg or DedupConfig(tau=tau)
    corpus = corpus_from_documents(sf_dir)
    res = dedup_pipeline(corpus, cfg)
    edges = collect_table(res.edges)
    assign = collect_table(res.assignments)
    key_to_doc = {}
    for dk, p in zip(assign.column("doc_key").to_pylist(),
                     assign.column("path").to_pylist()):
        key_to_doc[dk] = int(p[3:])
    us = [key_to_doc[u] for u in edges.column("u").to_pylist()]
    vs = [key_to_doc[v] for v in edges.column("v").to_pylist()]
    u = np.minimum(us, vs)
    v = np.maximum(us, vs)
    order = np.lexsort((v, u))
    return pa.table({
        "doc_id_u": pa.array(np.asarray(u)[order], pa.int64()),
        "doc_id_v": pa.array(np.asarray(v)[order], pa.int64()),
        "est": pa.array(edges.column("est").to_numpy(zero_copy_only=False)[order],
                        pa.float32()),
    })
