"""Dedup operators specialised for the `documents` table — the
training-data-pipeline surface (exact / MinHash-LSH / SimHash /
n-gram-Jaccard dedup), re-using the corpus engine via the
documents→corpus adapter.

Scale discipline (round-2 rewrite): no `groupby(text)` (full-text shuffle
keys), no driver-side collection of corpus-sized tables, no per-row path
parsing. `doc_id` rides through the engine as a passthrough column
(io.corpus_from_documents / ops.sign), exact dedup shuffles on the 64-bit
sha prefix with full-digest verification inside segments, and doc_key→
doc_id mapping is a scale-gated broadcast lookup with a distributed-join
fallback (same pattern as ops.components.attach_labels).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray

from nise_ray.config import DedupConfig
from nise_ray.hashing import U64
from nise_ray.io import corpus_from_documents
from nise_ray.pipeline import dedup_pipeline


def _sha_prep_batch(b: pa.Table) -> pa.Table:
    """(doc_id, text) -> (doc_id, d0..d3): the full sha256 digest split
    into four uint64 words — segment comparison downstream is then pure
    numpy (full 256-bit equality, no string columns in the shuffle)."""
    texts = b.column("text").to_pylist()
    n = len(texts)
    words = np.empty((n, 4), dtype=U64)
    for i, t in enumerate(texts):
        words[i] = np.frombuffer(hashlib.sha256(t.encode()).digest(), dtype="<u8")
    return pa.table({
        "doc_id": b.column("doc_id"),
        "d0": pa.array(words[:, 0], pa.uint64()),
        "d1": pa.array(words[:, 1], pa.uint64()),
        "d2": pa.array(words[:, 2], pa.uint64()),
        "d3": pa.array(words[:, 3], pa.uint64()),
    })


def _exact_group_batch(batch: pa.Table) -> pa.Table:
    """Per hash-partition block (complete d0 groups co-located): order by
    the FULL digest, find equal-digest runs, emit (rep_doc_id = min doc_id,
    n_dups = run length) — one vectorized pass, zero per-group Python."""
    if batch.num_rows == 0:
        return pa.table({"rep_doc_id": pa.array([], pa.int64()),
                         "n_dups": pa.array([], pa.int64())})
    d = [batch.column(c).to_numpy(zero_copy_only=False).astype(U64)
         for c in ("d0", "d1", "d2", "d3")]
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((d[3], d[2], d[1], d[0]))
    sd = [x[order] for x in d]
    n = len(order)
    change = np.empty(n, dtype=bool)
    change[0] = True
    np.logical_or.reduce([sd_i[1:] != sd_i[:-1] for sd_i in sd], out=change[1:])
    starts = np.flatnonzero(change)
    counts = np.diff(np.append(starts, n))
    reps = np.minimum.reduceat(ids[order], starts)
    return pa.table({
        "rep_doc_id": pa.array(reps, pa.int64()),
        "n_dups": pa.array(counts, pa.int64()),
    })


def exact_dedup_documents(sf_dir: str) -> "ray.data.Dataset":
    """Exact dedup groups: (rep_doc_id, n_dups) — one row per distinct
    text, representative = min doc_id. Hash-partition on the 64-bit sha
    prefix (cheap uint64 shuffle key — never the text itself), full-digest
    equality verified vectorized inside each segment."""
    from nise_ray.ops.groupapply import hash_group_apply
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    prepped = ds.map_batches(_sha_prep_batch, batch_format="pyarrow",
                             zero_copy_batch=True)
    return hash_group_apply(prepped, ["d0"], _exact_group_batch)


def minhash_dedup_documents(sf_dir: str, cfg: DedupConfig | None = None) -> "ray.data.Dataset":
    """Near-dup clustering of documents: (doc_id, cluster_size) via the
    full corpus engine over the adapted documents table. cluster ids are
    internal doc_keys, so the stable output is per-doc cluster size —
    computed with ONE hash exchange on cluster_id (nothing corpus-sized
    reaches the driver)."""
    from nise_ray.ops.groupapply import hash_group_apply, segments
    cfg = cfg or DedupConfig()
    corpus = corpus_from_documents(sf_dir)
    res = dedup_pipeline(corpus, cfg)
    assigns = res.assignments.select_columns(["doc_id", "cluster_id"])

    def size_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "cluster_size": pa.array([], pa.int64())})
        cl = batch.column("cluster_id").to_numpy(zero_copy_only=False)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        starts, counts = segments(cl)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "cluster_size": pa.array(np.repeat(counts, counts), pa.int64()),
        })

    # no output sort: the ROW SET is deterministic (one row per doc) and
    # a corpus-sized global sort would be a pure-cosmetics all-to-all at
    # 10^12 rows; consumers sort slices as needed
    return hash_group_apply(assigns, ["cluster_id"], size_batch)


def simhash_documents(sf_dir: str, cfg: DedupConfig | None = None) -> "ray.data.Dataset":
    """(doc_id, simhash_hex) fingerprints for every document — doc_id is
    the passthrough column, projected vectorized from the signed table."""
    cfg = cfg or DedupConfig()
    from nise_ray.ops.sign import make_sign_fn
    corpus = corpus_from_documents(sf_dir)
    signed = corpus.map_batches(make_sign_fn(cfg), batch_format="pyarrow",
                                zero_copy_batch=True, batch_size=cfg.batch_size)

    def project(b: pa.Table) -> pa.Table:
        sh = b.column("simhash").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "simhash_hex": pa.array([f"{int(x):016x}" for x in sh], pa.string()),
        })

    return signed.map_batches(project, batch_format="pyarrow")


def _doc_id_mapper(assigns: "ray.data.Dataset", cfg: DedupConfig):
    """Broadcast (doc_key -> doc_id) lookup built ONCE via ray.put (scale-
    gated on cfg.broadcast_label_max, mirroring attach_labels); returns a
    map_batches class that maps u/v columns vectorized."""
    from nise_ray.util import collect_table
    t = collect_table(assigns.select_columns(["doc_key", "doc_id"]))
    keys = t.column("doc_key").to_numpy(zero_copy_only=False).astype(U64)
    vals = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(keys)
    ref = ray.put((keys[order], vals[order]))

    class PairMapper:
        def __init__(self) -> None:
            self.keys, self.vals = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"doc_id_u": pa.array([], pa.int64()),
                                 "doc_id_v": pa.array([], pa.int64()),
                                 "est": pa.array([], pa.float32())})
            u = b.column("u").to_numpy(zero_copy_only=False).astype(U64)
            v = b.column("v").to_numpy(zero_copy_only=False).astype(U64)
            iu = np.clip(np.searchsorted(self.keys, u), 0, len(self.keys) - 1)
            iv = np.clip(np.searchsorted(self.keys, v), 0, len(self.keys) - 1)
            # every edge endpoint MUST exist in the assignments table; a
            # silent nearest-neighbor mapping would corrupt pair ids
            if not ((self.keys[iu] == u).all() and (self.keys[iv] == v).all()):
                missing = int((self.keys[iu] != u).sum() + (self.keys[iv] != v).sum())
                raise AssertionError(
                    f"{missing} edge endpoints missing from doc_key->doc_id map")
            du = self.vals[iu]
            dv = self.vals[iv]
            return pa.table({
                "doc_id_u": pa.array(np.minimum(du, dv), pa.int64()),
                "doc_id_v": pa.array(np.maximum(du, dv), pa.int64()),
                "est": b.column("est"),
            })

    return PairMapper


def ngram_jaccard_pairs(sf_dir: str, tau: float = 0.7,
                        cfg: DedupConfig | None = None) -> "ray.data.Dataset":
    """Verified near-dup pairs (doc_id_u, doc_id_v, est) between documents
    — the n-gram-Jaccard dedup surface (LSH candidates, signature-verified
    at threshold tau). doc_key -> doc_id mapping is a broadcast lookup
    under the scale gate and a two-sided distributed join beyond it."""
    from nise_ray.ops.groupapply import default_concurrency
    cfg = cfg or DedupConfig(tau=tau)
    corpus = corpus_from_documents(sf_dir)
    res = dedup_pipeline(corpus, cfg)
    edges = res.edges.select_columns(["u", "v", "est"])
    assigns = res.assignments

    n_docs = res.stats.get("n_docs") or assigns.count()
    if n_docs <= cfg.broadcast_label_max:
        mapper = _doc_id_mapper(assigns, cfg)
        mapped = edges.map_batches(mapper, batch_format="pyarrow",
                                   zero_copy_batch=True,
                                   concurrency=default_concurrency())
    else:
        # distributed fallback: two hash joins attach each endpoint's
        # doc_id (keymaps pre-renamed so the output column names are
        # deterministic, no suffix guessing)
        from nise_ray.ops.groupapply import default_partitions
        np_ = default_partitions(0)

        def ren(b: pa.Table, key: str, val: str) -> "pa.Table":
            return b.rename_columns([key, val])

        keymap = assigns.select_columns(["doc_key", "doc_id"])
        km_u = keymap.map_batches(lambda b: ren(b, "u", "du"),
                                  batch_format="pyarrow")
        km_v = keymap.map_batches(lambda b: ren(b, "v", "dv"),
                                  batch_format="pyarrow")
        j1 = edges.join(km_u, join_type="inner", num_partitions=np_, on=("u",))
        j2 = j1.join(km_v, join_type="inner", num_partitions=np_, on=("v",))

        def finish(b: pa.Table) -> pa.Table:
            du = b.column("du").to_numpy(zero_copy_only=False).astype(np.int64)
            dv = b.column("dv").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({
                "doc_id_u": pa.array(np.minimum(du, dv), pa.int64()),
                "doc_id_v": pa.array(np.maximum(du, dv), pa.int64()),
                "est": b.column("est"),
            })

        mapped = j2.map_batches(finish, batch_format="pyarrow")
    # no output sort: the pair SET is deterministic; a global sort on the
    # output is pure cosmetics (consumers sort slices as needed)
    return mapped


def dedup_rate_by_source(sf_dir: str) -> "ray.data.Dataset":
    """Per-SOURCE exact-duplicate rate: (source, n_docs, n_distinct,
    dup_rate) — the dedup health readout a corpus-intake pipeline
    publishes per provider (which crawl/source ships the most exact
    copies). dup_rate = 1 - n_distinct/n_docs is one double division of
    exact int64 counts, so the oracle comparison is bit-exact.

    Plan: each block collapses to distinct (source, sha256) pairs plus
    its row count per source (combiner — the exchange carries at most
    |distinct pairs| rows, never corpus rows; full 32-byte digests ride
    as fixed-size binary, hex only in SQL); ONE hash exchange on source
    finishes distinct counts per segment. Same shape as the engine's
    exact-dup grouper, reread as an aggregate."""
    import hashlib

    import pyarrow.compute as pc

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "text"])
    from nise_ray.ops.groupapply import hash_group_apply, segments

    _EMPTY = pa.table({"source": pa.array([], pa.string()),
                       "sha": pa.array([], pa.binary(32)),
                       "cnt": pa.array([], pa.int64())})

    def pair_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _EMPTY
        texts = b.column("text").to_pylist()
        shas = np.array([hashlib.sha256(t.encode()).digest()
                         for t in texts], dtype=object)
        src = b.column("source").combine_chunks().dictionary_encode()
        codes = src.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((shas, codes))
        sc, ss = codes[order], shas[order]
        change = np.empty(len(order), dtype=bool)
        change[0] = True
        change[1:] = (sc[1:] != sc[:-1]) | (ss[1:] != ss[:-1])
        starts = np.flatnonzero(change)
        cnt = np.diff(np.append(starts, len(order)))
        return pa.table({
            "source": src.dictionary.take(pa.array(sc[starts]))
            .cast(pa.string()),
            "sha": pa.array(list(ss[starts]), pa.binary(32)),
            "cnt": pa.array(cnt, pa.int64())})

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64()),
                             "n_distinct": pa.array([], pa.int64()),
                             "dup_rate": pa.array([], pa.float64())})
        src = batch.column("source").combine_chunks().dictionary_encode()
        codes = src.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        shas = np.array(batch.column("sha").to_pylist(), dtype=object)
        cnt = batch.column("cnt").to_numpy(zero_copy_only=False)
        order = np.lexsort((shas, codes))
        sc, ss, scnt = codes[order], shas[order], cnt[order]
        pair_first = np.empty(len(order), dtype=bool)
        pair_first[0] = True
        pair_first[1:] = (sc[1:] != sc[:-1]) | (ss[1:] != ss[:-1])
        starts, _ = segments(sc)
        n_docs = np.add.reduceat(scnt, starts)
        n_distinct = np.add.reduceat(pair_first.astype(np.int64), starts)
        dup = 1.0 - n_distinct.astype(np.float64) / n_docs
        return pa.table({
            "source": src.dictionary.take(pa.array(sc[starts]))
            .cast(pa.string()),
            "n_docs": pa.array(n_docs, pa.int64()),
            "n_distinct": pa.array(n_distinct, pa.int64()),
            "dup_rate": pa.array(dup, pa.float64())})

    pre = ds.map_batches(pair_partial, batch_format="pyarrow",
                         zero_copy_batch=True)
    return hash_group_apply(pre, ["source"], finish, 0, sort=False)
