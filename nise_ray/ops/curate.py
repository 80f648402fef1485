"""COMPOSED corpus-curation pipeline — the second end-to-end flagship
composition (prepare_training_docs covers quality -> exact-dedup ->
chunk; this one covers the CCNet/Gopher ordering a web-scale curation
team runs before tokenization):

    Gopher quality rules  ->  exact dedup (keep min doc_id)
        ->  unigram-LM perplexity bucketing over the SURVIVORS
        ->  drop the tail bucket

Each stage is an already-oracled primitive (gopher_quality,
exact_dedup_docs, perplexity_buckets); this op verifies their
COMPOSITION end-to-end against one DuckDB query — including the subtle
part compositions get wrong: the LM is trained on the POST-dedup
survivor stream, not the raw corpus, so both engines must agree on
which documents feed the vocabulary.

Scale shape: the quality gate is a stateless RE2 map; the dedup
keep-list is the sha-prefix exchange with a broadcast-gated id filter
(distributed semi-join past the gate, same contract as
prepare_training_docs); the LM pass is ONE vocab-bounded token
exchange + a ray.put broadcast; the NTILE is one lang-keyed exchange.
Nothing corpus-sized touches the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

GOPHER_STOP_PAT = r"\b(the|and|of|to|in|is|that|it|for|was)\b"


def _gopher_pass_filter(b: pa.Table) -> pa.Table:
    """Keep rows passing the Gopher rule conjunction (same kernels and
    thresholds as textstats.gopher_quality — signals recomputed here so
    the filter streams without materializing the signal columns)."""
    import pyarrow.compute as pc

    text = b.column("text")
    n_chars = pc.utf8_length(text).cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)
    n_ws = pc.count_substring_regex(text, r"\s").cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)
    n_words = pc.count_substring_regex(text, r"\S+").cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)
    n_alpha = pc.count_substring_regex(text, r"[^\s]*[A-Za-z][^\s]*") \
        .cast(pa.int64()).to_numpy(zero_copy_only=False)
    n_hash = pc.count_substring(text, "#").cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)
    n_ell = pc.count_substring(text, "...").cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)
    n_stop = pc.count_substring_regex(pc.utf8_lower(text),
                                      GOPHER_STOP_PAT) \
        .cast(pa.int64()).to_numpy(zero_copy_only=False)
    denom = np.maximum(n_words, 1).astype(np.float64)
    mwl = np.where(n_words > 0, (n_chars - n_ws) / denom, 0.0)
    awr = np.where(n_words > 0, n_alpha / denom, 0.0)
    sr = np.where(n_words > 0, (n_hash + n_ell) / denom, 0.0)
    keep = ((n_words >= 50) & (n_words <= 100_000)
            & (mwl >= 3.0) & (mwl <= 10.0) & (sr <= 0.1)
            & (awr >= 0.8) & (n_stop >= 2))
    return b.take(pa.array(np.flatnonzero(keep)))


def curate_corpus(sf_dir: str, n_buckets: int = 3,
                  keep_buckets: int = 2, round_to: int = 4,
                  broadcast_max: int = 50_000_000,
                  run_dir: "str | None" = None,
                  resume: bool = False) -> "ray.data.Dataset":
    """Run the full curation chain; returns the KEPT set
    (doc_id, lang, logprob_mean, bucket) — quality-passing, exact-dup
    collapsed, perplexity bucket <= `keep_buckets` per language.

    `run_dir` enables per-stage CHECKPOINTS (the 100-TB curation jobs
    are the ones most likely to be pre-empted): survivors, the trained
    LM table, scores, and the final cut each land as partitioned
    parquet under stage=curate_*/ with _SUCCESS markers, and
    `resume=True` skips completed stages exactly like dedup_pipeline —
    including the stage-coupling subtlety (a resumed run re-reads the
    SAME post-dedup survivor set its LM was trained on, never a
    re-derived one). Resuming with different parameters fails loudly
    (ParamsConfig hash gate)."""
    from nise_ray.checkpoint import ParamsConfig, RunContext
    from nise_ray.ops.dedupx import _exact_group_batch, _sha_prep_batch
    from nise_ray.ops.dsir import perplexity_tiles_kernel
    from nise_ray.ops.groupapply import (default_concurrency,
                                         hash_group_apply)
    from nise_ray.ops.textstats import (_doc_token_counts,
                                        unigram_lnp_ref)
    from nise_ray.pipeline import _stage
    from nise_ray.util import collect_table

    ctx = None
    if run_dir is not None:
        ctx = RunContext(run_dir, ParamsConfig(
            op="curate_corpus", sf_dir=sf_dir, n_buckets=n_buckets,
            keep_buckets=keep_buckets, round_to=round_to,
            broadcast_max=broadcast_max), resume=resume)

    def filtered() -> "ray.data.Dataset":
        ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                   columns=["doc_id", "text", "lang"])
        return ds.map_batches(_gopher_pass_filter, batch_format="pyarrow",
                              zero_copy_batch=True)

    def build_kept() -> "ray.data.Dataset":
        # exact-dedup keep-list over the survivors (ids + digests only)
        prepped = filtered().select_columns(["doc_id", "text"]) \
            .map_batches(_sha_prep_batch, batch_format="pyarrow",
                         zero_copy_batch=True)
        groups = hash_group_apply(prepped, ["d0"],
                                  _exact_group_batch).materialize()
        if groups.count() <= broadcast_max:
            keep_t = collect_table(groups)
            keep_ids = np.sort(keep_t.column("rep_doc_id").to_numpy(
                zero_copy_only=False)) if keep_t.num_rows else \
                np.empty(0, np.int64)
            keep_ref = ray.put(keep_ids)

            def keep_filter(b: pa.Table) -> pa.Table:
                ids = b.column("doc_id").to_numpy(zero_copy_only=False)
                kept_ids = ray.get(keep_ref)
                if len(kept_ids) == 0:
                    return b.slice(0, 0)
                pos = np.clip(np.searchsorted(kept_ids, ids), 0,
                              len(kept_ids) - 1)
                return b.take(pa.array(
                    np.flatnonzero(kept_ids[pos] == ids)))

            return filtered().map_batches(keep_filter,
                                          batch_format="pyarrow",
                                          zero_copy_batch=True)
        from nise_ray.ops.relational import (_hash_shuffle_on,
                                             _join_partitions)
        keys = groups.map_batches(
            lambda b: pa.table({"doc_id": b.column("rep_doc_id")}),
            batch_format="pyarrow")
        docs = filtered()
        _hash_shuffle_on(docs, keys)
        from nise_ray.ops.groupapply import join_input
        keys = join_input(keys)  # sparse side: see groupapply
        return docs.join(keys, join_type="inner", on=("doc_id",),
                         num_partitions=_join_partitions())

    _KEPT_SCHEMA = pa.schema([("doc_id", pa.int64()),
                              ("text", pa.string()),
                              ("lang", pa.string())])
    kept, _ = _stage(ctx, "curate_kept", build_kept, _KEPT_SCHEMA)

    # LM trained on the survivor stream, broadcast once. Vocab-bounded,
    # so its checkpoint is one driver-written parquet table.
    lm_ref = _lm_stage(ctx, kept, unigram_lnp_ref)

    class Score:
        def __init__(self) -> None:
            self.toks, self.lnp = ray.get(lm_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            from nise_ray.ops.groupapply import segments
            n = b.num_rows
            mean_lp = np.zeros(n, dtype=np.float64)
            rows, codes, tf, vocab = _doc_token_counts(b)
            if len(rows):
                vpos = np.searchsorted(self.toks, vocab)
                lnp = self.lnp[vpos][codes]
                starts, _ = segments(rows)
                docs_i = rows[starts]
                n_tok = np.add.reduceat(tf, starts)
                sums = np.add.reduceat(tf.astype(np.float64) * lnp,
                                       starts)
                mean_lp[docs_i] = np.round(sums / n_tok, round_to)
            return pa.table({
                "doc_id": b.column("doc_id"),
                "lang": b.column("lang"),
                "logprob_mean": pa.array(mean_lp, pa.float64()),
            })

    def build_scored():
        return kept.map_batches(Score, batch_format="pyarrow",
                                zero_copy_batch=True,
                                concurrency=default_concurrency())

    # downstream of the (legitimately materialized, double-consumed)
    # survivor set, scored and the final cut are single-consumed: the
    # ctx=None path streams them instead of paying _stage's barrier
    _SCORED_SCHEMA = pa.schema([("doc_id", pa.int64()),
                                ("lang", pa.string()),
                                ("logprob_mean", pa.float64())])
    scored = build_scored() if ctx is None else         _stage(ctx, "curate_scored", build_scored, _SCORED_SCHEMA)[0]

    tiles = perplexity_tiles_kernel(n_buckets)

    def tiles_and_trim(batch: pa.Table) -> pa.Table:
        out = tiles(batch)
        if out.num_rows == 0:
            return out
        bk = out.column("bucket").to_numpy(zero_copy_only=False)
        return out.take(pa.array(np.flatnonzero(bk <= keep_buckets)))

    def build_out():
        return hash_group_apply(scored, ["lang"], tiles_and_trim, 0,
                                sort=False)

    if ctx is None:
        return build_out()
    _OUT_SCHEMA = pa.schema([("doc_id", pa.int64()),
                             ("lang", pa.string()),
                             ("logprob_mean", pa.float64()),
                             ("bucket", pa.int64())])
    return _stage(ctx, "curate_out", build_out, _OUT_SCHEMA)[0]


def _lm_stage(ctx, kept: "ray.data.Dataset", build_ref):
    """Checkpoint wrapper for the vocab-bounded unigram-LM table: fresh
    runs train on the survivor stream then persist (token, lnp) parquet;
    resumed runs rebuild the broadcast ref from the checkpoint without
    touching the corpus."""
    import os

    import pyarrow.parquet as pq

    if ctx is not None and ctx.resume and ctx.is_complete("curate_lm"):
        t = pq.read_table(os.path.join(ctx.stage_dir("curate_lm"),
                                       "lm.parquet"))
        toks = np.asarray(t.column("token").to_pylist(), dtype=object)
        lnp = t.column("lnp").to_numpy(zero_copy_only=False)
        return ray.put((toks, lnp))
    ref = build_ref(kept.select_columns(["doc_id", "text"]))
    if ctx is not None:
        toks, lnp = ray.get(ref)
        d = ctx.stage_dir("curate_lm")
        os.makedirs(d, exist_ok=True)
        pq.write_table(pa.table({
            "token": pa.array(toks.tolist(), pa.string()),
            "lnp": pa.array(lnp, pa.float64())}),
            os.path.join(d, "lm.parquet"))
        ctx.mark_complete("curate_lm", n_tokens=len(toks))
    return ref
