"""Data-selection scoring for LLM training pipelines: DSIR-style
importance weights and CCNet-style perplexity bucketing.

- ``dsir_weights`` — Data Selection via Importance Resampling (Xie et
  al. 2023, arXiv:2302.03169): score every document by how much more
  likely its tokens are under a TARGET distribution (here: the corpus
  slice of one language, standing in for "high-quality domain") than
  under the RAW corpus distribution. The per-doc log importance ratio
  sum_t [ln p_target(t) - ln p_raw(t)] / n_tokens, with add-one
  smoothing over the shared global vocabulary, is the selection signal
  DSIR resamples by. (DSIR proper uses hashed n-gram features; unigram
  features keep the oracle exact and the shape identical.)

- ``perplexity_buckets`` — CCNet's head/middle/tail split (Wenzek et
  al. 2020): per language, documents ranked by unigram-LM mean log
  probability are dealt into 3 NTILE buckets (1 = head = most probable
  / lowest perplexity). Downstream pipelines keep head+middle or
  sample by bucket.

Scale contracts (both are the unigram_logprob shape):

- ONE vocabulary-bounded token exchange builds the LM table(s); the
  table rides ray.put once (never re-shipped per batch); the scoring
  pass is a stateless/actor map with a searchsorted gather + one
  reduceat per block — no corpus-sized driver state, no second
  exchange for dsir_weights. perplexity_buckets adds exactly one
  lang-keyed exchange for the NTILE (bucket boundaries need the whole
  language's score vector — per-group state, not driver state).
- Both round the per-doc mean to `round_to` (engine reduceat vs SQL
  instance-sum differ in FP summation order; the values are FP-noisy
  so half-way ties are not a cross-engine hazard — same contract as
  unigram_logprob).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from nise_ray.ops.textstats import (_doc_token_counts, _doc_token_stream,
                                    unigram_lnp_ref)

LOGRATIO_SCHEMA = {"doc_id": pa.int64(), "n_tokens": pa.int64(),
                   "logratio_mean": pa.float64()}


def dsir_weights(sf_dir: str, target_lang: str = "en",
                 round_to: int = 4) -> "ray.data.Dataset":
    """Per-document DSIR log importance ratio against the target slice
    ``lang == target_lang``: (doc_id, n_tokens, logratio_mean) where
    logratio_mean = sum_t tf_t * [ln((ct_t+1)/(T_t+V)) -
    ln((c_t+1)/(T+V))] / n_tokens over the global vocabulary (c/ct =
    raw/target token counts, T/T_t their totals, V the vocab size).
    Positive = looks more like the target than the corpus average.
    Zero-token docs emit (0, 0.0)."""
    from nise_ray.ops.groupapply import (default_concurrency,
                                         hash_group_apply, segments)
    from nise_ray.util import collect_table

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang"])

    def count_partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        row, codes, vocab = _doc_token_stream(b)
        if len(codes) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "nt": pa.array([], pa.int64())})
        is_t = pc.equal(b.column("lang"), target_lang) \
            .to_numpy(zero_copy_only=False)
        n_all = np.bincount(codes, minlength=len(vocab))
        n_tgt = np.bincount(codes[is_t[row]], minlength=len(vocab))
        keep = n_all > 0
        return pa.table({
            "token": pa.array(vocab[keep], pa.string()),
            "n": pa.array(n_all[keep].astype(np.int64), pa.int64()),
            "nt": pa.array(n_tgt[keep].astype(np.int64), pa.int64())})

    def count_merge(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        tok = batch.column("token").combine_chunks().dictionary_encode()
        codes = tok.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        nt = batch.column("nt").to_numpy(zero_copy_only=False)
        order = np.argsort(codes, kind="stable")
        starts, _ = segments(codes[order])
        return pa.table({
            "token": tok.dictionary.take(pa.array(codes[order][starts]))
            .cast(pa.string()),
            "n": pa.array(np.add.reduceat(n[order], starts), pa.int64()),
            "nt": pa.array(np.add.reduceat(nt[order], starts), pa.int64())})

    freq_t = collect_table(hash_group_apply(
        ds.map_batches(count_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["token"], count_merge, 0, sort=False))
    toks = np.asarray(freq_t.column("token").to_pylist(), dtype=object)
    c = freq_t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
    ct = freq_t.column("nt").to_numpy(zero_copy_only=False).astype(np.float64)
    v = float(len(toks))
    den_raw = float(c.sum()) + v
    den_tgt = float(ct.sum()) + v
    order = np.argsort(toks)
    # per-token diff computed ONCE with the same IEEE op order as the
    # SQL oracle: ln((ct+1)/den_t) - ln((c+1)/den_r)
    diff = (np.log((ct[order] + 1.0) / den_tgt)
            - np.log((c[order] + 1.0) / den_raw)) if len(toks) else c
    lm_ref = ray.put((toks[order], diff))

    class Score:
        def __init__(self) -> None:
            self.toks, self.diff = ray.get(lm_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            n = b.num_rows
            n_tok = np.zeros(n, dtype=np.int64)
            mean_lr = np.zeros(n, dtype=np.float64)
            rows, codes, tf, vocab = _doc_token_counts(b)
            if len(rows):
                vpos = np.searchsorted(self.toks, vocab)
                d = self.diff[vpos][codes]
                starts, _ = segments(rows)
                docs = rows[starts]
                n_tok[docs] = np.add.reduceat(tf, starts)
                sums = np.add.reduceat(tf.astype(np.float64) * d, starts)
                mean_lr[docs] = np.round(sums / n_tok[docs], round_to)
            return pa.table({
                "doc_id": b.column("doc_id"),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "logratio_mean": pa.array(mean_lr, pa.float64()),
            })

    return ds.select_columns(["doc_id", "text"]) \
        .map_batches(Score, batch_format="pyarrow", zero_copy_batch=True,
                     concurrency=default_concurrency())


def perplexity_buckets(sf_dir: str, n_buckets: int = 3,
                       round_to: int = 4) -> "ray.data.Dataset":
    """CCNet head/middle/tail: (doc_id, lang, logprob_mean, bucket)
    with bucket = NTILE(n_buckets) per lang over documents ordered by
    (logprob_mean DESC, doc_id) — bucket 1 = head (least perplexed
    under the corpus unigram LM). logprob_mean matches unigram_logprob
    exactly (same kernel, same rounding)."""
    from nise_ray.ops.groupapply import (default_concurrency,
                                         hash_group_apply, segments)

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang"])
    lm_ref = unigram_lnp_ref(ds.select_columns(["doc_id", "text"]))

    class Score:
        def __init__(self) -> None:
            self.toks, self.lnp = ray.get(lm_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            n = b.num_rows
            mean_lp = np.zeros(n, dtype=np.float64)
            rows, codes, tf, vocab = _doc_token_counts(b)
            if len(rows):
                vpos = np.searchsorted(self.toks, vocab)
                lnp = self.lnp[vpos][codes]
                starts, _ = segments(rows)
                docs = rows[starts]
                n_tok = np.add.reduceat(tf, starts)
                sums = np.add.reduceat(tf.astype(np.float64) * lnp, starts)
                mean_lp[docs] = np.round(sums / n_tok, round_to)
            return pa.table({
                "doc_id": b.column("doc_id"),
                "lang": b.column("lang"),
                "logprob_mean": pa.array(mean_lp, pa.float64()),
            })

    scored = ds.map_batches(Score, batch_format="pyarrow",
                            zero_copy_batch=True,
                            concurrency=default_concurrency())

    return hash_group_apply(scored, ["lang"],
                            perplexity_tiles_kernel(n_buckets), 0,
                            sort=False)


def perplexity_tiles_kernel(n_buckets: int):
    """Per-block NTILE kernel over complete lang groups of a
    (doc_id, lang, logprob_mean) table: ANSI NTILE(n_buckets) ordered
    by (logprob_mean DESC, doc_id) within each lang — shared by
    perplexity_buckets and the composed curate_corpus pipeline."""
    from nise_ray.ops.groupapply import segments

    def tiles(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "lang": pa.array([], pa.string()),
                             "logprob_mean": pa.array([], pa.float64()),
                             "bucket": pa.array([], pa.int64())})
        lang = batch.column("lang")
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        code = lang.dictionary_encode().indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        lp = batch.column("logprob_mean").to_numpy(zero_copy_only=False)
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, -lp, code))   # lp DESC, doc ASC per lang
        code, lp, doc = code[order], lp[order], doc[order]
        starts, counts = segments(code)
        m = np.repeat(counts, counts)
        r = np.arange(len(order), dtype=np.int64) - np.repeat(starts, counts)
        q, rem = m // n_buckets, m % n_buckets
        boundary = rem * (q + 1)
        tile = np.where(r < boundary, r // np.maximum(q + 1, 1) + 1,
                        np.where(q > 0,
                                 (r - boundary) // np.maximum(q, 1) + rem + 1,
                                 1))
        return pa.table({
            "doc_id": pa.array(doc, pa.int64()),
            "lang": lang.take(pa.array(order, pa.int64())),
            "logprob_mean": pa.array(lp, pa.float64()),
            "bucket": pa.array(tile, pa.int64())})

    return tiles
