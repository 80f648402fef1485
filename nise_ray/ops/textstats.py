"""Text-analysis operators for training-data pipelines over the
`documents` table (doc_id, text, lang, source, n_chars).

All are stateless vectorized ``map_batches`` stages; the semantics are
pinned to be exactly reproducible in ANSI SQL (DuckDB oracle) where
possible — see __ray_entry__.oracle_sql.
"""

from __future__ import annotations

import hashlib
import logging
import re

import numpy as np
import pyarrow as pa

import ray

_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+")
_WORD_RE = re.compile(r"\S+")
_ALPHA_RE = re.compile(r"[A-Za-z]")

# tiny stopword lists for the n-gram/stopword language heuristic
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "was"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "zu"},
    "fr": {"le", "la", "et", "les", "des", "est", "pas", "une", "que", "pour"},
    "es": {"el", "la", "de", "que", "los", "una", "es", "por", "con", "para"},
}


def token_stats_batch(b: pa.Table) -> pa.Table:
    """Token/word counts via pyarrow.compute regex kernels — fully
    vectorized (RE2 inside Arrow), no per-row Python."""
    import pyarrow.compute as pc
    text = b.column("text")
    n_tokens = pc.count_substring_regex(text, r"[A-Za-z0-9_]+")
    n_words = pc.count_substring_regex(text, r"\S+")
    return pa.table({
        "doc_id": b.column("doc_id"),
        "n_tokens": n_tokens.cast(pa.int64()),
        "n_words": n_words.cast(pa.int64()),
    })


def quality_batch(b: pa.Table) -> pa.Table:
    """Arrow-kernel quality signals (round-4 rewrite of the per-row
    Python loop): codepoint length, newline count, alpha ratio — all
    whole-batch pyarrow.compute calls, no Python rows."""
    import pyarrow.compute as pc
    text = b.column("text")
    n_chars = pc.utf8_length(text).cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)
    n_lines = pc.count_substring(text, "\n").cast(pa.int64()) \
        .to_numpy(zero_copy_only=False) + 1
    n_alpha = pc.count_substring_regex(text, "[A-Za-z]").cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)
    with np.errstate(invalid="ignore"):
        # exact integer-ratio double (bit-identical to SQL n_alpha/len)
        alpha_ratio = np.where(n_chars > 0,
                               n_alpha / n_chars.astype(np.float64), 0.0)
    return pa.table({
        "doc_id": b.column("doc_id"),
        "n_chars_c": pa.array(n_chars, pa.int64()),
        "n_lines": pa.array(n_lines, pa.int64()),
        "alpha_ratio": pa.array(alpha_ratio, pa.float64()),
    })


def fingerprint_batch(b: pa.Table) -> pa.Table:
    """Document fingerprint: sha256 hex of the raw text (exact identity)."""
    texts = b.column("text").to_pylist()
    return pa.table({
        "doc_id": b.column("doc_id"),
        "fingerprint": pa.array(
            [hashlib.sha256(t.encode()).hexdigest() for t in texts], pa.string()),
    })


class LanguageId:
    """Stopword language heuristic — round-4 rewrite: the batch is
    tokenized ONCE with the Arrow split kernel ([a-zA-Z']+ tokens on the
    lowercased 4000-codepoint prefix), the batch-local vocabulary is
    tested against each marker set (|V|-sized np.isin, not corpus-sized),
    and per-row counts come from one bincount per language. EXACT-token
    matching — identical semantics to the original per-row Python loop
    ("it's" is one token and matches nothing; \\b-style regex counting
    would differ around digits/underscores/apostrophes) with zero Python
    rows. Marker sets are built once per actor (actor-pool stage)."""

    def __init__(self) -> None:
        self.markers = [(lang, np.asarray(sorted(ws), dtype=object))
                        for lang, ws in sorted(_LANG_MARKERS.items())]

    def __call__(self, b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        head = pc.utf8_lower(pc.utf8_slice_codeunits(
            b.column("text").combine_chunks(), start=0, stop=4000))
        lists = pc.split_pattern_regex(head, pattern=r"[^a-zA-Z']+")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = lists.flatten()
        offs = np.asarray(lists.offsets, dtype=np.int64) - lists.offset
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        row = np.repeat(np.arange(b.num_rows, dtype=np.int64),
                        np.diff(offs))
        empty = np.flatnonzero(vocab == "")
        if len(empty):
            keep = codes != empty[0]
            codes, row = codes[keep], row[keep]
        n = b.num_rows
        n_words = np.bincount(row, minlength=n)
        counts = np.zeros((len(self.markers), n), dtype=np.int64)
        for j, (_, ws) in enumerate(self.markers):
            hit = np.isin(vocab, ws)[codes]       # exact-token membership
            if hit.any():
                counts[j] = np.bincount(row[hit], minlength=n)
        best = np.argmax(counts, axis=0)   # first max = sorted-lang order
        top = counts[best, np.arange(n)]
        langs = np.asarray([lang for lang, _ in self.markers], dtype=object)
        preds = np.where((top > 0) & (n_words > 0), langs[best], "unknown")
        with np.errstate(invalid="ignore"):
            scores = np.where(n_words > 0,
                              np.round(top / np.maximum(n_words, 1), 4),
                              0.0)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "lang_pred": pa.array(preds, pa.string()),
            "lang_score": pa.array(scores, pa.float64()),
        })


def token_stats(sf_dir: str) -> "ray.data.Dataset":
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ds.map_batches(token_stats_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


def quality_scores(sf_dir: str) -> "ray.data.Dataset":
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ds.map_batches(quality_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


def fingerprints(sf_dir: str) -> "ray.data.Dataset":
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


def language_id(sf_dir: str) -> "ray.data.Dataset":
    from nise_ray.ops.groupapply import default_concurrency
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ds.map_batches(LanguageId, batch_format="pyarrow",
                          zero_copy_batch=True,
                          concurrency=default_concurrency())


def _grouped_token_sums(batch: pa.Table, val_col: str = "n"):
    """Per-partition merge kernel shared by every token-keyed combiner
    (top_tokens, top_tokens_sketch, top_doc_terms df pass,
    unigram_logprob): dictionary-encode the token, one stable argsort +
    reduceat over codes. Returns (tokens pa.Array, sums np.ndarray) —
    callers add their own trimming (top-k, sentinel handling)."""
    from nise_ray.ops.groupapply import segments
    tok = batch.column("token").combine_chunks().dictionary_encode()
    codes = tok.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = batch.column(val_col).to_numpy(zero_copy_only=False)
    order = np.argsort(codes, kind="stable")
    starts, _ = segments(codes[order])
    toks = tok.dictionary.take(pa.array(codes[order][starts]))
    return toks, np.add.reduceat(vals[order], starts)


def _doc_token_counts(b: pa.Table):
    """(row-local doc index, token code, count) + the batch vocab — the
    uniqued variant of _doc_token_stream (one np.unique over
    row*|V|+code combos). Used by top_doc_terms, repetition_stats and
    bm25; composes on the shared stream kernel so token semantics live
    in exactly one place."""
    row, codes, vocab = _doc_token_stream(b)
    if len(codes) == 0:
        return (np.empty(0, np.int64),) * 3 + (vocab,)
    combo = row * np.int64(len(vocab)) + codes
    uniq, counts = np.unique(combo, return_counts=True)
    return (uniq // len(vocab), uniq % len(vocab),
            counts.astype(np.int64), vocab)


def repetition_batch(b: pa.Table) -> pa.Table:
    """Gopher-style repetition quality signals per document (Rae et al.
    2021, arXiv:2112.11446 §A1.1 — repetitious documents are low
    quality): n_tokens, n_uniq_tokens, dup_token_frac = 1 - uniq/total,
    top_token_share = max token count / total. Fully vectorized: the
    shared tokenize kernel plus one reduceat sweep; zero-token docs emit
    0/0/0.0/0.0."""
    from nise_ray.ops.groupapply import segments
    n = b.num_rows
    n_tok = np.zeros(n, dtype=np.int64)
    n_uniq = np.zeros(n, dtype=np.int64)
    top = np.zeros(n, dtype=np.int64)
    rows, _, counts, _ = _doc_token_counts(b)
    if len(rows):
        # rows are nondecreasing (np.unique on row-major combos)
        starts, runs = segments(rows)
        docs = rows[starts]
        n_tok[docs] = np.add.reduceat(counts, starts)
        n_uniq[docs] = runs
        top[docs] = np.maximum.reduceat(counts, starts)
    with np.errstate(invalid="ignore"):
        tot = n_tok.astype(np.float64)
        # UNROUNDED exact-integer-ratio doubles: bit-identical to the SQL
        # oracle's 1 - u/t (rounding would diverge on half-way ties —
        # numpy rounds half-even, DuckDB half-away; 19/32 hits one)
        dup_frac = np.where(n_tok > 0, 1.0 - n_uniq / tot, 0.0)
        top_share = np.where(n_tok > 0, top / tot, 0.0)
    return pa.table({
        "doc_id": b.column("doc_id"),
        "n_tokens": pa.array(n_tok, pa.int64()),
        "n_uniq_tokens": pa.array(n_uniq, pa.int64()),
        "dup_token_frac": pa.array(dup_frac, pa.float64()),
        "top_token_share": pa.array(top_share, pa.float64()),
    })


def repetition_stats(sf_dir: str) -> "ray.data.Dataset":
    """Per-document token-repetition quality stats — see
    repetition_batch. Stateless single-pass map, no shuffle."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ds.map_batches(repetition_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


def top_doc_terms(sf_dir: str, k: int = 3) -> "ray.data.Dataset":
    """Per-document TOP TERMS — the TF-IDF-shaped keyword extraction a
    training-data pipeline runs for topical tagging: for every document,
    the k tokens ranked by (tf DESC, global df ASC, token ASC), emitted
    as (doc_id, token, tf, df, rank). Integer-exact contract (the
    float idf = ln(N/df) is monotone-decreasing in df, so ranking by df
    ascending IS the tf-idf ranking without the float hazard).

    Two passes, both combiner-shaped:
      1. global document frequency per token string — per-batch distinct
         (doc, token) partials, one vocab-sized hash exchange, broadcast
         once via ray.put (vocab-bounded, never corpus-bounded);
      2. one stateless map over the corpus: Arrow regex split +
         dictionary-encoded per-(doc, token) counts, vectorized df
         lookup (searchsorted on the sorted vocab), one batch-wide
         lexsort for the per-doc rank — no per-row Python.
    """
    import pyarrow.compute as pc

    from nise_ray.ops.groupapply import (default_concurrency,
                                         hash_group_apply, segments)
    from nise_ray.util import collect_table

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    # ---- pass 1: global df per token string -----------------------------
    def df_partial(b: pa.Table) -> pa.Table:
        rows, codes, _, vocab = _doc_token_counts(b)
        if len(codes) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        uc, n = np.unique(codes, return_counts=True)
        return pa.table({"token": pa.array(vocab[uc], pa.string()),
                         "df": pa.array(n, pa.int64())})

    def df_merge(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        toks, sums = _grouped_token_sums(batch, "df")
        return pa.table({"token": toks.cast(pa.string()),
                         "df": pa.array(sums, pa.int64())})

    df_t = collect_table(hash_group_apply(
        ds.map_batches(df_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["token"], df_merge, 0, sort=False))
    toks = np.asarray(df_t.column("token").to_pylist(), dtype=object)
    order = np.argsort(toks)
    df_ref = ray.put((toks[order],
                      df_t.column("df").to_numpy(
                          zero_copy_only=False)[order]))

    # ---- pass 2: per-doc ranking with the broadcast df map --------------
    class RankTerms:
        def __init__(self) -> None:
            self.toks, self.dfs = ray.get(df_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            empty = pa.table({"doc_id": pa.array([], pa.int64()),
                              "token": pa.array([], pa.string()),
                              "tf": pa.array([], pa.int64()),
                              "df": pa.array([], pa.int64()),
                              "rank": pa.array([], pa.int64())})
            rows, codes, tf, vocab = _doc_token_counts(b)
            if len(codes) == 0:
                return empty
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            vpos = np.searchsorted(self.toks, vocab)
            dfv_vocab = self.dfs[vpos]  # every batch token is global
            # integer token order for the lexsort tie-break: rank of the
            # code's string in the batch vocab's lexicographic order
            vorder = np.argsort(vocab)
            vrank = np.empty(len(vocab), dtype=np.int64)
            vrank[vorder] = np.arange(len(vocab), dtype=np.int64)
            dfv = dfv_vocab[codes]
            order = np.lexsort((vrank[codes], dfv, -tf, rows))
            r = rows[order]
            starts, counts = segments(r)
            rank = (np.arange(len(order), dtype=np.int64)
                    - np.repeat(starts, counts)) + 1
            keep = rank <= k
            sel = order[keep]
            return pa.table({
                "doc_id": pa.array(ids[rows[sel]], pa.int64()),
                "token": pa.array(vocab[codes[sel]], pa.string()),
                "tf": pa.array(tf[sel], pa.int64()),
                "df": pa.array(dfv[sel], pa.int64()),
                "rank": pa.array(rank[keep], pa.int64()),
            })

    return ds.map_batches(RankTerms, batch_format="pyarrow",
                          zero_copy_batch=True,
                          concurrency=default_concurrency())


def top_tokens(sf_dir: str, k: int = 50) -> pa.Table:
    """Heavy hitters: the k most frequent tokens across the corpus.
    Per-batch PARTIAL counts (combiner — each batch emits its local
    token->count map, so the exchange moves vocabulary-sized rows, not
    token instances), one hash exchange on the token, then a per-block
    pre-top-k and a driver merge. Ties broken by token text for
    cross-engine determinism."""

    from nise_ray.ops.groupapply import hash_group_apply
    from nise_ray.util import collect_table
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        # round-4: vectorized token counting (shared Arrow split kernel +
        # one np.unique) — replaces the per-row Counter loop
        _, codes, vocab = _doc_token_stream(b, need_row=False)
        if len(codes) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        uc, ns = np.unique(codes, return_counts=True)
        return pa.table({"token": pa.array(vocab[uc], pa.string()),
                         "n": pa.array(ns.astype(np.int64), pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def merge(batch: pa.Table) -> pa.Table:
        # Arrow-native per-partition merge (shared _grouped_token_sums
        # kernel — no pandas conversion), then a local pre-top-k so only
        # k rows per partition reach the driver.
        if batch.num_rows == 0:
            return batch
        toks, sums = _grouped_token_sums(batch, "n")
        if len(sums) > k:
            toks_np = toks.to_numpy(zero_copy_only=False)
            keep = np.lexsort((toks_np, -sums))[:k]
            toks = toks.take(pa.array(keep))
            sums = sums[keep]
        return pa.table({"token": toks.cast(pa.string()),
                         "n": pa.array(sums, pa.int64())})

    per_part = hash_group_apply(partials, ["token"], merge, sort=False)
    t = collect_table(per_part)
    if t.num_rows == 0:
        return t
    # final k-row merge, Arrow/numpy (no pandas): lexsort by (-n, token)
    ns = t.column("n").to_numpy(zero_copy_only=False)
    toks = np.asarray(t.column("token").to_pylist(), dtype=object)
    keep = np.lexsort((toks, -ns))[:k]
    return pa.table({"token": pa.array(toks[keep], pa.string()),
                     "n": pa.array(ns[keep], pa.int64())})


# sentinel token for carrying per-block truncation bounds through the
# token exchange — cannot collide with _TOKEN_RE matches (contains \x00)
_TRUNC_SENTINEL = "\x00__trunc__"


def top_tokens_sketch(sf_dir: str, k: int = 50,
                      capacity: int = 2048) -> pa.Table:
    """Heavy hitters with a MERGEABLE bounded sketch (Misra-Gries /
    SpaceSaving truncation; Agarwal et al., 'Mergeable Summaries'): the
    exact `top_tokens` exchange moves VOCABULARY-sized partials, which
    on 100 TB of web text is itself a corpus-scale column; this path
    caps every block's contribution at `capacity` rows. Each block
    keeps its local top-`capacity` counts and forwards the largest
    DROPPED count as its truncation bound; bounds ride the same token
    exchange under a sentinel key and sum into the global `err_bound`.
    Counts only ever UNDER-estimate, by at most `err_bound`
    (0 <= exact - estimate <= err_bound, asserted in tests), so the
    returned top-k is the true top-k whenever true counts are separated
    by more than the bound. Rows-only (the truncation choice is not
    SQL-expressible); the exact oracled path remains the default.
    Returns (token, n_est, err_bound)."""

    from nise_ray.ops.groupapply import hash_group_apply
    from nise_ray.util import collect_table
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        # round-4: vectorized token counting (shared Arrow split kernel +
        # one np.unique) — replaces the per-row Counter loop
        _, codes, vocab = _doc_token_stream(b, need_row=False)
        if len(codes) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        uc, ns = np.unique(codes, return_counts=True)
        toks = vocab[uc]
        ns = ns.astype(np.int64)
        trunc = 0
        if len(ns) > capacity:
            keep = np.lexsort((toks, -ns))
            trunc = int(ns[keep[capacity]])  # largest dropped count
            keep = keep[:capacity]
            toks, ns = toks[keep], ns[keep]
        return pa.table({
            "token": pa.array(np.append(toks, _TRUNC_SENTINEL), pa.string()),
            "n": pa.array(np.append(ns, trunc), pa.int64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def merge(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        toks, sums = _grouped_token_sums(batch, "n")
        toks_np = toks.to_numpy(zero_copy_only=False)
        # pre-top-k per partition, but the sentinel's summed bound must
        # always survive to the driver
        if len(sums) > k + 1:
            is_sent = toks_np == _TRUNC_SENTINEL
            keep = np.lexsort((toks_np, -np.where(is_sent, np.iinfo(
                np.int64).max, sums)))[:k + 1]
            toks = toks.take(pa.array(keep))
            sums = sums[keep]
        return pa.table({"token": toks.cast(pa.string()),
                         "n": pa.array(sums, pa.int64())})

    t = collect_table(hash_group_apply(partials, ["token"], merge,
                                       sort=False))
    if t.num_rows == 0:
        return pa.table({"token": pa.array([], pa.string()),
                         "n_est": pa.array([], pa.int64()),
                         "err_bound": pa.array([], pa.int64())})
    toks = np.asarray(t.column("token").to_pylist(), dtype=object)
    ns = t.column("n").to_numpy(zero_copy_only=False)
    sent = toks == _TRUNC_SENTINEL
    err_bound = int(ns[sent].sum())
    toks, ns = toks[~sent], ns[~sent]
    keep = np.lexsort((toks, -ns))[:k]
    return pa.table({
        "token": pa.array(toks[keep], pa.string()),
        "n_est": pa.array(ns[keep], pa.int64()),
        "err_bound": pa.array(np.full(len(keep), err_bound), pa.int64()),
    })


def bm25_scores(sf_dir: str, query: str = "hash join merge",
                k1: float = 1.2, b: float = 0.75,
                round_to: int = 4) -> pa.Table:
    """BM25 relevance scoring of every document against a query string
    (Robertson/Lucene idf variant: ln((N - df + 0.5)/(df + 0.5) + 1)) —
    the lexical-retrieval primitive of a training-data search stack.

    Two passes, both single-scan combiner-shaped, nothing corpus-sized
    leaves the tasks:
      pass 1  per-batch scalar partials (total token count for avgdl) +
              per-query-token document frequencies — the partial is ONE
              row of |q|+2 numbers per batch, merged on the driver;
      pass 2  query tokens + idf broadcast via ray.put; per-batch tf
              over query tokens only + per-doc length from the shared
              tokenize kernel, vectorized score, rows with any hit
              emitted as (doc_id, bm25).

    Returns docs with bm25 > 0 sorted by doc_id (rank-free contract:
    sorting by score would make the output order FP-tie-sensitive)."""
    from nise_ray.ops.groupapply import segments
    q_tokens = np.asarray(sorted(set(_TOKEN_RE.findall(query))),
                          dtype=object)
    nq = len(q_tokens)
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    n_docs = ds.count()  # parquet metadata, no scan

    def stats_partial(batch: pa.Table) -> pa.Table:
        rows, codes, counts, vocab = _doc_token_counts(batch)
        df = np.zeros(nq, dtype=np.int64)
        if len(rows):
            hit = np.flatnonzero(np.isin(vocab, q_tokens))
            for j, tok in enumerate(q_tokens):
                c = np.flatnonzero(vocab[hit] == tok)
                if len(c):
                    df[j] = int((codes == hit[c[0]]).sum())
        return pa.table({
            "sum_len": pa.array([int(counts.sum()) if len(rows) else 0],
                                pa.int64()),
            **{f"df_{j}": pa.array([int(df[j])], pa.int64())
               for j in range(nq)},
        })

    from nise_ray.util import collect_table
    sp = collect_table(ds.map_batches(stats_partial, batch_format="pyarrow",
                                      zero_copy_batch=True))
    total_len = int(np.sum(sp.column("sum_len").to_numpy(
        zero_copy_only=False))) if sp.num_rows else 0
    df = np.array([int(np.sum(sp.column(f"df_{j}").to_numpy(
        zero_copy_only=False))) for j in range(nq)], dtype=np.float64) \
        if sp.num_rows else np.zeros(nq)
    avgdl = total_len / n_docs if n_docs else 1.0
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    ref = ray.put((q_tokens, idf, avgdl))

    class Scorer:
        def __init__(self) -> None:
            self.q_tokens, self.idf, self.avgdl = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            empty = pa.table({"doc_id": pa.array([], pa.int64()),
                              "bm25": pa.array([], pa.float64())})
            rows, codes, counts, vocab = _doc_token_counts(batch)
            if not len(rows):
                return empty
            n = batch.num_rows
            dl = np.zeros(n, dtype=np.float64)
            starts, _ = segments(rows)
            dl[rows[starts]] = np.add.reduceat(counts, starts)
            # tf matrix over query tokens only: n x |q|
            tf = np.zeros((n, len(self.q_tokens)), dtype=np.float64)
            for j, tok in enumerate(self.q_tokens):
                c = np.flatnonzero(vocab == tok)
                if len(c):
                    m = codes == c[0]
                    tf[rows[m], j] = counts[m]
            denom = tf + k1 * (1.0 - b + b * dl[:, None] / self.avgdl)
            with np.errstate(invalid="ignore", divide="ignore"):
                score = np.where(tf > 0,
                                 self.idf * tf * (k1 + 1.0) / denom,
                                 0.0).sum(axis=1)
            hit = score > 0
            if not hit.any():
                return empty
            return pa.table({
                "doc_id": batch.column("doc_id").filter(pa.array(hit)),
                "bm25": pa.array(np.round(score[hit], round_to),
                                 pa.float64()),
            })

    from nise_ray.ops.groupapply import default_concurrency
    out = collect_table(ds.map_batches(Scorer, batch_format="pyarrow",
                                       zero_copy_batch=True,
                                       concurrency=default_concurrency()))
    if out.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "bm25": pa.array([], pa.float64())})
    order = np.argsort(out.column("doc_id").to_numpy(zero_copy_only=False))
    return out.take(pa.array(order))


def _doc_token_stream(b: pa.Table, need_row: bool = True):
    """POSITIONAL (row, token-code) stream + batch vocab — the single
    tokenize kernel every text op composes on (order-preserving; see
    _doc_token_counts for the uniqued variant). need_row=False skips the
    per-token row-index materialization for counts-only consumers
    (top_tokens) — one fewer token-count-sized array on the hottest
    scan."""
    import pyarrow.compute as pc
    lists = pc.split_pattern_regex(b.column("text").combine_chunks(),
                                   pattern=r"[^A-Za-z0-9_]+")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.flatten()
    enc = flat.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = np.asarray(enc.dictionary.to_pylist(), dtype=object)
    if need_row:
        offs = np.asarray(lists.offsets, dtype=np.int64) - lists.offset
        row = np.repeat(np.arange(b.num_rows, dtype=np.int64),
                        np.diff(offs))
    else:
        row = None
    empty = np.flatnonzero(vocab == "")
    if len(empty):
        keep = codes != empty[0]
        codes = codes[keep]
        if need_row:
            row = row[keep]
    return row, codes, vocab


def bigram_repetition_batch(b: pa.Table) -> pa.Table:
    """Gopher dup-2-gram signals per document: n_bigrams,
    n_uniq_bigrams, dup_bigram_frac, top_bigram_share (unrounded
    integer-ratio doubles — same cross-engine tie rationale as
    repetition_batch). Bigrams built positionally from the ordered token
    stream, one vectorized sweep: adjacent-position pairs within a row
    become code1*|V| + code2 ids, then one np.unique per (row, bigram)."""
    from nise_ray.ops.groupapply import segments
    n = b.num_rows
    n_bg = np.zeros(n, dtype=np.int64)
    n_uniq = np.zeros(n, dtype=np.int64)
    top = np.zeros(n, dtype=np.int64)
    row, codes, vocab = _doc_token_stream(b)
    if len(row) > 1:
        adj = row[1:] == row[:-1]
        if adj.any():
            v = np.int64(len(vocab))
            brow = row[:-1][adj]
            bid = codes[:-1][adj] * v + codes[1:][adj]
            combo_sorted = np.lexsort((bid, brow))
            br, bi = brow[combo_sorted], bid[combo_sorted]
            first = np.ones(len(br), dtype=bool)
            first[1:] = (br[1:] != br[:-1]) | (bi[1:] != bi[:-1])
            starts_u = np.flatnonzero(first)
            cnts = np.diff(np.append(starts_u, len(br)))
            urow = br[starts_u]
            s2, runs = segments(urow)
            docs = urow[s2]
            n_bg[docs] = np.add.reduceat(cnts, s2)
            n_uniq[docs] = runs
            top[docs] = np.maximum.reduceat(cnts, s2)
    with np.errstate(invalid="ignore"):
        tot = n_bg.astype(np.float64)
        dup_frac = np.where(n_bg > 0, 1.0 - n_uniq / tot, 0.0)
        top_share = np.where(n_bg > 0, top / tot, 0.0)
    return pa.table({
        "doc_id": b.column("doc_id"),
        "n_bigrams": pa.array(n_bg, pa.int64()),
        "n_uniq_bigrams": pa.array(n_uniq, pa.int64()),
        "dup_bigram_frac": pa.array(dup_frac, pa.float64()),
        "top_bigram_share": pa.array(top_share, pa.float64()),
    })


def unigram_lnp_ref(ds: "ray.data.Dataset") -> "ray.ObjectRef":
    """Global unigram-LM table of a (doc_id, text) Dataset: ray.put ref
    of (sorted token array, ln(count/total)) — the combiner-shaped freq
    pass shared by unigram_logprob and the CCNet-style perplexity
    bucketing in ops/dsir.py. Vocabulary-bounded, never corpus-bounded:
    per-batch (token, n) partials, ONE token-keyed exchange, broadcast
    once."""
    from nise_ray.ops.groupapply import hash_group_apply
    from nise_ray.util import collect_table

    def count_partial(b: pa.Table) -> pa.Table:
        _, codes, vocab = _doc_token_stream(b, need_row=False)
        if len(codes) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        uc, ns = np.unique(codes, return_counts=True)
        return pa.table({"token": pa.array(vocab[uc], pa.string()),
                         "n": pa.array(ns.astype(np.int64), pa.int64())})

    def count_merge(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        toks, sums = _grouped_token_sums(batch, "n")
        return pa.table({"token": toks.cast(pa.string()),
                         "n": pa.array(sums, pa.int64())})

    freq_t = collect_table(hash_group_apply(
        ds.map_batches(count_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["token"], count_merge, 0, sort=False))
    toks = np.asarray(freq_t.column("token").to_pylist(), dtype=object)
    cnts = freq_t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
    total = float(cnts.sum())
    order = np.argsort(toks)
    # ln(count/total) precomputed once — workers only ever gather from it
    return ray.put((toks[order],
                    np.log(cnts[order] / total) if total else cnts[order]))


def unigram_logprob(sf_dir: str, round_to: int = 4) -> "ray.data.Dataset":
    """CCNet-style unigram language-model scoring (Wenzek et al. 2020,
    arXiv:1911.00359 — perplexity filtering is the standard quality gate
    of a web-scale training-data pipeline; here the LM is the corpus's
    own unigram distribution): per document, the mean token log
    probability  sum(tf_t * ln(count_t / total)) / n_tokens  under the
    global unigram frequencies. Low (very negative) scores = documents
    full of corpus-rare tokens; near-zero scores = documents of only
    common tokens.

    Two passes, both combiner-shaped (same bounds as top_doc_terms):
      1. global token counts — per-batch (token, n) partials via the
         shared tokenize kernel, one vocabulary-sized hash exchange,
         broadcast once via ray.put (vocab-bounded, never corpus-bounded);
      2. one stateless map: per-(doc, token) tf from _doc_token_counts,
         vectorized searchsorted lookup into the broadcast (token -> ln
         prob) table, one reduceat per doc. Zero-token docs emit
         n_tokens=0, logprob_mean=0.0.

    The final mean is rounded (the per-doc sum order differs between the
    engine's reduceat and the SQL oracle's aggregate, so low bits carry
    FP noise; round(round_to) heals it — the values themselves are FP-
    noisy so half-way round ties are not a cross-engine hazard here)."""
    from nise_ray.ops.groupapply import default_concurrency

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    lm_ref = unigram_lnp_ref(ds)

    class Score:
        def __init__(self) -> None:
            self.toks, self.lnp = ray.get(lm_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            from nise_ray.ops.groupapply import segments
            n = b.num_rows
            n_tok = np.zeros(n, dtype=np.int64)
            mean_lp = np.zeros(n, dtype=np.float64)
            rows, codes, tf, vocab = _doc_token_counts(b)
            if len(rows):
                vpos = np.searchsorted(self.toks, vocab)
                lnp = self.lnp[vpos][codes]  # every batch token is global
                starts, _ = segments(rows)
                docs = rows[starts]
                n_tok[docs] = np.add.reduceat(tf, starts)
                sums = np.add.reduceat(tf.astype(np.float64) * lnp, starts)
                mean_lp[docs] = np.round(sums / n_tok[docs], round_to)
            return pa.table({
                "doc_id": b.column("doc_id"),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "logprob_mean": pa.array(mean_lp, pa.float64()),
            })

    return ds.map_batches(Score, batch_format="pyarrow",
                          zero_copy_batch=True,
                          concurrency=default_concurrency())


def bigram_repetition_stats(sf_dir: str) -> "ray.data.Dataset":
    """Per-document dup-2-gram quality stats — see
    bigram_repetition_batch. Stateless single-pass map, no shuffle."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ds.map_batches(bigram_repetition_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


def token_entropy(sf_dir: str, round_to: int = 4) -> "ray.data.Dataset":
    """Per-document Shannon entropy of the token distribution (nats) —
    the diversity counterpart of the repetition signals (a doc of one
    repeated token scores 0; uniform-over-V scores ln V). Computed as
    H = ln(n) - (sum c*ln c)/n over the per-(doc, token) counts, one
    stateless vectorized pass (shared tokenize kernel + one reduceat),
    no shuffle. Zero-token docs emit (0, 0.0). Rounded for the same
    cross-engine sum-order reason as unigram_logprob."""
    from nise_ray.ops.groupapply import segments

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def ent(b: pa.Table) -> pa.Table:
        n = b.num_rows
        n_tok = np.zeros(n, dtype=np.int64)
        h = np.zeros(n, dtype=np.float64)
        rows, _, tf, _ = _doc_token_counts(b)
        if len(rows):
            starts, _ = segments(rows)
            docs = rows[starts]
            n_tok[docs] = np.add.reduceat(tf, starts)
            tff = tf.astype(np.float64)
            clnc = np.add.reduceat(tff * np.log(tff), starts)
            nt = n_tok[docs].astype(np.float64)
            h[docs] = np.round(np.log(nt) - clnc / nt, round_to)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "entropy": pa.array(h, pa.float64()),
        })

    return ds.map_batches(ent, batch_format="pyarrow",
                          zero_copy_batch=True)


def token_cooccurrence(sf_dir: str, vocab_limit: int = 64
                       ) -> "ray.data.Dataset":
    """TOKEN CO-OCCURRENCE matrix over a heavy-hitter vocabulary: for
    every unordered token pair (a < b) in the global top-`vocab_limit`
    vocabulary, the number of documents containing BOTH — the
    distributional-similarity / PMI precursor a corpus-analysis pipeline
    computes before embedding training.

    Scale contract: all-pairs co-occurrence over an UNBOUNDED vocabulary
    is quadratic and off the table; the vocabulary is first capped to
    the global top-V heavy hitters (the existing top_tokens combiner —
    one vocabulary-sized exchange, deterministic count-desc/token-asc
    tie-break), the V tokens broadcast once via ray.put, and each block
    contributes a V x V boolean-membership matmul partial (distinct
    presence per doc, so multiplicity inside a doc doesn't count). The
    pair partials are V^2/2-bounded rows per block; ONE hash exchange on
    the pair key sums them. Output (tok_a, tok_b, n_docs), zero-count
    pairs omitted."""
    from nise_ray.ops.groupapply import hash_group_apply, segments
    from nise_ray.util import collect_table

    vocab_t = top_tokens(sf_dir, k=vocab_limit)
    vocab = np.asarray(vocab_t.column("token").to_pylist(), dtype=object)
    vsort = np.sort(vocab)  # lexicographic — pair key order == oracle's
    vocab_ref = ray.put(vsort)

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])

    class CoocPartial:
        def __init__(self, ref):
            self.vocab = ray.get(ref)
            self.v = len(self.vocab)
            self.iu, self.iv = np.triu_indices(self.v, k=1)

        def __call__(self, b: pa.Table) -> pa.Table:
            empty = pa.table({"pair": pa.array([], pa.int64()),
                              "n": pa.array([], pa.int64())})
            if b.num_rows == 0 or self.v == 0:
                return empty
            row, codes, bvocab = _doc_token_stream(b)
            if len(codes) == 0:
                return empty
            # block vocab -> global top-V positions (miss = not counted)
            pos = np.searchsorted(self.vocab, bvocab.astype(object))
            pos = np.clip(pos, 0, self.v - 1)
            ok = self.vocab[pos] == bvocab
            vpos = np.where(ok, pos, -1)[codes]
            keep = vpos >= 0
            row, vpos = row[keep], vpos[keep]
            if len(row) == 0:
                return empty
            m = np.zeros((b.num_rows, self.v), dtype=np.int64)
            m[row, vpos] = 1  # DISTINCT presence per doc
            cnt = m.T @ m
            iu, iv = self.iu, self.iv
            n = cnt[iu, iv]
            nz = n > 0
            return pa.table({
                "pair": pa.array(iu[nz] * self.v + iv[nz], pa.int64()),
                "n": pa.array(n[nz], pa.int64()),
            })

    from nise_ray.ops.groupapply import default_concurrency
    partials = ds.map_batches(CoocPartial,
                              fn_constructor_kwargs={"ref": vocab_ref},
                              batch_format="pyarrow", zero_copy_batch=True,
                              concurrency=default_concurrency())

    v = len(vsort)
    vlist = vsort  # closure for the merge stage

    def merge(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"tok_a": pa.array([], pa.string()),
                             "tok_b": pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64())})
        pair = batch.column("pair").to_numpy(zero_copy_only=False)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(pair, kind="stable")
        sp = pair[order]
        starts, _ = segments(sp)
        sums = np.add.reduceat(n[order], starts)
        up = sp[starts]
        return pa.table({
            "tok_a": pa.array(vlist[up // v].astype(object), pa.string()),
            "tok_b": pa.array(vlist[up % v].astype(object), pa.string()),
            "n_docs": pa.array(sums, pa.int64()),
        })

    return hash_group_apply(partials, ["pair"], merge, 0, sort=False)


def zipf_fit(sf_dir: str, max_types: int = 100_000) -> pa.Table:
    """ZIPF-LAW fit over the corpus token frequency distribution:
    least-squares slope/intercept of log2(count) vs log2(rank) — the
    exponent a corpus-statistics report quotes (natural text ~ -1;
    flatter means an artificial/templated vocabulary). Reuses the exact
    heavy-hitter combiner (vocabulary-sized exchange, count-desc/token
    tie-break identical to the SQL row_number ranking); the fit itself
    runs on the type-count-sized driver table with DuckDB's
    regr_slope/regr_intercept closed form (verified 1e-15; round(,4)).
    `max_types` bounds the driver table — vocabularies past the cap get
    the fit over the TOP max_types ranks only (logged, not silent).
    Returns one row (n_types, zipf_slope, zipf_intercept)."""
    t = top_tokens(sf_dir, k=max_types)
    m = t.num_rows
    if m < 2:
        return pa.table({"n_types": pa.array([m], pa.int64()),
                         "zipf_slope": pa.array([None], pa.float64()),
                         "zipf_intercept": pa.array([None], pa.float64())})
    if m == max_types:
        logging.getLogger(__name__).warning(
            "zipf_fit: vocabulary hit the max_types=%d cap — fitting the "
            "top ranks only", max_types)
    n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
    x = np.log2(np.arange(1, m + 1, dtype=np.float64))
    y = np.log2(n)
    sx, sy = x.sum(), y.sum()
    den = m * (x * x).sum() - sx * sx
    slope = (m * (x * y).sum() - sx * sy) / den
    intercept = sy / m - slope * sx / m
    return pa.table({
        "n_types": pa.array([m], pa.int64()),
        "zipf_slope": pa.array([round(float(slope), 4)], pa.float64()),
        "zipf_intercept": pa.array([round(float(intercept), 4)],
                                   pa.float64()),
    })


def compression_ratio(sf_dir: str, level: int = 6) -> "ray.data.Dataset":
    """Per-document zlib compression ratio — the classic low-quality /
    boilerplate detector (highly repetitive text compresses far below
    natural prose; Gopher-family pipelines threshold on it). Returns
    (doc_id, n_bytes, n_compressed, ratio) with ratio = compressed /
    raw bytes rounded to 4; empty docs emit NULL ratio.

    Scale shape: stateless streaming map, nothing but the per-doc
    scalars leaves the task. zlib runs once per row — compression IS
    the kernel here, so the per-row loop is the workload, not Python
    overhead (same judgment as the multimodal codecs). rows-only
    surface: no SQL engine exposes a deterministic DEFLATE, so the
    contract is pinned by zlib level + golden tests instead of an
    oracle."""
    import zlib

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def comp_batch(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        n = len(texts)
        raw = np.empty(n, dtype=np.int64)
        comp = np.empty(n, dtype=np.int64)
        for i, t in enumerate(texts):
            enc = t.encode("utf-8", errors="surrogatepass")
            raw[i] = len(enc)
            comp[i] = len(zlib.compress(enc, level))
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = np.where(raw > 0, comp / np.maximum(raw, 1), 0.0)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_bytes": pa.array(raw, pa.int64()),
            "n_compressed": pa.array(comp, pa.int64()),
            "ratio": pa.array(np.round(ratio, 4), pa.float64(),
                              mask=raw == 0),
        })

    comp_batch.__name__ = "CompressionRatio"
    return ds.map_batches(comp_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


def gopher_quality(sf_dir: str) -> "ray.data.Dataset":
    """Gopher-style document quality-rule filter (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", §A1.1 repetition/quality
    rules adapted to single-line synthetic docs): per document emit the
    rule signals plus a 0/1 pass flag for the conjunction

      50 <= n_words <= 100_000
      3.0 <= mean_word_len <= 10.0
      symbol_ratio  (# '#' chars + non-overlapping '...' runs, per word) <= 0.1
      alpha_word_ratio (words containing >= 1 [A-Za-z])            >= 0.80
      n_stopwords   (occurrences of 10 common English stopwords)   >= 2

    Every signal is a whole-batch Arrow RE2 kernel (count_substring /
    count_substring_regex) — no Python rows — and each is pinned to an
    exactly equivalent DuckDB expression (see oracle_sql), so the op is
    bit-exact oracled end-to-end: words are `\\S+` runs, alpha words are
    `[^\\s]*[A-Za-z][^\\s]*` runs (leftmost-greedy RE2 consumes the whole
    token, so this counts exactly the \\S+ tokens containing a letter),
    and the ratios are exact int/int IEEE divisions (bit-identical in
    both engines, emitted unrounded per the repo FP contract).

    Scale shape: stateless streaming map over a 2-column pruned read;
    only per-doc scalars leave the task."""
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    stop_pat = r"\b(the|and|of|to|in|is|that|it|for|was)\b"

    def gopher_batch(b: pa.Table) -> pa.Table:
        text = b.column("text")
        n_chars = pc.utf8_length(text).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        n_ws = pc.count_substring_regex(text, r"\s").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        n_words = pc.count_substring_regex(text, r"\S+").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        n_alpha_words = pc.count_substring_regex(
            text, r"[^\s]*[A-Za-z][^\s]*").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        n_hash = pc.count_substring(text, "#").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        n_ellipsis = pc.count_substring(text, "...").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        n_stop = pc.count_substring_regex(pc.utf8_lower(text), stop_pat) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        denom = np.maximum(n_words, 1).astype(np.float64)
        with np.errstate(invalid="ignore"):
            mean_word_len = np.where(
                n_words > 0, (n_chars - n_ws) / denom, 0.0)
            alpha_ratio = np.where(n_words > 0, n_alpha_words / denom, 0.0)
            symbol_ratio = np.where(
                n_words > 0, (n_hash + n_ellipsis) / denom, 0.0)
        passes = ((n_words >= 50) & (n_words <= 100_000)
                  & (mean_word_len >= 3.0) & (mean_word_len <= 10.0)
                  & (symbol_ratio <= 0.1) & (alpha_ratio >= 0.8)
                  & (n_stop >= 2))
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_words": pa.array(n_words, pa.int64()),
            "mean_word_len": pa.array(mean_word_len, pa.float64()),
            "alpha_word_ratio": pa.array(alpha_ratio, pa.float64()),
            "symbol_ratio": pa.array(symbol_ratio, pa.float64()),
            "n_stopwords": pa.array(n_stop, pa.int64()),
            "passes": pa.array(passes.astype(np.int64), pa.int64()),
        })

    gopher_batch.__name__ = "GopherQuality"
    return ds.map_batches(gopher_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


def top_tokens_per_lang(sf_dir: str, k: int = 10) -> pa.Table:
    """GROUPED heavy hitters: the k most frequent tokens WITHIN each
    language (rank, token, count) — the per-group top-N over a derived
    (tokenized) table, the shape a contamination or vocabulary audit
    runs per language slice.

    Scale shape: per-batch (lang, token) partial counts (the shared
    tokenize kernel + one np.unique over lang×token combos — the
    combiner, so the first exchange moves per-batch-vocabulary-sized
    rows, not token instances); exchange 1 hash-merges exact counts on
    (lang, token) and immediately pre-top-ks per lang WITHIN the
    partition (safe: counts are exact after the merge, and each
    partition's per-lang top-k is a superset contributor to the global
    top-k); exchange 2 moves only (#partitions × #langs × k) rows to
    per-lang final blocks. Ties break on token text ascending — the
    cross-engine-deterministic contract top_tokens pins."""
    from nise_ray.ops.groupapply import hash_group_apply, segments
    from nise_ray.util import collect_table

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "text"])

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"lang": pa.array([], pa.string()),
                          "token": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        row, codes, vocab = _doc_token_stream(b)
        if len(codes) == 0:
            return empty
        lenc = b.column("lang").combine_chunks().dictionary_encode()
        lcodes = lenc.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)[row]
        combo = lcodes * np.int64(len(vocab)) + codes
        uniq, counts = np.unique(combo, return_counts=True)
        return pa.table({
            "lang": lenc.dictionary.take(
                pa.array(uniq // len(vocab))).cast(pa.string()),
            "token": pa.array(vocab[uniq % len(vocab)], pa.string()),
            "n": pa.array(counts.astype(np.int64), pa.int64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def _group_sum(b: pa.Table):
        lenc = b.column("lang").combine_chunks().dictionary_encode()
        tenc = b.column("token").combine_chunks().dictionary_encode()
        lc = lenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        tc = tenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nv = b.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((tc, lc))
        combo = lc[order] * np.int64(len(tenc.dictionary)) + tc[order]
        starts, _ = segments(combo)
        sums = np.add.reduceat(nv[order], starts)
        return (lc[order][starts], tc[order][starts], sums,
                np.asarray(lenc.dictionary.to_pylist(), dtype=object),
                np.asarray(tenc.dictionary.to_pylist(), dtype=object))

    def _per_lang_topk(lc, tc, sums, lvoc, tvoc):
        toks = tvoc[tc]
        order = np.lexsort((toks, -sums, lc))
        slc, stoks, ssums = lc[order], toks[order], sums[order]
        starts, counts = segments(slc)
        pos = np.arange(len(slc), dtype=np.int64) - \
            np.repeat(starts, counts)
        keep = pos < k
        return (lvoc[slc[keep]], stoks[keep], ssums[keep], pos[keep] + 1)

    def merge(b: pa.Table) -> pa.Table:
        empty = pa.table({"lang": pa.array([], pa.string()),
                          "token": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        lc, tc, sums, lvoc, tvoc = _group_sum(b)
        langs, toks, ns, _ = _per_lang_topk(lc, tc, sums, lvoc, tvoc)
        return pa.table({"lang": pa.array(langs, pa.string()),
                         "token": pa.array(toks, pa.string()),
                         "n": pa.array(ns, pa.int64())})

    mid = hash_group_apply(partials, ["lang", "token"], merge, sort=False)

    def final(b: pa.Table) -> pa.Table:
        empty = pa.table({"lang": pa.array([], pa.string()),
                          "rnk": pa.array([], pa.int64()),
                          "token": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        # rows are already exact-count uniques: each (lang, token) lives
        # on exactly one exchange-1 partition, so no re-sum is needed
        lc_enc = b.column("lang").combine_chunks().dictionary_encode()
        lc = lc_enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        toks = np.asarray(b.column("token").to_pylist(), dtype=object)
        ns = b.column("n").to_numpy(zero_copy_only=False)
        lvoc = np.asarray(lc_enc.dictionary.to_pylist(), dtype=object)
        langs, stoks, ssums, rnk = _per_lang_topk(
            lc, np.arange(len(toks), dtype=np.int64), ns, lvoc, toks)
        return pa.table({"lang": pa.array(langs, pa.string()),
                         "rnk": pa.array(rnk, pa.int64()),
                         "token": pa.array(stoks, pa.string()),
                         "n": pa.array(ssums, pa.int64())})

    return collect_table(hash_group_apply(mid, ["lang"], final, 0,
                                          sort=False))


def blocklist_filter_docs(sf_dir: str,
                          blocklist: tuple[str, ...] = ("dup", "deadlock")
                          ) -> "ray.data.Dataset":
    """C4-style blocklist filter: per document, how many tokens hit the
    blocklist and whether the doc would be dropped — the wordlist-based
    content gate every web-scale curation pipeline runs first. Output:
    (doc_id, n_blocked, blocked), tokens = [A-Za-z0-9_]+ runs on RAW
    text (case-sensitive, same tokenizer as the oracle).

    Scale shape: a stateless vectorized map, ZERO exchange — the
    blocklist membership test runs once per UNIQUE token in the batch
    (dictionary encode), then a bincount scatters hits back to rows.
    The blocklist itself is a closure constant (a few KB); a
    million-word list would ride ray.put the same way the decontam
    gram sets do."""
    import pyarrow.compute as pc

    blocked_set = frozenset(blocklist)
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def score(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_blocked": pa.array([], pa.int64()),
                             "blocked": pa.array([], pa.int64())})
        arr = b.column("text")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        n = len(arr)
        lists = pc.split_pattern_regex(arr, pattern=r"[^A-Za-z0-9_]+")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = lists.flatten()
        offs = np.asarray(lists.offsets, dtype=np.int64) - lists.offset
        enc = flat.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = enc.dictionary.to_pylist()
        hit = np.fromiter((v in blocked_set for v in vocab),
                          dtype=bool, count=len(vocab))
        row = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
        nb = np.bincount(row[hit[idx]], minlength=n).astype(np.int64)
        return pa.table({
            "doc_id": b.column("doc_id").cast(pa.int64()),
            "n_blocked": pa.array(nb, pa.int64()),
            "blocked": pa.array((nb > 0).astype(np.int64), pa.int64())})

    score.__name__ = "BlocklistFilter"
    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)
