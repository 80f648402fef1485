"""Deterministic text normalization, tokenization and shingling.

Pinned semantics (config v2, nise_ray.config):
  normalize : unicode NFC; collapse runs of [ \\t\\r\\f\\v] to one space;
              strip leading/trailing whitespace; newlines preserved.
  tokenize  : regex [A-Za-z0-9_]+ over the normalized text.
  shingle   : w consecutive tokens; hash = poly_fold over the w per-token
              blake2b-8 hashes; deduplicated (set semantics) per doc.

The original `content` column is never mutated (north-rule sha256
invariant); normalization feeds only the hashing stages.
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np

from nise_ray.hashing import U64, blake2b64, poly_fold

_WS_RUN = re.compile(r"[ \t\r\f\v]+")
_TOKEN = re.compile(r"[A-Za-z0-9_]+")


def normalize_text(text: str) -> str:
    text = unicodedata.normalize("NFC", text)
    return _WS_RUN.sub(" ", text).strip()


def tokenize(normalized: str) -> list[str]:
    return _TOKEN.findall(normalized)


class TokenHasher:
    """Caches blake2b-8 hashes of unique tokens.

    Source-code corpora have a small, heavy-tailed token vocabulary, so a
    per-worker cache turns almost all token hashing into dict lookups.
    Instantiate once per actor (stateful-stage pattern), not per batch.
    """

    def __init__(self, max_size: int = 1_000_000) -> None:
        self._cache: dict[str, int] = {}
        self._max = max_size

    def hash_tokens(self, tokens: list[str]) -> np.ndarray:
        cache = self._cache
        out = np.empty(len(tokens), dtype=U64)
        for i, t in enumerate(tokens):
            h = cache.get(t)
            if h is None:
                h = blake2b64(t.encode())
                if len(cache) < self._max:
                    cache[t] = h
            out[i] = h
        return out

    def hash_vocab(self, vocab: list[str]) -> np.ndarray:
        """Hashes for a batch's UNIQUE tokens (dictionary-encoded path)."""
        cache = self._cache
        out = np.empty(len(vocab), dtype=U64)
        for i, t in enumerate(vocab):
            h = cache.get(t)
            if h is None:
                h = blake2b64(t.encode())
                if len(cache) < self._max:
                    cache[t] = h
            out[i] = h
        return out


def shingle_hashes(token_hashes: np.ndarray, w: int) -> np.ndarray:
    """Unique w-gram shingle hashes (sorted uint64) from per-token hashes."""
    n = len(token_hashes)
    if n < w:
        return np.empty(0, dtype=U64)
    windows = np.lib.stride_tricks.sliding_window_view(token_hashes, w)
    return np.unique(poly_fold(windows))


def doc_shingles(text: str, w: int, hasher: TokenHasher) -> np.ndarray:
    toks = tokenize(normalize_text(text))
    return shingle_hashes(hasher.hash_tokens(toks), w)


# --------------------------------------------------------- batched kernels
#
# Column-level equivalents of tokenize(normalize_text(x)) /
# shingle_hashes(...) used by the sign stage: one Arrow regex pass over the
# whole batch instead of a Python re.findall per row.
#
# Exactness: NFC is the identity on ASCII text, and whitespace collapse +
# strip are token-invariant (they only rewrite characters outside
# [A-Za-z0-9_] and never join two token runs), so ASCII rows can skip
# normalization and split directly. Non-ASCII rows (rare in source
# corpora) take the per-row reference path — this build's
# pc.utf8_normalize is broken (every form decomposes, i.e. behaves as
# NFD), so Arrow-side NFC is not available. Per-row parity is pinned in
# `tests/test_ops_local.py`.

def batch_token_hashes(
    arr: "object", hasher: TokenHasher, normalize: bool = True,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """content column -> (flat token hashes, per-row offsets, n_tokens).

    Tokens are dictionary-encoded so blake2b runs once per UNIQUE token in
    the batch (the TokenHasher cache then carries the vocabulary across
    batches — source corpora have heavy-tailed vocabularies).

    normalize=False skips the NFC pass and tokenizes the RAW text —
    required when the consumer's exactness contract is defined over raw
    text (e.g. decontamination, whose oracle tokenizes unnormalized
    text; NFC can merge a combining sequence into a token character and
    change the gram set)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if normalize:
        is_ascii = pc.string_is_ascii(arr).to_numpy(zero_copy_only=False)
        non_ascii_rows = np.flatnonzero(~is_ascii)
    else:
        non_ascii_rows = np.empty(0, dtype=np.int64)
    if len(non_ascii_rows):
        # replace non-ASCII rows with their NFC normalization done by
        # Python's unicodedata (correct), then split everything in Arrow
        vals = arr.to_pylist()
        for i in non_ascii_rows:
            vals[i] = unicodedata.normalize("NFC", vals[i])
        arr = pa.array(vals, pa.string())
    lists = pc.split_pattern_regex(arr, pattern=r"[^A-Za-z0-9_]+")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.flatten()
    # normalize against the first physical VALUE offset, not the list-
    # slot slice offset (the two differ on sliced/non-compacted arrays;
    # flatten() returns exactly the values the logical slice references)
    raw_offs = np.asarray(lists.offsets, dtype=np.int64)
    if len(raw_offs):
        raw_offs = raw_offs - raw_offs[0]
    enc = flat.dictionary_encode()
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = enc.dictionary.to_pylist()
    vocab_h = hasher.hash_vocab(vocab)
    # split_pattern_regex yields "" fragments at token-boundary edges;
    # drop them (findall semantics) and rebuild per-row counts
    try:
        empty_idx = vocab.index("")
    except ValueError:
        empty_idx = -1
    if empty_idx >= 0:
        mask = idx != empty_idx
        row = np.repeat(np.arange(n, dtype=np.int64), np.diff(raw_offs))
        counts = np.bincount(row[mask], minlength=n).astype(np.int64)
        flat_h = vocab_h[idx[mask]]
    else:
        counts = np.diff(raw_offs)
        flat_h = vocab_h[idx]
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return flat_h, offsets, counts


def batch_shingle_hashes(flat_h: np.ndarray, offsets: np.ndarray,
                         w: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-row unique w-gram shingle hashes over a flat token-hash array.

    One poly_fold over the whole batch's sliding windows (row-crossing
    windows excluded by start filtering), one lexsort for per-row unique —
    no per-row numpy calls. Output per row is sorted-unique, bit-identical
    to shingle_hashes()."""
    n = len(offsets) - 1
    cnt = np.diff(offsets)
    wcnt = np.maximum(cnt - w + 1, 0)
    total = int(wcnt.sum())
    out_offsets = np.zeros(n + 1, dtype=np.int64)
    if total == 0:
        return np.empty(0, dtype=U64), out_offsets
    row = np.repeat(np.arange(n, dtype=np.int64), wcnt)
    first_w = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(wcnt, out=first_w[1:])
    intra = np.arange(total, dtype=np.int64) - first_w[:-1][row]
    starts = offsets[:-1][row] + intra
    # fold BEFORE gathering: poly_fold over the sliding-window VIEW is w
    # strided multiply-adds over the flat array (no copy); gathering the
    # (total, w) window matrix first would materialize it
    fold_all = poly_fold(np.lib.stride_tricks.sliding_window_view(flat_h, w))
    fold = fold_all[starts]
    order = np.lexsort((fold, row))
    f = fold[order]
    r = row[order]
    keep = np.empty(total, dtype=bool)
    keep[0] = True
    keep[1:] = (r[1:] != r[:-1]) | (f[1:] != f[:-1])
    ff = f[keep]
    n_sh = np.bincount(r[keep], minlength=n).astype(np.int64)
    np.cumsum(n_sh, out=out_offsets[1:])
    return ff, out_offsets


def batch_sha_ngram_hashes(arr: "object", w: int,
                           ) -> tuple[np.ndarray, np.ndarray]:
    """content column -> per-row SORTED-UNIQUE sha256-derived w-gram
    hashes (flat uint64, offsets). The shingle hash is the first 8
    bytes (big-endian) of sha256 over the space-joined token run — a
    function DuckDB can compute verbatim
    (``CAST('0x' || substr(sha256(s), 1, 16) AS UBIGINT)``), which is
    the whole point: ops built on these units are externally
    SQL-oracle-able, unlike the production blake2b+poly_fold shingles
    (pinned, faster, but not expressible in SQL).

    Vectorized: one Arrow regex split, one binary_join_element_wise
    over w shifted slices for ALL windows at once, dictionary encode so
    sha256 runs once per UNIQUE shingle in the batch, one lexsort for
    the per-row unique. Raw-text tokenization (matches
    regexp_extract_all in the oracle)."""
    import hashlib

    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    lists = pc.split_pattern_regex(arr, pattern=r"[^A-Za-z0-9_]+")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.flatten()
    raw_offs = np.asarray(lists.offsets, dtype=np.int64)
    if len(raw_offs):  # value-offset normalization — see batch_token_hashes
        raw_offs = raw_offs - raw_offs[0]
    # drop the "" fragments split_pattern_regex yields at edges
    # (regexp_extract_all semantics), rebuild per-row counts
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    row = np.repeat(np.arange(n, dtype=np.int64), np.diff(raw_offs))
    row = row[nonempty]
    flat = flat.filter(pa.array(nonempty))
    cnt = np.bincount(row, minlength=n).astype(np.int64)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(cnt, out=offs[1:])

    out_offsets = np.zeros(n + 1, dtype=np.int64)
    wcnt = np.maximum(cnt - w + 1, 0)
    total_tok = len(flat)
    if total_tok < w or wcnt.sum() == 0:
        return np.empty(0, dtype=U64), out_offsets
    # all length-w windows over the flat token array in ONE Arrow call;
    # row-crossing windows are excluded by the start filter below
    n_win = total_tok - w + 1
    parts = [flat.slice(j, n_win) for j in range(w)]
    grams = pc.binary_join_element_wise(*parts, pa.scalar(" "))
    starts_valid = _ranges_starts(offs, wcnt)
    grams = grams.take(pa.array(starts_valid))
    enc = grams.dictionary_encode()
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = enc.dictionary.to_pylist()
    uh = np.fromiter(
        (int.from_bytes(hashlib.sha256(s.encode()).digest()[:8], "big")
         for s in uniq), dtype=U64, count=len(uniq))
    fold = uh[idx]
    grow = np.repeat(np.arange(n, dtype=np.int64), wcnt)
    order = np.lexsort((fold, grow))
    f, r = fold[order], grow[order]
    keep = np.ones(len(f), dtype=bool)
    keep[1:] = (r[1:] != r[:-1]) | (f[1:] != f[:-1])
    ff = f[keep]
    n_sh = np.bincount(r[keep], minlength=n).astype(np.int64)
    np.cumsum(n_sh, out=out_offsets[1:])
    return ff, out_offsets


def _ranges_starts(offs: np.ndarray, wcnt: np.ndarray) -> np.ndarray:
    """Flat indices of every valid in-row window start: for row i the
    range [offs[i], offs[i] + wcnt[i]). Delegates to the shared
    simjoin._ranges kernel (lazy import — simjoin imports this module
    at load time) so its zero-count corruption fix applies here too."""
    from nise_ray.ops.simjoin import _ranges
    return _ranges(offs[:-1], wcnt)


def batch_normalize(arr: "object") -> "object":
    """Column-level ``normalize_text``: NFC + [ \\t\\r\\f\\v]+ -> ' ' +
    strip, one Arrow kernel pass per step. ASCII rows stay fully in
    Arrow (NFC is the identity on ASCII); rows that are non-ASCII or
    carry the ASCII control whitespace Python's strip() removes but
    Unicode's White_Space property excludes (\\x1c-\\x1f) take the
    per-row reference path (this build's pc.utf8_normalize composes
    nothing — see batch_token_hashes). Parity with normalize_text is
    hypothesis-tested."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    is_ascii = pc.string_is_ascii(arr).to_numpy(zero_copy_only=False)
    has_ctl = pc.match_substring_regex(arr, r"[\x1c-\x1f]") \
        .to_numpy(zero_copy_only=False)
    ref_rows = np.flatnonzero(~is_ascii | has_ctl)
    if len(ref_rows):
        vals = arr.to_pylist()
        for i in ref_rows:
            vals[i] = normalize_text(vals[i])
        arr = pa.array(vals, pa.string())
        # reference rows are fully normalized already; the Arrow passes
        # below are idempotent on them (no runs/edges left to rewrite)
    collapsed = pc.replace_substring_regex(arr, pattern=r"[ \t\r\f\v]+",
                                           replacement=" ")
    return pc.utf8_trim_whitespace(collapsed)


def normalize_documents(sf_dir: str) -> "object":
    """The §3.2 normalizer as a standalone ORACLED query:
    (doc_id, norm_text) over the documents table — DuckDB reproduces
    the pinned semantics as
    trim(regexp_replace(nfc_normalize(text), '[ \\t\\r\\f\\v]+', ' ',
    'g'), <ascii whitespace set>). Stateless zero-copy map_batches."""
    import pyarrow as pa

    import ray

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def norm(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b.column("doc_id"),
                         "norm_text": batch_normalize(b.column("text"))})

    return ds.map_batches(norm, batch_format="pyarrow",
                          zero_copy_batch=True)
