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
