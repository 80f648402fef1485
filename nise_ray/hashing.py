"""Deterministic, platform-stable hash kernels (pure numpy / hashlib).

All uint64 arithmetic relies on numpy's well-defined modular wraparound for
unsigned integers — identical results on any platform/endianness because we
never reinterpret raw memory across widths except through explicit
little-endian byte views.
"""

from __future__ import annotations

import hashlib

import numpy as np

U64 = np.uint64
_SPLITMIX_C1 = U64(0x9E3779B97F4A7C15)
_SPLITMIX_C2 = U64(0xBF58476D1CE4E5B9)
_SPLITMIX_C3 = U64(0x94D049BB133111EB)
_POLY_C = U64(0x100000001B3)  # FNV-1a 64 prime, used as fold multiplier


def splitmix64(x: np.ndarray | int) -> np.ndarray | np.uint64:
    """SplitMix64 finalizer — a bijection on uint64 (public domain, Steele
    et al. 'Fast splittable pseudorandom number generators', OOPSLA'14)."""
    with np.errstate(over="ignore"):
        x = np.asarray(x, dtype=U64)
        x = x + _SPLITMIX_C1
        x = (x ^ (x >> U64(30))) * _SPLITMIX_C2
        x = (x ^ (x >> U64(27))) * _SPLITMIX_C3
        return x ^ (x >> U64(31))


def blake2b64(data: bytes) -> int:
    """First 8 bytes (little-endian) of keyless blake2b — platform-stable."""
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")


def doc_key(repo: str, path: str, commit: str) -> int:
    """Surrogate uint64 document key (config v2; see nise_ray.config)."""
    return blake2b64(repo.encode() + b"\x00" + path.encode() + b"\x00" + commit.encode())


def sha256_hex(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


def poly_fold(mat: np.ndarray) -> np.ndarray:
    """Fold the last axis of a uint64 array with acc = acc*C + v, then
    splitmix64-finalize. Vectorized over all leading axes."""
    mat = np.asarray(mat, dtype=U64)
    acc = np.zeros(mat.shape[:-1], dtype=U64)
    for j in range(mat.shape[-1]):
        acc = acc * _POLY_C + mat[..., j]
    return splitmix64(acc)


def rolling_poly_hash(data: np.ndarray, k: int) -> np.ndarray:
    """Hash of every k-gram of `data` (uint64 view), bit-identical to
    ``poly_fold(sliding_window_view(data, k))`` but computed with
    logarithmic doubling: h_2s(i) = h_s(i) * C^s + h_s(i+s), so log2(k)
    vectorized passes instead of k. Requires power-of-two k."""
    assert k & (k - 1) == 0, "rolling_poly_hash requires power-of-two k"
    with np.errstate(over="ignore"):
        h = np.asarray(data, dtype=U64).copy()
        span = 1
        mult = _POLY_C
        while span < k:
            h = h[:-span] * mult + h[span:]
            mult = mult * mult
            span *= 2
    return splitmix64(h)


def sliding_min(h: np.ndarray, w: int) -> np.ndarray:
    """Minimum of every length-``w`` window of ``h`` — bit-identical to
    ``sliding_window_view(h, w).min(axis=1)`` but O(n) instead of O(n*w)
    (van Herk / Gil-Werman two-pass block min: prefix mins and suffix
    mins within w-aligned blocks; the window starting at i is the min of
    the suffix min at i and the prefix min at i+w-1). At the winnowing
    config (w=37) this replaces 37 reads per element with 3 passes."""
    n = len(h)
    if w <= 1:
        return h.copy()
    if n <= w:
        return h.min(keepdims=True) if n else h.copy()
    m = n - w + 1
    nb = -(-n // w)
    pad = nb * w - n
    if pad:
        fill = np.iinfo(h.dtype).max if np.issubdtype(h.dtype, np.integer) \
            else np.inf
        hp = np.concatenate([h, np.full(pad, fill, dtype=h.dtype)])
    else:
        hp = h
    blocks = hp.reshape(nb, w)
    left = np.minimum.accumulate(blocks, axis=1).reshape(-1)
    right = np.minimum.accumulate(blocks[:, ::-1], axis=1)[:, ::-1] \
        .reshape(-1)[:n]
    return np.minimum(right[:m], left[w - 1:w - 1 + m])


def minhash_seeds(k: int, seed: int) -> np.ndarray:
    """K permutation seeds drawn from PCG64(seed) — draw order fixed."""
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 2**64, size=k, dtype=U64)


EMPTY_SIG_VALUE = np.uint32(0xFFFFFFFF)


def minhash_signatures(
    shingles: np.ndarray, offsets: np.ndarray, seeds: np.ndarray, chunk: int = 16
) -> np.ndarray:
    """MinHash signatures for D docs given their concatenated shingle hashes.

    shingles : uint64[M]  — all docs' shingle hashes, concatenated
    offsets  : int64[D+1] — doc d owns shingles[offsets[d]:offsets[d+1]]
    seeds    : uint64[K]
    returns  : uint32[D, K]; empty docs get EMPTY_SIG_VALUE everywhere.

    h_i(x) = splitmix64(x ^ seed_i) >> 32  (a permutation of uint64,
    truncated to its high 32 bits for storage). Computed in K-chunks to
    bound the M x chunk intermediate, with per-doc mins via
    np.minimum.reduceat (no Python loop over docs or shingles).
    """
    shingles = np.asarray(shingles, dtype=U64)
    offsets = np.asarray(offsets, dtype=np.int64)
    d = len(offsets) - 1
    k = len(seeds)
    out = np.full((d, k), EMPTY_SIG_VALUE, dtype=np.uint32)
    if len(shingles) == 0 or d == 0:
        return out
    lengths = np.diff(offsets)
    nonempty = np.flatnonzero(lengths > 0)
    if len(nonempty) == 0:
        return out
    # reduceat over only non-empty segments (equal adjacent indices would
    # otherwise yield garbage rows for empty docs)
    starts = offsets[nonempty]
    for c0 in range(0, k, chunk):
        s = seeds[c0 : c0 + chunk]
        mat = splitmix64(shingles[:, None] ^ s[None, :])  # M x c
        h32 = (mat >> U64(32)).astype(np.uint32)
        mins = np.minimum.reduceat(h32, starts, axis=0)
        out[nonempty, c0 : c0 + len(s)] = mins
    return out


def oph_signatures(shingles: np.ndarray, offsets: np.ndarray, k: int,
                   seed_val: int) -> np.ndarray:
    """One-Permutation-Hashing MinHash (Li/Owen/Zhang NIPS'12) with
    rotation densification (Shrivastava & Li, ICML'14).

    One splitmix64 pass over all shingles; low bits pick the bucket
    (k must be a power of two), high 32 bits are the value; per-(doc,
    bucket) minima via one stable argsort + minimum.reduceat. ~K x less
    hashing work than K independent permutations at comparable estimator
    quality; empty buckets borrow circularly from the next filled bucket.
    Empty docs get EMPTY_SIG_VALUE everywhere.
    """
    shingles = np.asarray(shingles, dtype=U64)
    offsets = np.asarray(offsets, dtype=np.int64)
    d = len(offsets) - 1
    assert k & (k - 1) == 0, "oph requires power-of-two K"
    out = np.full((d, k), EMPTY_SIG_VALUE, dtype=np.uint32)
    m = len(shingles)
    if m == 0 or d == 0:
        return out
    mixed = splitmix64(shingles ^ U64(seed_val))
    bucket = (mixed & U64(k - 1)).astype(np.int64)
    value = (mixed >> U64(32)).astype(np.uint32)
    doc_idx = np.repeat(np.arange(d, dtype=np.int64), np.diff(offsets))
    combined = doc_idx * k + bucket
    order = np.argsort(combined, kind="stable")
    sc = combined[order]
    starts = np.flatnonzero(np.diff(sc, prepend=sc[0] - 1))
    mins = np.minimum.reduceat(value[order], starts)
    out.ravel()[sc[starts]] = mins

    # rotation densification: empty buckets take the value of the next
    # filled bucket (circular), vectorized across docs
    lengths = np.diff(offsets)
    nonempty_docs = lengths > 0
    sig = out[nonempty_docs]
    empty = sig == EMPTY_SIG_VALUE
    shift = 1
    while empty.any() and shift < k:
        rolled = np.roll(sig, -shift, axis=1)
        fill = empty & (rolled != EMPTY_SIG_VALUE)
        sig[fill] = rolled[fill]
        empty &= ~fill
        shift += 1
    out[nonempty_docs] = sig
    return out


def band_keys(sigs: np.ndarray, bands: int, rows_per_band: int) -> np.ndarray:
    """Per-doc LSH band keys: uint64[D, bands].

    key[d, b] = splitmix64( poly_fold(sig[d, b*r:(b+1)*r]) ^ splitmix64(b) ).
    """
    d, k = sigs.shape
    assert k == bands * rows_per_band
    grouped = sigs.reshape(d, bands, rows_per_band).astype(U64)
    folded = poly_fold(grouped)  # D x bands
    band_salt = splitmix64(np.arange(bands, dtype=U64))
    return splitmix64(folded ^ band_salt[None, :])


def simhash_from_shingles(shingles: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """64-bit SimHash per doc from unique shingle hashes (weight 1 each).

    Bit j of the fingerprint is 1 iff more than half the doc's shingle
    hashes have bit j set (Charikar STOC'02). Empty docs get 0.
    """
    shingles = np.asarray(shingles, dtype=U64)
    offsets = np.asarray(offsets, dtype=np.int64)
    d = len(offsets) - 1
    out = np.zeros(d, dtype=U64)
    if len(shingles) == 0 or d == 0:
        return out
    lengths = np.diff(offsets)
    nonempty = np.flatnonzero(lengths > 0)
    if len(nonempty) == 0:
        return out
    # Per-byte processing: expand only 8 bit columns at a time (M x 8
    # uint8, ~M*8 bytes peak) and accumulate in int32 straight from uint8.
    # A full M x 64 bit matrix (plus an int32 astype) allocates ~40x more
    # and collapses under many concurrent workers (allocation/page churn).
    le_bytes = shingles.astype("<u8").view(np.uint8).reshape(-1, 8)
    starts = offsets[nonempty]
    counts = np.empty((len(nonempty), 64), dtype=np.int32)
    for byte in range(8):
        bb = np.unpackbits(le_bytes[:, byte, None], axis=1, bitorder="little")
        counts[:, byte * 8:(byte + 1) * 8] = np.add.reduceat(
            bb, starts, axis=0, dtype=np.int32)
    maj = (2 * counts > lengths[nonempty, None]).astype(np.uint8)  # D' x 64
    packed = np.packbits(maj, axis=1, bitorder="little")  # D' x 8 bytes
    out[nonempty] = packed.copy().view("<u8").ravel().astype(U64)
    return out


def simhash_block_keys(simhash: np.ndarray, blocks: int = 4) -> np.ndarray:
    """Manku block keys: uint64[D, blocks]; key = splitmix64(block_bits ^
    splitmix64(block_id + 0xB10C)). With 4 x 16-bit blocks, any pair at
    Hamming distance <= 3 shares at least one identical block."""
    simhash = np.asarray(simhash, dtype=U64)
    width = U64(64 // blocks)
    mask = (U64(1) << width) - U64(1)
    ids = np.arange(blocks, dtype=U64)
    salts = splitmix64(ids + U64(0xB10C))
    blocks_vals = (simhash[:, None] >> (ids[None, :] * width)) & mask
    return splitmix64(blocks_vals ^ salts[None, :])


_POPCOUNT_TABLE = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise Hamming distance between uint64 arrays (broadcasting)."""
    x = (np.asarray(a, dtype=U64) ^ np.asarray(b, dtype=U64))
    dist = np.zeros(x.shape, dtype=np.int64)
    for _ in range(8):
        dist += _POPCOUNT_TABLE[(x & U64(0xFF)).astype(np.uint8)]
        x = x >> U64(8)
    return dist
