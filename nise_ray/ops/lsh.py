"""Stages C/D — LSH band explode and per-bucket candidate generation.

Band explode is a batch-native flat_map: each signed row becomes `bands`
rows keyed by its band hash. Candidate pairs are generated inside
``groupby(band_key).map_groups`` — the distributed equivalent of the
reference's in-memory band hash tables (the bucket's member table exists
only within its shuffle group).

Verification is INLINE: the MinHash signature rides along through the
explode, so each bucket verifies its own candidate pairs (estimated
Jaccard >= tau) with vectorized signature-overlap counts, and no
signature-fetch join is needed afterwards. Pair dedup across bands happens
downstream on (u, v).

Skew handling (north-rule "salted keys for popular repos/boilerplate"):
  1. bucket members are deduplicated by sha64 first — exact clones
     (the dominant skew source) collapse to one member per content, their
     connectivity preserved by the exact stage's edges;
  2. residual buckets larger than ``bucket_cap`` are sorted by doc_key and
     chunked; full pairwise generation within each chunk plus verified
     star edges chunk-min -> bucket-min (O(m) edges instead of O(m^2),
     cluster-connectivity-preserving approximation, SURVEY.md §5);
  3. optional two-phase salted shuffle (``salt_shards > 1``): the explode
     key becomes hash(band_key, salt(doc_key)) so no single group exceeds
     ~1/S of a hot bucket; phase 1 emits per-shard edges + one rep row per
     shard, phase 2 connects shard reps with a second (tiny) groupby on the
     unsalted band_key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from nise_ray.config import DedupConfig
from nise_ray.hashing import U64, band_keys, splitmix64

EDGE_SCHEMA = pa.schema([
    ("u", pa.uint64()),
    ("v", pa.uint64()),
    ("est", pa.float32()),
    ("src", pa.string()),
])


def empty_edges() -> pa.Table:
    return EDGE_SCHEMA.empty_table()


def edges_table(u: np.ndarray, v: np.ndarray, est: np.ndarray, src: str) -> pa.Table:
    lo = np.minimum(u, v)
    hi = np.maximum(u, v)
    return pa.table({
        "u": pa.array(lo, pa.uint64()),
        "v": pa.array(hi, pa.uint64()),
        "est": pa.array(est.astype(np.float32), pa.float32()),
        "src": pa.array(np.full(len(lo), src), pa.string()),
    })


def sig_matrix(col: pa.ChunkedArray | pa.Array, k: int) -> np.ndarray:
    """Zero-copy view of a fixed_size_binary(b*k) column as uintB[n, k];
    the per-slot width (uint32 or uint16) is inferred from the column's
    byte width (cfg.sig_value_bytes)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    width = col.type.byte_width // k
    dtype = "<u2" if width == 2 else "<u4"
    if len(col) == 0:
        return np.empty((0, k), dtype=np.dtype(dtype))
    buf = col.buffers()[1]
    a = np.frombuffer(buf, dtype=dtype)
    start = col.offset * k
    return a[start : start + len(col) * k].reshape(len(col), k)


def explode_bands(batch: pa.Table, cfg: DedupConfig) -> pa.Table:
    """signed rows -> (bkey, band_key, doc_key, sha64, minhash) x bands.

    Rows with fewer than ``min_shingles`` shingles are excluded (they are
    handled by the exact stage only). ``bkey`` is the actual grouping key:
    equal to band_key when salt_shards == 1, else salted.
    """
    n_sh = batch.column("n_shingles").to_numpy(zero_copy_only=False)
    keep = np.flatnonzero(n_sh >= cfg.min_shingles)
    if len(keep) == 0:
        return pa.schema([
            ("bkey", pa.uint64()), ("band_key", pa.uint64()),
            ("doc_key", pa.uint64()), ("sha64", pa.uint64()),
            ("minhash", pa.binary(cfg.sig_value_bytes * cfg.minhash_k)),
        ]).empty_table()
    batch = batch.take(pa.array(keep))
    n = batch.num_rows
    sigs = sig_matrix(batch.column("minhash"), cfg.minhash_k)
    bkeys = band_keys(sigs, cfg.bands, cfg.rows_per_band)  # n x bands u64
    doc_key = batch.column("doc_key").to_numpy(zero_copy_only=False).astype(U64)
    sha64 = batch.column("sha64").to_numpy(zero_copy_only=False).astype(U64)

    b = cfg.bands
    flat_band = bkeys.ravel()
    rep_idx = np.repeat(np.arange(n), b)
    flat_doc = doc_key[rep_idx]
    flat_sha = sha64[rep_idx]
    mh = batch.column("minhash").combine_chunks().take(pa.array(rep_idx))
    if cfg.salt_shards > 1:
        salt = (splitmix64(flat_doc ^ flat_band) % U64(cfg.salt_shards))
        grouping = splitmix64(flat_band * U64(0x9E3779B97F4A7C15) + salt)
    else:
        grouping = flat_band
    return pa.table({
        "bkey": pa.array(grouping, pa.uint64()),
        "band_key": pa.array(flat_band, pa.uint64()),
        "doc_key": pa.array(flat_doc, pa.uint64()),
        "sha64": pa.array(flat_sha, pa.uint64()),
        "minhash": mh,
    })


def _dedupe_by_sha(doc_keys: np.ndarray, sha64: np.ndarray, sigs: np.ndarray):
    """One member per distinct content (min doc_key wins); exact-stage edges
    keep the dropped members connected."""
    order = np.lexsort((doc_keys, sha64))
    s_sorted = sha64[order]
    first = np.ones(len(order), dtype=bool)
    first[1:] = s_sorted[1:] != s_sorted[:-1]
    keep = order[first]
    keep.sort()
    return doc_keys[keep], sigs[keep]


def _pairwise_verified(doc_keys, sigs, tau, k, src, row_chunk=256):
    """All pairs (i<j) with estimated Jaccard >= tau; vectorized, chunked."""
    m = len(doc_keys)
    out = []
    for s0 in range(0, m - 1, row_chunk):
        block = sigs[s0 : s0 + row_chunk]
        eq = (block[:, None, :] == sigs[None, :, :]).sum(axis=2, dtype=np.int32)
        est = eq.astype(np.float32) / np.float32(k)
        ii, jj = np.nonzero(est >= tau)
        gi = ii + s0
        keep = gi < jj
        if keep.any():
            gi_k, jj_k, ii_k = gi[keep], jj[keep], ii[keep]
            out.append(edges_table(doc_keys[gi_k], doc_keys[jj_k],
                                   est[ii_k, jj_k], src))
    return out


def _estimate(sig_a: np.ndarray, sig_b: np.ndarray, k: int) -> np.float32:
    return np.float32((sig_a == sig_b).sum() / k)


def _bucket_edges(doc_keys: np.ndarray, sha64: np.ndarray, sigs: np.ndarray,
                  tau: float, cap: int, k: int, src: str) -> list[pa.Table]:
    """Verified edges for ONE bucket (sha-dedup, cap + star chunking)."""
    doc_keys, sigs = _dedupe_by_sha(doc_keys, sha64, sigs)
    m = len(doc_keys)
    if m < 2:
        return []
    if m <= cap:
        return _pairwise_verified(doc_keys, sigs, tau, k, src)
    order = np.argsort(doc_keys)
    doc_keys, sigs = doc_keys[order], sigs[order]
    parts: list[pa.Table] = []
    for c0 in range(0, m, cap):
        dk = doc_keys[c0 : c0 + cap]
        sg = sigs[c0 : c0 + cap]
        parts.extend(_pairwise_verified(dk, sg, tau, k, src))
        if c0 > 0:
            est = _estimate(sigs[0], sg[0], k)
            if est >= tau:
                parts.append(edges_table(
                    np.array([doc_keys[0]]), np.array([dk[0]]),
                    np.array([est]), src))
    return parts


def make_pair_gen(cfg: DedupConfig, src: str = "minhash"):
    """Per-group fn: one band bucket -> verified candidate-pair edges."""
    tau, cap, k = cfg.tau, cfg.bucket_cap, cfg.minhash_k

    def pair_gen(group: pa.Table) -> pa.Table:
        doc_keys = group.column("doc_key").to_numpy(zero_copy_only=False).astype(U64)
        sha64 = group.column("sha64").to_numpy(zero_copy_only=False).astype(U64)
        sigs = sig_matrix(group.column("minhash"), k)
        parts = _bucket_edges(doc_keys, sha64, sigs, tau, cap, k, src)
        if not parts:
            return empty_edges()
        return pa.concat_tables(parts).combine_chunks()

    return pair_gen


def make_batch_pair_gen(cfg: DedupConfig, src: str = "minhash",
                        key_col: str = "bkey"):
    """Block-level fn for hash_group_apply: the batch is sorted by key_col
    and contains complete buckets; singleton buckets (the vast majority)
    are skipped in one vectorized mask."""
    from nise_ray.ops.groupapply import segments
    tau, cap, k = cfg.tau, cfg.bucket_cap, cfg.minhash_k

    def batch_fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty_edges()
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        starts, counts = segments(keys)
        multi = counts >= 2
        if not multi.any():
            return empty_edges()
        doc_keys = batch.column("doc_key").to_numpy(zero_copy_only=False).astype(U64)
        sha64 = batch.column("sha64").to_numpy(zero_copy_only=False).astype(U64)
        sigs = sig_matrix(batch.column("minhash"), k)
        parts: list[pa.Table] = []
        for s, c in zip(starts[multi], counts[multi]):
            parts.extend(_bucket_edges(doc_keys[s:s + c], sha64[s:s + c],
                                       sigs[s:s + c], tau, cap, k, src))
        if not parts:
            return empty_edges()
        return pa.concat_tables(parts).combine_chunks()

    return batch_fn


def make_batch_salted_pair_gen(cfg: DedupConfig, src: str = "minhash"):
    """Phase-1 block fn for the salted path: per (band_key, salt) shard,
    verified within-shard edges + one rep row per shard (vectorized rep
    selection: first row of each segment after (key, doc_key) lexsort)."""
    from nise_ray.ops.groupapply import segments
    tau, cap, k = cfg.tau, cfg.bucket_cap, cfg.minhash_k
    kb = cfg.sig_value_bytes * k

    def batch_fn(batch: pa.Table) -> pa.Table:
        rep_schema_cols = ["band_key", "doc_key", "sha64", "minhash"]
        if batch.num_rows == 0:
            return pa.table({
                "is_rep": pa.array([], pa.bool_()),
                "u": pa.array([], pa.uint64()), "v": pa.array([], pa.uint64()),
                "est": pa.array([], pa.float32()), "src": pa.array([], pa.string()),
                "band_key": pa.array([], pa.uint64()),
                "doc_key": pa.array([], pa.uint64()),
                "sha64": pa.array([], pa.uint64()),
                "minhash": pa.array([], pa.binary(kb)),
            })
        keys = batch.column("bkey").to_numpy(zero_copy_only=False)
        doc_keys = batch.column("doc_key").to_numpy(zero_copy_only=False).astype(U64)
        sha64 = batch.column("sha64").to_numpy(zero_copy_only=False).astype(U64)
        sigs = sig_matrix(batch.column("minhash"), k)
        # re-sort by (key, doc_key) so each segment's first row is its rep
        order = np.lexsort((doc_keys, keys))
        keys, doc_keys, sha64, sigs = keys[order], doc_keys[order], sha64[order], sigs[order]
        starts, counts = segments(keys)
        # edges for multi-member shards
        parts: list[pa.Table] = []
        for s, c in zip(starts[counts >= 2], counts[counts >= 2]):
            parts.extend(_bucket_edges(doc_keys[s:s + c], sha64[s:s + c],
                                       sigs[s:s + c], tau, cap, k, src))
        edges = (pa.concat_tables(parts).combine_chunks()
                 if parts else empty_edges())
        # one rep row per shard
        rep_rows = batch.take(pa.array(order[starts]))
        n_e, n_r = edges.num_rows, rep_rows.num_rows
        return pa.table({
            "is_rep": pa.array([False] * n_e + [True] * n_r, pa.bool_()),
            "u": pa.concat_arrays([edges.column("u").combine_chunks(),
                                   pa.nulls(n_r, pa.uint64())]),
            "v": pa.concat_arrays([edges.column("v").combine_chunks(),
                                   pa.nulls(n_r, pa.uint64())]),
            "est": pa.concat_arrays([edges.column("est").combine_chunks(),
                                     pa.nulls(n_r, pa.float32())]),
            "src": pa.concat_arrays([edges.column("src").combine_chunks(),
                                     pa.nulls(n_r, pa.string())]),
            "band_key": pa.concat_arrays([pa.nulls(n_e, pa.uint64()),
                                          rep_rows.column("band_key").combine_chunks()]),
            "doc_key": pa.concat_arrays([pa.nulls(n_e, pa.uint64()),
                                         rep_rows.column("doc_key").combine_chunks()]),
            "sha64": pa.concat_arrays([pa.nulls(n_e, pa.uint64()),
                                       rep_rows.column("sha64").combine_chunks()]),
            "minhash": pa.concat_arrays([pa.nulls(n_e, pa.binary(kb)),
                                         rep_rows.column("minhash").combine_chunks()]),
        })

    return batch_fn


