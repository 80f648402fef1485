"""Unified candidate shuffle — all three edge branches through ONE
hash-partitioned exchange.

Separate exact / band / block shuffle operators each spawn their own
aggregator fleet and contend for CPU (measured: 4 concurrent shuffle ops
ran ~4x slower than their isolated sum). Instead, one batch-native explode
emits every branch's rows with a common schema:

    key      uint64   sha64^salt_exact | band_key (salted) | block_key^salt
    src      uint8    0=exact, 1=minhash band, 2=simhash block
    doc_key  uint64
    sha64    uint64
    sha_rest binary   (exact rows only — digest bytes 8..32, so sha64 +
                       sha_rest = the FULL sha256; variable-width binary
                       costs only the 4B offset on non-exact rows)
    simhash  uint64
    minhash  fixed_size_binary(4K)

then ONE repartition(keys=["key"]) + one vectorized dispatch fn generates
all verified edges. Src-specific salts keep the three key spaces disjoint
(a cross-src collision needs a 64-bit match — negligible, and verification
still guards semantics).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from nise_ray.config import DedupConfig
from nise_ray.hashing import U64, band_keys, simhash_block_keys, splitmix64
from nise_ray.ops.lsh import _bucket_edges, empty_edges, sig_matrix
from nise_ray.ops.simhash_stage import _simhash_bucket_edges

_EXACT_SALT = splitmix64(np.uint64(0xE7AC7))
_BLOCK_SALT = splitmix64(np.uint64(0xB10C5))

SRC_EXACT, SRC_BAND, SRC_BLOCK = 0, 1, 2


def explode_unified(batch: pa.Table, cfg: DedupConfig,
                    carry_sigs: bool = True) -> pa.Table:
    """signed rows -> exact + band + block candidate rows (one operator).

    carry_sigs=False omits the 4K-byte minhash column from the exchange
    (16 bands x 512B per doc is ~90% of the shuffle volume); pairs are
    then emitted unverified and a post-verification stage attaches the
    estimated Jaccard from a broadcast signature map."""
    n = batch.num_rows
    doc_key = batch.column("doc_key").to_numpy(zero_copy_only=False).astype(U64)
    sha64 = batch.column("sha64").to_numpy(zero_copy_only=False).astype(U64)
    simhash = batch.column("simhash").to_numpy(zero_copy_only=False).astype(U64)
    n_sh = batch.column("n_shingles").to_numpy(zero_copy_only=False)
    mh = batch.column("minhash").combine_chunks()

    keys: list[np.ndarray] = []
    srcs: list[np.ndarray] = []
    idx: list[np.ndarray] = []
    hex_mask: list[bool] = []
    sha_rest: pa.Array | None = None

    # exact rows: every doc, keyed by (salted) sha64
    if cfg.exact_enabled:
        keys.append(splitmix64(sha64 ^ _EXACT_SALT))
        srcs.append(np.full(n, SRC_EXACT, dtype=np.uint8))
        idx.append(np.arange(n))
        hex_mask.append(True)
        # digest bytes 8..32 sliced zero-copy from the fixed_size_binary
        # sha column — no per-row Python on the corpus-width explode
        from nise_ray.util import fsb_bytes
        rest = np.ascontiguousarray(
            fsb_bytes(batch.column("content_sha256"), 32)[:, 8:])
        rest_offsets = np.arange(0, 24 * (n + 1), 24, dtype=np.int32)
        sha_rest = pa.Array.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(rest_offsets.tobytes()),
             pa.py_buffer(rest.tobytes())])

    lsh_rows = np.flatnonzero(n_sh >= cfg.min_shingles)
    if cfg.minhash_enabled and len(lsh_rows):
        sigs = sig_matrix(mh, cfg.minhash_k)[lsh_rows]
        bkeys = band_keys(sigs, cfg.bands, cfg.rows_per_band)  # m x bands
        b = cfg.bands
        rep = np.repeat(lsh_rows, b)
        flat = bkeys.ravel()
        if cfg.salt_shards > 1:
            salt = splitmix64(doc_key[rep] ^ flat) % U64(cfg.salt_shards)
            flat = splitmix64(flat * U64(0x9E3779B97F4A7C15) + salt)
        keys.append(flat)
        srcs.append(np.full(len(rep), SRC_BAND, dtype=np.uint8))
        idx.append(rep)
        hex_mask.append(False)

    if cfg.simhash_enabled and len(lsh_rows):
        blocks = simhash_block_keys(simhash[lsh_rows], cfg.simhash_blocks)
        rep = np.repeat(lsh_rows, cfg.simhash_blocks)
        keys.append(splitmix64(blocks.ravel() ^ _BLOCK_SALT))
        srcs.append(np.full(len(rep), SRC_BLOCK, dtype=np.uint8))
        idx.append(rep)
        hex_mask.append(False)

    fields = [
        ("key", pa.uint64()), ("src", pa.uint8()), ("doc_key", pa.uint64()),
        ("sha64", pa.uint64()), ("sha_rest", pa.binary()),
        ("simhash", pa.uint64()),
    ]
    if carry_sigs:
        fields.append(("minhash",
                       pa.binary(cfg.sig_value_bytes * cfg.minhash_k)))
    schema = pa.schema(fields)
    if not keys:
        return schema.empty_table()
    all_idx = np.concatenate(idx)
    # sha_rest only on exact rows (null elsewhere -> offsets-only storage)
    rest_cols = []
    for m, rows in zip(hex_mask, idx):
        rest_cols.append(sha_rest.take(pa.array(rows)) if m
                         else pa.nulls(len(rows), pa.binary()))
    cols = {
        "key": pa.array(np.concatenate(keys), pa.uint64()),
        "src": pa.array(np.concatenate(srcs), pa.uint8()),
        "doc_key": pa.array(doc_key[all_idx], pa.uint64()),
        "sha64": pa.array(sha64[all_idx], pa.uint64()),
        "sha_rest": pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                                      for c in rest_cols]),
        "simhash": pa.array(simhash[all_idx], pa.uint64()),
    }
    if carry_sigs:
        cols["minhash"] = mh.take(pa.array(all_idx))
    return pa.table(cols, schema=schema)


def _dedupe_keys_by_sha(doc_keys: np.ndarray, sha64: np.ndarray,
                        extra: np.ndarray | None = None):
    order = np.lexsort((doc_keys, sha64))
    first = np.ones(len(order), dtype=bool)
    first[1:] = sha64[order][1:] != sha64[order][:-1]
    keep = np.sort(order[first])
    return (doc_keys[keep], extra[keep] if extra is not None else None)


def _unverified_bucket_pairs(doc_keys: np.ndarray, sha64: np.ndarray, cap: int):
    """Candidate pairs without inline verification (sha-deduped; buckets
    over `cap` fall back to chunked cliques + star-to-min, like the
    verified path but with verification deferred)."""
    doc_keys, _ = _dedupe_keys_by_sha(doc_keys, sha64)
    m = len(doc_keys)
    if m < 2:
        return None
    doc_keys = np.sort(doc_keys)
    if m <= cap:
        ii, jj = np.triu_indices(m, k=1)
        return doc_keys[ii], doc_keys[jj]
    us, vs = [], []
    for c0 in range(0, m, cap):
        chunk = doc_keys[c0 : c0 + cap]
        ii, jj = np.triu_indices(len(chunk), k=1)
        us.append(chunk[ii]); vs.append(chunk[jj])
        if c0 > 0:
            us.append(doc_keys[:1]); vs.append(chunk[:1])
    return np.concatenate(us), np.concatenate(vs)


def _exact_star_edges(doc_keys: np.ndarray, sha64: np.ndarray,
                      sha_rest: pa.Array) -> "tuple[np.ndarray, np.ndarray] | None":
    """Block-wide vectorized exact dedup: group the block's exact rows by
    the FULL sha256 (sha64 + the 24-byte tail viewed as 3 uint64 words),
    one lexsort + run detection — zero per-group Python. Correct because
    equal digests imply equal shuffle keys, so every full group is
    co-located in this block."""
    m = len(doc_keys)
    if m < 2:
        return None
    if isinstance(sha_rest, pa.ChunkedArray):
        sha_rest = sha_rest.combine_chunks()
    # vectorized gather of the 24 digest-tail bytes per row straight from
    # the Arrow buffers (rows all 24B but offsets may be non-contiguous
    # after take) — no per-row Python
    off_all = np.frombuffer(sha_rest.buffers()[1], dtype=np.int32)
    off = off_all[sha_rest.offset:sha_rest.offset + m].astype(np.int64)
    data = np.frombuffer(sha_rest.buffers()[2], dtype=np.uint8)
    words = data[off[:, None] + np.arange(24, dtype=np.int64)[None, :]] \
        .view("<u8")
    order = np.lexsort((doc_keys, words[:, 2], words[:, 1], words[:, 0], sha64))
    s0 = sha64[order]
    w = words[order]
    change = np.empty(m, dtype=bool)
    change[0] = True
    change[1:] = ((s0[1:] != s0[:-1]) | (w[1:, 0] != w[:-1, 0])
                  | (w[1:, 1] != w[:-1, 1]) | (w[1:, 2] != w[:-1, 2]))
    starts = np.flatnonzero(change)
    counts = np.diff(np.append(starts, m))
    if not (counts >= 2).any():
        return None
    dks = doc_keys[order]
    member_mask = np.ones(m, dtype=bool)
    member_mask[starts] = False
    # doc_key is the last lexsort key, so dks[starts] is each run's min
    u = np.repeat(dks[starts], counts - 1)
    v = dks[member_mask]
    return u, v


def make_unified_pair_gen(cfg: DedupConfig, verify: bool = True):
    """One dispatch fn for the unified shuffle: per segment, run the
    src-appropriate pair generator (vectorized inside).

    verify=False (post-verification mode): band pairs are emitted with
    est=-1 and checked later against the broadcast signature map; simhash
    pairs are still Hamming-filtered (the fingerprint rides along, 8B)."""
    from nise_ray.ops.groupapply import segments
    tau, cap, k, hk = cfg.tau, cfg.bucket_cap, cfg.minhash_k, cfg.simhash_hamming_k

    def batch_fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty_edges()
        keys = batch.column("key").to_numpy(zero_copy_only=False)
        starts, counts = segments(keys)
        multi = counts >= 2
        if not multi.any():
            return empty_edges()
        src = batch.column("src").to_numpy(zero_copy_only=False)
        doc_keys = batch.column("doc_key").to_numpy(zero_copy_only=False).astype(U64)
        sha64 = batch.column("sha64").to_numpy(zero_copy_only=False).astype(U64)
        simhash = batch.column("simhash").to_numpy(zero_copy_only=False).astype(U64)
        sigs = (sig_matrix(batch.column("minhash"), k)
                if "minhash" in batch.column_names else None)
        parts: list[pa.Table] = []
        cand_us: list[np.ndarray] = []
        cand_vs: list[np.ndarray] = []
        cand_src: list[str] = []
        exact_us: list[np.ndarray] = []
        exact_vs: list[np.ndarray] = []
        from nise_ray.ops.lsh import edges_table
        # exact rows: handled block-wide in ONE vectorized pass (their
        # key is a pure function of sha64, so groups are co-located)
        ex_rows = np.flatnonzero(src == SRC_EXACT)
        if len(ex_rows) >= 2:
            pair = _exact_star_edges(
                doc_keys[ex_rows], sha64[ex_rows],
                batch.column("sha_rest").take(pa.array(ex_rows)))
            if pair is not None:
                exact_us.append(pair[0])
                exact_vs.append(pair[1])
        for s, c in zip(starts[multi], counts[multi]):
            s0 = src[s]
            if s0 == SRC_EXACT:
                pass  # handled block-wide above
            elif s0 == SRC_BAND:
                if verify:
                    parts.extend(_bucket_edges(doc_keys[s:s + c], sha64[s:s + c],
                                               sigs[s:s + c], tau, cap, k,
                                               "minhash"))
                else:
                    pair = _unverified_bucket_pairs(doc_keys[s:s + c],
                                                    sha64[s:s + c], cap)
                    if pair is not None:
                        cand_us.append(pair[0]); cand_vs.append(pair[1])
                        cand_src.append("minhash")
            else:
                if verify:
                    parts.extend(_simhash_bucket_edges(
                        doc_keys[s:s + c], sha64[s:s + c], sigs[s:s + c],
                        simhash[s:s + c], tau, cap, k, hk))
                else:
                    dk, sh = _dedupe_keys_by_sha(doc_keys[s:s + c],
                                                 sha64[s:s + c],
                                                 simhash[s:s + c])
                    m = len(dk)
                    if m < 2:
                        continue
                    if m > cap:
                        order = np.argsort(dk)[:cap]
                        order.sort()
                        dk, sh = dk[order], sh[order]
                        m = cap
                    from nise_ray.hashing import hamming64
                    for b0 in range(0, m - 1, 256):
                        blk = sh[b0 : b0 + 256]
                        dist = hamming64(blk[:, None], sh[None, :])
                        ii, jj = np.nonzero(dist <= hk)
                        gi = ii + b0
                        msk = gi < jj
                        if msk.any():
                            cand_us.append(dk[gi[msk]]); cand_vs.append(dk[jj[msk]])
                            cand_src.append("simhash")
        if exact_us:
            u = np.concatenate(exact_us)
            v = np.concatenate(exact_vs)
            parts.append(edges_table(u, v, np.ones(len(u), dtype=np.float32),
                                     "exact"))
        if cand_us:
            # ONE edges_table per src (not per bucket): thousands of tiny
            # tables per block fragment every downstream consumer
            for sname in ("minhash", "simhash"):
                sel = [i for i, s in enumerate(cand_src) if s == sname]
                if not sel:
                    continue
                u = np.concatenate([cand_us[i] for i in sel])
                v = np.concatenate([cand_vs[i] for i in sel])
                parts.append(edges_table(
                    u, v, np.full(len(u), -1.0, np.float32), sname))
        if not parts:
            return empty_edges()
        # thousands of per-bucket part tables -> ONE contiguous table;
        # without this every downstream consumer (shuffle, collect,
        # ray.get) pays per-chunk serialization overhead (measured
        # ~1.5 MB/s effective on 100k-chunk columns vs >100 MB/s flat)
        return pa.concat_tables(parts).combine_chunks()

    return batch_fn


def broadcast_sig_map(signed, k: int, needed_keys: np.ndarray | None = None):
    """Build the (doc_key -> minhash) verification map and ray.put it ONCE.

    When ``needed_keys`` is given (sorted uint64), only those docs'
    signatures are collected — the map then scales with the CANDIDATE PAIR
    count, not the corpus (a distributed filter pass runs over the signed
    table and only matching rows reach the driver). Falls back to the full
    map otherwise. Pipeline gates this path on cfg.broadcast_label_max;
    beyond it the carried-signature inline verify is used instead."""
    import ray

    from nise_ray.util import collect_table

    src = signed.select_columns(["doc_key", "minhash"])
    if needed_keys is not None and len(needed_keys):
        needed_ref = ray.put(np.sort(np.asarray(needed_keys, dtype=U64)))

        # task-path closure: per-task state is one zero-copy plasma read
        # of the broadcast key array — no actor-pool cold start
        def needed_filter(b: pa.Table) -> pa.Table:
            needed = ray.get(needed_ref)
            dk = b.column("doc_key").to_numpy(zero_copy_only=False).astype(U64)
            pos = np.clip(np.searchsorted(needed, dk), 0, len(needed) - 1)
            return b.filter(pa.array(needed[pos] == dk))

        needed_filter.__name__ = "NeededFilter"
        src = src.map_batches(needed_filter, batch_format="pyarrow",
                              zero_copy_batch=True)
    t = collect_table(src)
    keys = t.column("doc_key").to_numpy(zero_copy_only=False).astype(U64)
    sigs = sig_matrix(t.column("minhash"), k)
    order = np.argsort(keys)
    return ray.put((keys[order], np.ascontiguousarray(sigs[order])))


def join_verify(pairs, signed, cfg: DedupConfig, num_partitions: int = 64):
    """Fully distributed verification: two hash joins attach both
    endpoints' signatures to each (u, v) pair, then a vectorized filter
    keeps est >= tau. No driver collection, no broadcast — the correct
    path when even the needed-keys sig map exceeds the object store
    (10^10+ candidate pairs at 10^12-file scale)."""
    import ray  # noqa: F401

    sigs = signed.select_columns(["doc_key", "minhash"])
    k = cfg.minhash_k
    tau = cfg.tau

    j1 = pairs.join(sigs, join_type="inner", num_partitions=num_partitions,
                    on=("u",), right_on=("doc_key",), right_suffix="_u")
    j2 = j1.join(sigs, join_type="inner", num_partitions=num_partitions,
                 on=("v",), right_on=("doc_key",), right_suffix="_v")

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty_edges()
        cols = batch.column_names
        mh_u = next(c for c in cols if c.startswith("minhash") and c != "minhash_v")
        sig_u = sig_matrix(batch.column(mh_u), k)
        sig_v = sig_matrix(batch.column("minhash_v"), k)
        est = batch.column("est").to_numpy(zero_copy_only=False).copy()
        need = est < 0
        if need.any():
            match = (sig_u[need] == sig_v[need]).sum(axis=1)
            est[need] = match.astype(np.float32) / np.float32(k)
        out = pa.table({
            "u": batch.column("u"),
            "v": batch.column("v"),
            "est": pa.array(est.astype(np.float32), pa.float32()),
            "src": batch.column("src"),
        })
        return out.filter(pa.array(est >= tau))

    return j2.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)


def make_sig_verifier(ref, cfg: DedupConfig):
    """map_batches class: attach estimated Jaccard to (u, v) pairs from the
    broadcast signature map; drop non-exact pairs below tau."""
    import ray
    tau = cfg.tau
    k = cfg.minhash_k

    class Verifier:
        def __init__(self) -> None:
            self.keys, self.sigs = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch
            u = batch.column("u").to_numpy(zero_copy_only=False).astype(U64)
            v = batch.column("v").to_numpy(zero_copy_only=False).astype(U64)
            est = batch.column("est").to_numpy(zero_copy_only=False).copy()
            need = est < 0
            if need.any():
                iu = np.searchsorted(self.keys, u[need])
                iv = np.searchsorted(self.keys, v[need])
                iu = np.clip(iu, 0, len(self.keys) - 1)
                iv = np.clip(iv, 0, len(self.keys) - 1)
                ok = (self.keys[iu] == u[need]) & (self.keys[iv] == v[need])
                match = (self.sigs[iu] == self.sigs[iv]).sum(axis=1)
                est_new = np.where(ok, match.astype(np.float32) / np.float32(k),
                                   np.float32(0.0))
                est[need] = est_new
            keep = est >= tau
            out = batch.set_column(batch.schema.get_field_index("est"), "est",
                                   pa.array(est.astype(np.float32), pa.float32()))
            return out.filter(pa.array(keep))

    return Verifier
