"""Stage E' — SimHash near-dup branch (Manku block tables).

Shares the signed table's partition layout: a second batch-native explode
emits 4 rows per doc keyed by each 16-bit fingerprint block (any pair at
Hamming distance <= 3 shares at least one identical block — Manku/Jain/
Sarma, WWW'07), then ``groupby(block_key).map_groups`` finds pairs with
Hamming(simhash) <= k and verifies them with the carried MinHash signature
(estimated Jaccard >= tau) so the merged edge set keeps one semantic:
"near-duplicate at the pinned Jaccard threshold".
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from nise_ray.config import DedupConfig
from nise_ray.hashing import U64, hamming64, simhash_block_keys
from nise_ray.ops.lsh import edges_table, empty_edges, sig_matrix


def explode_simhash_blocks(batch: pa.Table, cfg: DedupConfig) -> pa.Table:
    n_sh = batch.column("n_shingles").to_numpy(zero_copy_only=False)
    keep = np.flatnonzero(n_sh >= cfg.min_shingles)
    schema = pa.schema([
        ("block_key", pa.uint64()), ("doc_key", pa.uint64()),
        ("sha64", pa.uint64()), ("simhash", pa.uint64()),
        ("minhash", pa.binary(cfg.sig_value_bytes * cfg.minhash_k)),
    ])
    if len(keep) == 0:
        return schema.empty_table()
    batch = batch.take(pa.array(keep))
    n = batch.num_rows
    simhash = batch.column("simhash").to_numpy(zero_copy_only=False).astype(U64)
    bkeys = simhash_block_keys(simhash, cfg.simhash_blocks)  # n x 4
    b = cfg.simhash_blocks
    rep_idx = np.repeat(np.arange(n), b)
    return pa.table({
        "block_key": pa.array(bkeys.ravel(), pa.uint64()),
        "doc_key": pa.array(
            batch.column("doc_key").to_numpy(zero_copy_only=False)[rep_idx], pa.uint64()),
        "sha64": pa.array(
            batch.column("sha64").to_numpy(zero_copy_only=False)[rep_idx], pa.uint64()),
        "simhash": pa.array(simhash[rep_idx], pa.uint64()),
        "minhash": batch.column("minhash").combine_chunks().take(pa.array(rep_idx)),
    })


def _simhash_bucket_edges(doc_keys, sha64, sigs, simhash, tau, cap, k, hk):
    """Verified edges for one simhash block bucket (arrays pre-sliced)."""
    # dedupe by content, keeping simhash aligned
    order = np.lexsort((doc_keys, sha64))
    first = np.ones(len(order), dtype=bool)
    first[1:] = sha64[order][1:] != sha64[order][:-1]
    keep = np.sort(order[first])
    doc_keys, sigs, simhash = doc_keys[keep], sigs[keep], simhash[keep]
    m = len(doc_keys)
    if m < 2:
        return []
    if m > cap:  # hot block (e.g. simhash==0 degenerate): cap members
        order = np.argsort(doc_keys)[:cap]
        order.sort()
        doc_keys, sigs, simhash = doc_keys[order], sigs[order], simhash[order]
        m = cap
    parts = []
    for s0 in range(0, m - 1, 256):
        blk = simhash[s0 : s0 + 256]
        dist = hamming64(blk[:, None], simhash[None, :])
        ii, jj = np.nonzero(dist <= hk)
        gi = ii + s0
        msk = gi < jj
        if not msk.any():
            continue
        gi, jj = gi[msk], jj[msk]
        est = (sigs[gi] == sigs[jj]).sum(axis=1).astype(np.float32) / np.float32(k)
        ok = est >= tau
        if ok.any():
            parts.append(edges_table(doc_keys[gi[ok]], doc_keys[jj[ok]],
                                     est[ok], "simhash"))
    return parts


def make_batch_simhash_pair_gen(cfg: DedupConfig):
    """Block-level fn for hash_group_apply keyed on block_key."""
    from nise_ray.ops.groupapply import segments
    tau, cap, k, hk = cfg.tau, cfg.bucket_cap, cfg.minhash_k, cfg.simhash_hamming_k

    def batch_fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty_edges()
        keys = batch.column("block_key").to_numpy(zero_copy_only=False)
        starts, counts = segments(keys)
        multi = counts >= 2
        if not multi.any():
            return empty_edges()
        doc_keys = batch.column("doc_key").to_numpy(zero_copy_only=False).astype(U64)
        sha64 = batch.column("sha64").to_numpy(zero_copy_only=False).astype(U64)
        sigs = sig_matrix(batch.column("minhash"), k)
        simhash = batch.column("simhash").to_numpy(zero_copy_only=False).astype(U64)
        parts: list[pa.Table] = []
        for s, c in zip(starts[multi], counts[multi]):
            parts.extend(_simhash_bucket_edges(
                doc_keys[s:s + c], sha64[s:s + c], sigs[s:s + c],
                simhash[s:s + c], tau, cap, k, hk))
        if not parts:
            return empty_edges()
        return pa.concat_tables(parts).combine_chunks()

    return batch_fn


def make_simhash_pair_gen(cfg: DedupConfig):
    tau, cap, k, hk = cfg.tau, cfg.bucket_cap, cfg.minhash_k, cfg.simhash_hamming_k

    def pair_gen(group: pa.Table) -> pa.Table:
        doc_keys = group.column("doc_key").to_numpy(zero_copy_only=False).astype(U64)
        sha64 = group.column("sha64").to_numpy(zero_copy_only=False).astype(U64)
        sigs = sig_matrix(group.column("minhash"), k)
        simhash = group.column("simhash").to_numpy(zero_copy_only=False).astype(U64)
        # dedupe by content, keeping simhash aligned
        order = np.lexsort((doc_keys, sha64))
        first = np.ones(len(order), dtype=bool)
        first[1:] = sha64[order][1:] != sha64[order][:-1]
        keep = np.sort(order[first])
        doc_keys, sigs, simhash = doc_keys[keep], sigs[keep], simhash[keep]
        m = len(doc_keys)
        if m < 2:
            return empty_edges()
        if m > cap:  # hot block (e.g. simhash==0 degenerate): cap members
            order = np.argsort(doc_keys)[:cap]
            order.sort()
            doc_keys, sigs, simhash = doc_keys[order], sigs[order], simhash[order]
            m = cap
        parts = []
        for s0 in range(0, m - 1, 256):
            blk = simhash[s0 : s0 + 256]
            dist = hamming64(blk[:, None], simhash[None, :])
            ii, jj = np.nonzero(dist <= hk)
            gi = ii + s0
            msk = gi < jj
            if not msk.any():
                continue
            gi, jj = gi[msk], jj[msk]
            est = (sigs[gi] == sigs[jj]).sum(axis=1).astype(np.float32) / np.float32(k)
            ok = est >= tau
            if ok.any():
                parts.append(edges_table(doc_keys[gi[ok]], doc_keys[jj[ok]], est[ok], "simhash"))
        if not parts:
            return empty_edges()
        return pa.concat_tables(parts).combine_chunks()

    return pair_gen
