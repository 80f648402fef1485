"""Stage B — exact duplicate detection (shuffle 1, key = content_sha256).

Used by the NON-unified plan (salt_shards > 1 or minhash disabled); the
default unified exchange handles exact rows in ops/unified.py with the
same vectorized machinery. Each group of byte-identical contents emits
star edges min-doc_key -> member (exact duplication is transitive, so the
star edge set is EXACTLY equivalent to the full clique for clustering
purposes and O(m) instead of O(m^2) — this is also what kills
boilerplate-clone skew before the LSH stages ever see it).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from nise_ray.hashing import U64
from nise_ray.ops.lsh import edges_table, empty_edges


def exact_edge_gen(group: pa.Table) -> pa.Table:
    if group.num_rows < 2:
        return empty_edges()
    doc_keys = group.column("doc_key").to_numpy(zero_copy_only=False).astype(U64)
    doc_keys = np.sort(doc_keys)
    rep = doc_keys[0]
    members = doc_keys[1:]
    return edges_table(
        np.full(len(members), rep, dtype=U64), members,
        np.ones(len(members), dtype=np.float32), "exact")


def exact_batch_edge_gen(batch: pa.Table) -> pa.Table:
    """Block-level exact dedup for hash_group_apply keyed on sha64 (uint64
    shuffle key — cheap): ONE block-wide lexsort over the FULL sha256
    digest (parsed to four uint64 words) + run detection + vectorized
    star-edge emission. A 64-bit prefix collision can never merge
    distinct contents; zero per-group Python."""
    if batch.num_rows < 2:
        return empty_edges()
    from nise_ray.util import fsb_bytes
    m = batch.num_rows
    # zero-copy uint64 view of the fixed_size_binary(32) digest column
    words = np.ascontiguousarray(
        fsb_bytes(batch.column("content_sha256"), 32)).view("<u8")
    doc_keys = batch.column("doc_key").to_numpy(zero_copy_only=False).astype(U64)
    order = np.lexsort((doc_keys, words[:, 3], words[:, 2],
                        words[:, 1], words[:, 0]))
    w = words[order]
    change = np.empty(m, dtype=bool)
    change[0] = True
    change[1:] = ((w[1:, 0] != w[:-1, 0]) | (w[1:, 1] != w[:-1, 1])
                  | (w[1:, 2] != w[:-1, 2]) | (w[1:, 3] != w[:-1, 3]))
    starts = np.flatnonzero(change)
    counts = np.diff(np.append(starts, m))
    if not (counts >= 2).any():
        return empty_edges()
    dks = doc_keys[order]
    member_mask = np.ones(m, dtype=bool)
    member_mask[starts] = False
    u = np.repeat(dks[starts], counts - 1)
    v = dks[member_mask]
    return edges_table(u, v, np.ones(len(u), dtype=np.float32), "exact")
