"""Stage B — exact duplicate detection (shuffle 1, key = content_sha256).

``groupby(content_sha256).map_groups`` over the narrow (sha, doc_key)
projection. Each group of byte-identical contents emits star edges
min-doc_key -> member (exact duplication is transitive, so the star edge
set is EXACTLY equivalent to the full clique for clustering purposes and
O(m) instead of O(m^2) — this is also what kills boilerplate-clone skew
before the LSH stages ever see it).
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
    shuffle key — cheap), with full sha256 hex verified within each tiny
    segment so a 64-bit prefix collision can never merge distinct
    contents. Emits star edges min-doc_key -> member per identical-content
    group."""
    from nise_ray.ops.groupapply import segments
    if batch.num_rows == 0:
        return empty_edges()
    sha64 = batch.column("sha64").to_numpy(zero_copy_only=False)
    starts, counts = segments(sha64)
    multi = counts >= 2
    if not multi.any():
        return empty_edges()
    doc_keys = batch.column("doc_key").to_numpy(zero_copy_only=False).astype(U64)
    sha_hex = batch.column("content_sha256")
    us, vs = [], []
    for s, c in zip(starts[multi], counts[multi]):
        hexes = sha_hex.slice(s, c).to_pylist()
        by_hex: dict[str, list[int]] = {}
        for i, h in enumerate(hexes):
            by_hex.setdefault(h, []).append(s + i)
        for rows in by_hex.values():
            if len(rows) < 2:
                continue
            ks = np.sort(doc_keys[rows])
            us.append(np.full(len(ks) - 1, ks[0], dtype=U64))
            vs.append(ks[1:])
    if not us:
        return empty_edges()
    u = np.concatenate(us)
    v = np.concatenate(vs)
    return edges_table(u, v, np.ones(len(u), dtype=np.float32), "exact")
