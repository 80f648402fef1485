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
