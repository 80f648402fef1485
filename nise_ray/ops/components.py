"""Stage G — connected components over verified dup edges.

Two paths, chosen by edge count (cfg.driver_cc_max_edges):

* driver fold (default at moderate edge counts): the verified edge set is
  ORDERS of magnitude smaller than the corpus (only near-dup pairs);
  stream it with iter_batches and run union-find with path compression.
  This is the "residual small graph folded on the driver" of SURVEY §4.1.

* distributed hash-to-min (Rastogi et al., ICDE'13): iterated
  ``groupby(node).map_groups`` rounds over a (node, member) pair dataset —
  each round sends the group min to every member and every member to the
  min; converges in O(log n) rounds. Convergence detected with an
  order-insensitive XOR checksum over the per-round label table, capped at
  cfg.cc_max_rounds. Used when edges exceed the driver threshold; also
  exercised directly in tests.

Cluster label = min doc_key in the component (deterministic, order-free).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from nise_ray.config import DedupConfig
from nise_ray.hashing import U64, splitmix64

LABEL_SCHEMA = pa.schema([("doc_key", pa.uint64()), ("cluster_id", pa.uint64())])


# ---------------------------------------------------------------- driver path

class UnionFind:
    """Array-free union-find over arbitrary uint64 keys (dict-based)."""

    def __init__(self) -> None:
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        parent = self.parent
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:
            parent[x], x = root, parent[x]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if rb < ra:  # root is always the min key -> label == root
            ra, rb = rb, ra
        self.parent[rb] = ra
        self.parent.setdefault(ra, ra)

    def labels(self) -> pa.Table:
        nodes = np.fromiter(self.parent.keys(), dtype=U64, count=len(self.parent))
        labels = np.fromiter((self.find(int(n)) for n in nodes), dtype=U64,
                             count=len(nodes))
        return pa.table({"doc_key": pa.array(nodes, pa.uint64()),
                         "cluster_id": pa.array(labels, pa.uint64())})


def driver_components(edges_ds: "ray.data.Dataset") -> pa.Table:
    """Stream edges to the driver and label components with VECTORIZED
    min-label propagation + pointer jumping (no per-edge Python loop):
    each round pushes the min label across every edge with np.minimum.at,
    then collapses label chains with label = label[label] until stable.
    Converges in O(log diameter) rounds; every round is O(E) numpy work.
    Returns (doc_key, cluster_id = min doc_key) for every node that
    appears in an edge. Scale-gated by cfg.driver_cc_max_edges (the
    distributed hash-to-min path takes over beyond it)."""
    us, vs = [], []
    for batch in edges_ds.select_columns(["u", "v"]).iter_batches(
            batch_format="pyarrow", batch_size=262144):
        us.append(batch.column("u").to_numpy(zero_copy_only=False).astype(U64))
        vs.append(batch.column("v").to_numpy(zero_copy_only=False).astype(U64))
    if not us:
        return LABEL_SCHEMA.empty_table()
    u = np.concatenate(us)
    v = np.concatenate(vs)
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    ui = inv[:len(u)].astype(np.int64)
    vi = inv[len(u):].astype(np.int64)
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        before = label.copy()
        np.minimum.at(label, ui, label[vi])
        np.minimum.at(label, vi, label[ui])
        # pointer jumping: collapse chains label -> label[label]
        while True:
            jumped = label[label]
            if np.array_equal(jumped, label):
                break
            label = jumped
        if np.array_equal(label, before):
            break
    # nodes is sorted ascending, so min label INDEX == min doc_key
    return pa.table({"doc_key": pa.array(nodes, pa.uint64()),
                     "cluster_id": pa.array(nodes[label], pa.uint64())})


# ----------------------------------------------------------- distributed path
#
# Alternating LARGE-STAR / SMALL-STAR rounds (Kiveris et al., "Connected
# Components in MapReduce and Beyond", SoCC'14) — replacing round-3's
# hash-to-min. The decisive property at 10^12-file scale: each round's
# output edge count is BOUNDED BY THE INPUT edge count (large-star emits
# at most one edge per larger-neighbor relation, small-star at most one
# per edge), so a giant near-dup component cannot inflate the round-trip
# row set the way hash-to-min's member lists could (hash-to-min
# concentrates every member of a component onto its min-node's partition
# with up-to-quadratic intermediate rows; see round-3 VERDICT). The final
# state is a star per component centered at the min node; the hub's
# |component|-row group is the irreducible output size, processed by one
# vectorized reduceat.


def _canon_pairs_batch(b: pa.Table) -> pa.Table:
    """(u, v) edges -> canonical (node=max, member=min) pairs, self-loops
    dropped, per-block dedup."""
    u = b.column("u").to_numpy(zero_copy_only=False).astype(U64)
    v = b.column("v").to_numpy(zero_copy_only=False).astype(U64)
    hi = np.maximum(u, v)
    lo = np.minimum(u, v)
    keep = hi != lo
    pairs = np.unique(np.stack([hi[keep], lo[keep]], axis=1), axis=0)
    return pa.table({"node": pa.array(pairs[:, 0], pa.uint64()),
                     "member": pa.array(pairs[:, 1], pa.uint64())})


def _both_orientations_batch(b: pa.Table) -> pa.Table:
    node = b.column("node").to_numpy(zero_copy_only=False).astype(U64)
    member = b.column("member").to_numpy(zero_copy_only=False).astype(U64)
    return pa.table({
        "node": pa.array(np.concatenate([node, member]), pa.uint64()),
        "member": pa.array(np.concatenate([member, node]), pa.uint64()),
    })


def _large_star_batch(batch: pa.Table) -> pa.Table:
    """large-star(u): connect every STRICTLY LARGER neighbor v > u to
    m = min(Γ(u) ∪ {u}). Input: both orientations, hash-partitioned and
    sorted by node; output edges are canonical (larger, smaller).
    Vectorized: one reduceat for the per-group min, one mask."""
    from nise_ray.ops.groupapply import segments
    if batch.num_rows == 0:
        return batch
    node = batch.column("node").to_numpy(zero_copy_only=False).astype(U64)
    member = batch.column("member").to_numpy(zero_copy_only=False).astype(U64)
    starts, counts = segments(node)
    seg_min = np.minimum(np.minimum.reduceat(member, starts), node[starts])
    m_rep = np.repeat(seg_min, counts)
    keep = member > node
    pairs = np.unique(np.stack([member[keep], m_rep[keep]], axis=1), axis=0)
    return pa.table({"node": pa.array(pairs[:, 0], pa.uint64()),
                     "member": pa.array(pairs[:, 1], pa.uint64())})


def _small_star_batch(batch: pa.Table) -> pa.Table:
    """small-star(u): connect every smaller neighbor (and u itself) to
    m = min(Γ⁻(u)). Input: canonical (node, member<node) pairs sorted by
    node; output stays canonical."""
    from nise_ray.ops.groupapply import segments
    if batch.num_rows == 0:
        return batch
    node = batch.column("node").to_numpy(zero_copy_only=False).astype(U64)
    member = batch.column("member").to_numpy(zero_copy_only=False).astype(U64)
    starts, counts = segments(node)
    seg_min = np.minimum.reduceat(member, starts)
    m_rep = np.repeat(seg_min, counts)
    keep = member != m_rep
    out_hi = np.concatenate([member[keep], node[starts]])
    out_lo = np.concatenate([m_rep[keep], seg_min])
    pairs = np.unique(np.stack([out_hi, out_lo], axis=1), axis=0)
    return pa.table({"node": pa.array(pairs[:, 0], pa.uint64()),
                     "member": pa.array(pairs[:, 1], pa.uint64())})


def _label_batch(batch: pa.Table) -> pa.Table:
    """(node -> min member) per segment, vectorized."""
    from nise_ray.ops.groupapply import segments
    if batch.num_rows == 0:
        return LABEL_SCHEMA.empty_table()
    node = batch.column("node").to_numpy(zero_copy_only=False).astype(U64)
    member = batch.column("member").to_numpy(zero_copy_only=False).astype(U64)
    starts, _ = segments(node)
    label = np.minimum(np.minimum.reduceat(member, starts), node[starts])
    return pa.table({"doc_key": pa.array(node[starts], pa.uint64()),
                     "cluster_id": pa.array(label, pa.uint64())})


def _pairs_checksum(pairs_ds: "ray.data.Dataset") -> int:
    """Order-insensitive XOR checksum over the canonical pair set (the
    convergence detector — the star decomposition is a fixed point of
    both round types)."""
    def batch_xor(b: pa.Table) -> pa.Table:
        n = b.column("node").to_numpy(zero_copy_only=False).astype(U64)
        m = b.column("member").to_numpy(zero_copy_only=False).astype(U64)
        h = splitmix64(n ^ splitmix64(m))
        x = np.bitwise_xor.reduce(h) if len(h) else np.uint64(0)
        return pa.table({"x": pa.array([int(x)], pa.uint64())})

    total = 0
    for row in pairs_ds.map_batches(batch_xor,
                                    batch_format="pyarrow").take_all():
        total ^= row["x"]
    return total


def distributed_components(edges_ds: "ray.data.Dataset", cfg: DedupConfig,
                           stats: "dict | None" = None) -> "ray.data.Dataset":
    """Alternating large-star/small-star connected components; returns
    Dataset(doc_key, cluster_id = min doc_key of the component). Pass a
    dict as ``stats`` to receive {"cc_rounds", "cc_max_round_rows"} —
    the row bound the giant-component test asserts on."""
    from nise_ray.ops.groupapply import hash_group_apply

    pairs = edges_ds.select_columns(["u", "v"]).map_batches(
        _canon_pairs_batch, batch_format="pyarrow")
    n_parts = cfg.shuffle_partitions
    prev_sum: int | None = None
    max_rows = 0
    rounds = 0
    for rounds in range(1, cfg.cc_max_rounds + 1):
        both = pairs.map_batches(_both_orientations_batch,
                                 batch_format="pyarrow")
        big = hash_group_apply(both, ["node"], _large_star_batch, n_parts)
        pairs = hash_group_apply(big, ["node"], _small_star_batch,
                                 n_parts).materialize()
        max_rows = max(max_rows, pairs.count())
        checksum = _pairs_checksum(pairs)
        if checksum == prev_sum:
            break
        prev_sum = checksum
    else:
        raise RuntimeError(
            f"large-star/small-star did not converge in "
            f"{cfg.cc_max_rounds} rounds")
    if stats is not None:
        stats["cc_rounds"] = rounds
        stats["cc_max_round_rows"] = max_rows
    labels_in = pairs.map_batches(_both_orientations_batch,
                                  batch_format="pyarrow")
    return hash_group_apply(labels_in, ["node"], _label_batch, n_parts)


# ------------------------------------------------------------- label attach

def attach_labels(signed_ds: "ray.data.Dataset", labels: pa.Table | "ray.data.Dataset",
                  cfg: DedupConfig) -> "ray.data.Dataset":
    """Attach cluster_id to every doc; unclustered docs label themselves.

    Small label maps are broadcast once via ray.put and looked up inside
    map_batches (no shuffle); beyond cfg.broadcast_label_max the label table
    becomes a Dataset and a distributed left-outer hash join is used.
    """
    if isinstance(labels, pa.Table):
        n_labels = labels.num_rows
    else:
        # materialize ONCE so the count gate and the (possible) collect
        # below are both metadata-cheap — count()+to_arrow_refs() on a
        # streaming Dataset would execute the label plan 2-3 times
        labels = labels.materialize()
        n_labels = labels.count()

    if n_labels <= cfg.broadcast_label_max:
        if not isinstance(labels, pa.Table):
            from nise_ray.util import collect_table
            labels = collect_table(labels)
        keys = labels.column("doc_key").to_numpy(zero_copy_only=False).astype(U64)
        vals = labels.column("cluster_id").to_numpy(zero_copy_only=False).astype(U64)
        order = np.argsort(keys)
        ref = ray.put((keys[order], vals[order]))

        # task-path closure, NOT an actor pool: the only per-worker state
        # is ray.get(ref) — a zero-copy plasma read that every warm worker
        # shares — so an actor pool would pay seconds of cold-start per
        # stage for nothing (measured ~2-4 s per pool on this host)
        def label_batch(b: pa.Table) -> pa.Table:
            keys, vals = ray.get(ref)
            dk = b.column("doc_key").to_numpy(zero_copy_only=False).astype(U64)
            pos = np.searchsorted(keys, dk)
            pos = np.clip(pos, 0, max(len(keys) - 1, 0))
            if len(keys):
                hit = keys[pos] == dk
                cluster = np.where(hit, vals[pos], dk)
            else:
                cluster = dk
            return b.append_column("cluster_id", pa.array(cluster, pa.uint64()))

        label_batch.__name__ = "Labeler"
        return signed_ds.map_batches(label_batch, batch_format="pyarrow",
                                     zero_copy_batch=True)

    # large label map: distributed join. Partition count derived from the
    # cluster — a fixed 64-partition floor spawns a join aggregator fleet
    # wider than small clusters' CPU budget and deadlocks the pipeline
    # (observed live at num_cpus=8).
    from nise_ray.ops.groupapply import default_partitions
    labels_ds = labels if not isinstance(labels, pa.Table) else ray.data.from_arrow(labels)
    from nise_ray.ops.groupapply import join_input
    labels_ds = join_input(labels_ds)  # sparse side: see groupapply
    joined = signed_ds.join(labels_ds, join_type="left_outer", on=("doc_key",),
                            num_partitions=default_partitions(cfg.shuffle_partitions))

    def fill(b: pa.Table) -> pa.Table:
        dk = b.column("doc_key").to_numpy(zero_copy_only=False).astype(U64)
        cl = b.column("cluster_id").to_numpy(zero_copy_only=False)
        cl = np.where(pa.compute.is_null(b.column("cluster_id")).to_numpy(
            zero_copy_only=False), dk, cl.astype(U64))
        return b.set_column(b.schema.get_field_index("cluster_id"), "cluster_id",
                            pa.array(cl, pa.uint64()))

    return joined.map_batches(fill, batch_format="pyarrow")
