"""Iterative graph algorithms over pair Datasets (PageRank).

Connected components (ops/components.py) already exercises the
fixed-point exchange loop; PageRank adds the WEIGHTED iterative
dataflow: a rank vector refined over k rounds of
scatter-along-edges / gather-by-destination, each round ONE hash
exchange — the shape any iterative scoring (HITS, label propagation,
harmonic centrality) reuses.

Scale contract: ranks and degrees are node-count-sized Datasets, never
driver state, EXCEPT under an explicit broadcast gate where the rank
map rides ray.put into the scatter tasks (the node count of a dup-pair
graph is bounded by the corpus, so the distributed path is the
default shape; the broadcast path is the measured-crossover fast path,
mirroring pipeline.py's verify_mode=auto design). Dangling mass and
the teleport term are handled in closed form per round. Results are
deterministic up to float summation order; the parity test checks
against a dense numpy power iteration at 1e-9.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from nise_ray.util import collect_table


def _undirected_edges(sf_dir: str, threshold: float, round_to: int,
                      broadcast_max: int
                      ) -> "tuple[pa.Table, np.ndarray]":
    """Symmetrized (src, dst) arcs of the exact cosine-dup pair graph +
    the sorted node universe (every vector, including isolated ones)."""
    from nise_ray.ops.ann import _exact_pair_ds
    # project on the driver, not via select_columns: Ray passes EMPTY
    # blocks through map operators unprojected, so a lazy select leaves
    # mixed (u,v,cosine)/(u,v) schemas in the stream
    pairs = collect_table(
        _exact_pair_ds(sf_dir, threshold, round_to, broadcast_max)) \
        .select(["u", "v"])
    u = pairs.column("u").to_numpy(zero_copy_only=False)
    v = pairs.column("v").to_numpy(zero_copy_only=False)
    src = np.concatenate([u, v])
    dst = np.concatenate([v, u])
    nodes = collect_table(
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                              columns=["vec_id"])) \
        .column("vec_id").to_numpy(zero_copy_only=False)
    return pa.table({"src": pa.array(src, pa.int64()),
                     "dst": pa.array(dst, pa.int64())}), np.sort(nodes)


def pagerank_dup_graph(sf_dir: str, threshold: float = 0.3,
                       damping: float = 0.85, n_iter: int = 10,
                       round_to: int = 6,
                       broadcast_max: int = 1_000_000) -> pa.Table:
    """PageRank over the exact cosine-duplicate pair graph (symmetrized):
    rank concentrates on vectors embedded in dense near-dup
    neighborhoods — the representative-picking signal SemDeDup-style
    pipelines use to keep the most central member of a cluster.

    Each of the `n_iter` rounds is one scatter exchange: edges keyed by
    src carry rank/deg contributions, a hash exchange on dst sums them,
    and the teleport + dangling terms close the round. Here the rank
    vector rides ray.put per round (node-count gate — the query-scale
    fast path); the edge set itself stays a Dataset and the gather is a
    distributed map, so the exchange shape is the 10^12-node one.
    Returns (vec_id, rank) with rank rounded to `round_to` (FP
    summation order is not cross-engine portable; the numpy parity
    test pins semantics instead of a SQL oracle — rows-only entry)."""
    from nise_ray.ops.groupapply import hash_group_apply, segments

    edges_t, nodes = _undirected_edges(sf_dir, threshold, round_to=4,
                                       broadcast_max=broadcast_max)
    n = len(nodes)
    if n == 0:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.float64())})
    # out-degree per node (0 for isolated -> dangling)
    src_all = edges_t.column("src").to_numpy(zero_copy_only=False)
    deg = np.bincount(np.searchsorted(nodes, src_all), minlength=n) \
        .astype(np.float64)
    edges = ray.data.from_arrow(edges_t)

    rank = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        state_ref = ray.put((nodes, rank, deg))

        def scatter(b: pa.Table) -> pa.Table:
            nod, rk, dg = ray.get(state_ref)
            s = np.searchsorted(nod, b.column("src")
                                .to_numpy(zero_copy_only=False))
            return pa.table({
                "dst": b.column("dst"),
                "w": pa.array(rk[s] / dg[s], pa.float64()),
            })

        def gather(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({"dst": pa.array([], pa.int64()),
                                 "acc": pa.array([], pa.float64())})
            d = batch.column("dst").to_numpy(zero_copy_only=False)
            w = batch.column("w").to_numpy(zero_copy_only=False)
            order = np.argsort(d, kind="stable")
            starts, _ = segments(d[order])
            return pa.table({
                "dst": pa.array(d[order][starts], pa.int64()),
                "acc": pa.array(np.add.reduceat(w[order], starts),
                                pa.float64())})

        contrib = collect_table(hash_group_apply(
            edges.map_batches(scatter, batch_format="pyarrow",
                              zero_copy_batch=True),
            ["dst"], gather, 0, sort=False))
        acc = np.zeros(n)
        if contrib.num_rows:
            pos = np.searchsorted(
                nodes, contrib.column("dst").to_numpy(zero_copy_only=False))
            acc[pos] = contrib.column("acc").to_numpy(zero_copy_only=False)
        dangling = rank[deg == 0].sum()
        rank = (1.0 - damping) / n + damping * (acc + dangling / n)
    return pa.table({"vec_id": pa.array(nodes, pa.int64()),
                     "rank": pa.array(np.round(rank, round_to),
                                      pa.float64())})


def dup_graph_degrees(sf_dir: str, threshold: float = 0.3,
                      round_to: int = 4,
                      broadcast_max: int = 1_000_000) -> pa.Table:
    """Degree of every vector in the exact cosine-duplicate pair graph,
    INCLUDING isolated vectors (degree 0) — the basic graph health
    readout (degree distribution tails reveal boilerplate hubs long
    before component sizes blow up) and the SQL-oracled complement to
    the rows-only PageRank: (vec_id, degree).

    Scale shape: the pair set symmetrizes into (src, dst) arcs, one
    hash exchange on src sums per-node arc counts (here the pair set is
    the gated exact path so the oracle is deterministic; at corpus
    scale the same exchange consumes the LSH pair Dataset), and the
    zero-degree fill is a searchsorted scatter over the node universe —
    node-count-sized, never pair-count-sized driver state beyond the
    gated edge set itself."""
    from nise_ray.ops.groupapply import hash_group_apply, segments

    edges_t, nodes = _undirected_edges(sf_dir, threshold,
                                       round_to=round_to,
                                       broadcast_max=broadcast_max)
    n = len(nodes)
    deg = np.zeros(n, dtype=np.int64)
    if edges_t.num_rows:
        def count(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({"src": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64())})
            s = batch.column("src").to_numpy(zero_copy_only=False)
            order = np.argsort(s, kind="stable")
            starts, counts = segments(s[order])
            return pa.table({"src": pa.array(s[order][starts], pa.int64()),
                             "n": pa.array(counts, pa.int64())})

        got = collect_table(hash_group_apply(
            ray.data.from_arrow(edges_t), ["src"], count, 0, sort=False))
        if got.num_rows:
            pos = np.searchsorted(
                nodes, got.column("src").to_numpy(zero_copy_only=False))
            deg[pos] = got.column("n").to_numpy(zero_copy_only=False)
    return pa.table({"vec_id": pa.array(nodes, pa.int64()),
                     "degree": pa.array(deg, pa.int64())})


def kcore_docs(sf_dir: str, k: int = 3, tau: float = 0.5) -> pa.Table:
    """K-CORE of the exact token-Jaccard >= tau dup graph: the maximal
    subgraph where every member has >= k neighbors INSIDE the subgraph
    — the standard "densely-duplicated boilerplate family" detector
    (degree alone overcounts: a hub with k neighbors of degree 1 is not
    a core). Output (doc_id, core_degree) for core members, sorted;
    core_degree = within-core degree.

    Algorithm: iterative peeling (drop degree < k, recompute) on the
    OUTPUT-SIZED exact pair table — the same driver-side contract as
    every pairs consumer (jaccard_components et al.); each round is one
    vectorized bincount + mask, rounds bounded by the node count and in
    practice by the graph diameter. The oracle is a DuckDB recursive
    CTE exploiting the shrinking-fixpoint property: a node with >= k
    ALIVE neighbors at round r must itself be alive at r (alive sets
    only shrink and dead nodes' neighbor counts only fall), so one
    self-reference per recursion level suffices."""
    from nise_ray.ops.simjoin import token_jaccard_pairs

    pairs = token_jaccard_pairs(sf_dir, tau=tau)
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "core_degree": pa.array([], pa.int64())})
    if pairs.num_rows == 0:
        return empty
    u = pairs.column("doc_id_u").to_numpy(zero_copy_only=False)
    v = pairs.column("doc_id_v").to_numpy(zero_copy_only=False)
    nodes = np.unique(np.concatenate([u, v]))
    cu = np.searchsorted(nodes, u)
    cv = np.searchsorted(nodes, v)
    alive = np.ones(len(nodes), dtype=bool)
    e_alive = np.ones(len(cu), dtype=bool)
    while True:
        deg = np.bincount(cu[e_alive], minlength=len(nodes)) + \
            np.bincount(cv[e_alive], minlength=len(nodes))
        new_alive = alive & (deg >= k)
        if new_alive.sum() == alive.sum():
            break
        alive = new_alive
        e_alive = alive[cu] & alive[cv]
    if not alive.any():
        return empty
    deg = np.bincount(cu[e_alive], minlength=len(nodes)) + \
        np.bincount(cv[e_alive], minlength=len(nodes))
    sel = np.flatnonzero(alive)
    return pa.table({
        "doc_id": pa.array(nodes[sel], pa.int64()),
        "core_degree": pa.array(deg[sel].astype(np.int64), pa.int64()),
    })
