"""Explicit hash-partitioned group processing (the fast shuffle path).

``groupby().map_groups()`` costs one Python call per group — catastrophic
when the key space is millions of mostly-singleton LSH buckets. Instead:

    ds.repartition(num_blocks=P, keys=[k], sort=True)   # hash shuffle
      .map_batches(fn, batch_size=None)                 # one call PER BLOCK

Each block holds complete key groups (hash co-location), sorted by key, so
``fn`` finds group boundaries vectorized (np.flatnonzero on key changes),
drops singleton groups in one mask, and only touches real work. This is
also literally the "explicit hash-partitioned shuffle" the north rule asks
for — partition count is pinned in config, recorded in manifests, and
stable across resumes.

Requires DataContext.shuffle_strategy = HASH_SHUFFLE (set lazily here).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

import ray
from ray.data.context import DataContext, ShuffleStrategy


def _apply_hash_shuffle(ctx: DataContext) -> None:
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    # Aggregators are long-lived actors; several concurrent shuffle
    # operators each spawn their own pool, so (a) keep the per-op pool
    # small and (b) make each aggregator reserve only a sliver of CPU —
    # otherwise aggregator reservations starve the map tasks that feed
    # them (observed: a fused 4-shuffle pipeline ran 10x slower with
    # default 1-CPU aggregators).
    # Sweep on a 32-CPU node, 860MB band shuffle (see BASELINE.md):
    #   agg=4  parts=32  cpu=0.05 -> 13.1s      agg=8 parts=64 cpu=0.05 -> 14.7s
    #   agg=16 parts=128 cpu=0.05 -> 31.8s      agg=8 parts=64 cpu=1.0  -> 24.0s
    # => few aggregators, low CPU reservation, moderate partition counts.
    import os
    cap = max(2, min(cpus // 4 or 1, 8))
    env_cap = os.environ.get("NISE_MAX_AGGREGATORS")
    if env_cap:
        cap = max(1, int(env_cap))  # ops/tuning override, swept in BASELINE.md
    if ctx.shuffle_strategy != ShuffleStrategy.HASH_SHUFFLE:
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.max_hash_shuffle_aggregators = cap
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.05
    # joins default to 0.125 CPU/partition — 2.5x the shuffle density;
    # align them so the same schedulability math covers both op kinds
    ctx.join_operator_actor_num_cpus_per_partition_override = 0.05
    ctx.default_hash_shuffle_parallelism = min(
        ctx.default_hash_shuffle_parallelism, 4 * cap)


def use_hash_shuffle(ds: "ray.data.Dataset | None" = None) -> None:
    """Switch Ray Data to hash-shuffle aggregation, with aggregator-actor
    counts capped to the cluster CPU count — the library default
    (default_hash_shuffle_parallelism=200) spawns more aggregator actors
    than small clusters have CPUs and deadlocks the pipeline.

    Datasets capture their DataContext at CREATION time, so for an
    already-built dataset the captured context must be patched too —
    pass it as ``ds``."""
    _apply_hash_shuffle(DataContext.get_current())
    if ds is not None:
        _apply_hash_shuffle(ds.context)


def default_partitions(requested: int = 0) -> int:
    """Partition count: pinned by config when given (checkpoint stability),
    else ~CPU count (bounded) — more partitions measurably SLOW the hash
    shuffle aggregators (see sweep in use_hash_shuffle)."""
    if requested > 0:
        return requested
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(8, min(128, cpus))


def _cluster_cpus() -> int:
    try:
        return int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        return 8


def schedulable_partitions(requested: int) -> int:
    """Clamp a partition count so ONE shuffle operator's aggregator pool
    is schedulable alongside the rest of the plan.

    Hash-shuffle/join aggregator pools reserve num_partitions x
    cpus-per-partition (0.05 with our override) CPUs EAGERLY, and a pool
    that cannot fully schedule backpressures the whole plan forever — an
    over-wide request is a deadlock, not a slowdown (observed: a
    data-sized 320-partition request on an 8-CPU cluster demanded 16
    CPUs per shuffle op + 40 per join). Cap at ~cpus*5, i.e. ~cpus/4 of
    aggregator reservation per op — the density the 1M-file scaling runs
    validated (40 partitions at 8 CPUs) — leaving headroom for several
    concurrent shuffle ops plus the map tasks that feed them. On
    production clusters (thousands of CPUs) the cap sits far above any
    data-sized partition count, so it only binds on small clusters."""
    return max(8, min(requested, _cluster_cpus() * 5))


def join_safe_partitions(requested: int, concurrent_joins: int = 2) -> int:
    """Like schedulable_partitions but for CHAINED joins, whose pools all
    reserve concurrently: cap so `concurrent_joins` pools together take
    ~cpus*0.4 of reservation (0.05 CPU/partition x cpus*4 parts per join)."""
    cap = max(8, (_cluster_cpus() * 4) // max(concurrent_joins, 1))
    return max(2, min(requested, cap))


def default_concurrency(frac: float = 1.0, min_actors: int = 1) -> tuple[int, int]:
    """Actor-pool size derived from the CLUSTER, not hard-coded: an
    autoscaling (min, max) where max ~= frac * cluster CPUs. A fixed
    (1, 8) cap starves corpus-width stages on any cluster wider than 8
    cores (the north rule targets N and 4N NODES)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    hi = max(min_actors, int(cpus * frac))
    return (min_actors, max(hi, min_actors))


def join_input(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Make a dataset safe to feed `Dataset.join` when it may be SPARSE
    (few rows across many blocks).

    Ray's hash-shuffle join loses its schema broadcast if the first
    block it maps for a side is empty: `hash_shuffle.py` early-returns
    on 0-row blocks BEFORE the one-shot `send_empty_blocks` fan-out
    (which distributes the schema to every aggregator), yet the
    has-broadcasted flag is set anyway — aggregator partitions that
    then receive no real rows build ZERO-COLUMN tables and acero fails
    with "No match or multiple matches for key field reference" on
    perfectly valid plans. Observed whenever a side's row count is
    small relative to its block count (e.g. a 25-pair verify input
    across 16 shuffle partitions).

    Fix: materialize and round-robin repartition into min(count,
    cluster-derived cap) blocks, so every block is non-empty and the
    first-mapped block always carries the schema. Distributed-safe (no
    driver collect); the materialize barrier is acceptable because
    every call site feeds a bounded (pair- / vocab- / endpoint-sized)
    dataset. Empty datasets return as-is — callers guard those."""
    m = ds.materialize()
    n = m.count()
    if n == 0:
        return m
    k = max(1, min(int(n), _cluster_cpus()))
    return m.repartition(num_blocks=k)


def hash_group_apply(ds: "ray.data.Dataset", keys: list[str],
                     fn: Callable[[pa.Table], pa.Table],
                     num_partitions: int = 0, sort: bool = True,
                     **map_kwargs) -> "ray.data.Dataset":
    """Apply ``fn`` once per hash partition; each call sees complete key
    groups (sorted by ``keys`` when sort=True)."""
    use_hash_shuffle(ds)
    rp = ds.repartition(num_blocks=default_partitions(num_partitions),
                        keys=keys, sort=sort)
    return rp.map_batches(fn, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True, **map_kwargs)


def segments(sorted_keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(starts, counts) of equal-value runs in a sorted array."""
    n = len(sorted_keys)
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    change = np.empty(n, dtype=bool)
    change[0] = True
    np.not_equal(sorted_keys[1:], sorted_keys[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    counts = np.diff(np.append(starts, n))
    return starts, counts
