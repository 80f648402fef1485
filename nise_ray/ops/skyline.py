"""Distributed SKYLINE (Pareto frontier) — maximize two dimensions.

The classic two-phase distributed skyline (Börzsönyi et al.'s
block-nested-loop made parallel): every block computes its LOCAL
skyline with a vectorized sort + suffix-max kernel (any globally
non-dominated point is locally non-dominated, so phase 1 never loses a
result), then the driver runs the same kernel once over the union of
the small per-block frontiers.

Scale contract: what moves to the driver is output-driven — the true
frontier plus per-block false candidates (locally-undominated points a
bigger point elsewhere dominates), bounded by blocks × local-frontier
size. A frontier is O(√n)-ish for independent dims; the adversarial
case (perfectly anti-correlated dims) makes the OUTPUT itself
corpus-sized, at which point no algorithm returns less — callers that
fear it should pre-filter a dimension range. The phase-2 input size is
asserted against ``merge_max`` so the degenerate case fails loudly
instead of silently materializing a corpus on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from nise_ray.util import collect_table


def _skyline_mask(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean mask of Pareto-maximal points (maximize both x and y).

    A point is dominated iff some b has (b.x > x and b.y >= y) or
    (b.x == x and b.y > y). With points sorted by x descending, the
    first term is a prefix-max of y over strictly-larger x; the second
    is the per-x-group max of y. Duplicated points are all kept (no
    strict improvement exists), matching SQL NOT EXISTS semantics."""
    n = len(x)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((-y, -x))
    xs, ys = x[order], y[order]
    starts = np.flatnonzero(np.r_[True, xs[1:] != xs[:-1]])
    grp = np.zeros(n, dtype=np.int64)
    grp[starts[1:]] = 1
    np.cumsum(grp, out=grp)
    # max y within each equal-x group (groups are y-desc sorted)
    grp_max = ys[starts]
    # max y over all strictly larger x = prefix max of earlier groups
    before = np.r_[-np.inf, np.maximum.accumulate(grp_max)[:-1]]
    dominated = (before[grp] >= ys) | (grp_max[grp] > ys)
    mask = np.zeros(n, dtype=bool)
    mask[order] = ~dominated
    return mask


def skyline_parts(sf_dir: str, merge_max: int = 2_000_000) -> pa.Table:
    """Pareto frontier of parts maximizing (p_size, p_retailprice):
    parts where no other part is at least as large AND at least as
    expensive with a strict improvement in one dimension. Returns
    (p_partkey, p_size, p_retailprice)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_size", "p_retailprice"])

    def local_skyline(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"p_partkey": pa.array([], pa.int64()),
                             "p_size": pa.array([], pa.int64()),
                             "p_retailprice": pa.array([], pa.float64())})
        size = b.column("p_size").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        price = b.column("p_retailprice").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        keep = _skyline_mask(size.astype(np.float64), price)
        idx = pa.array(np.flatnonzero(keep), pa.int64())
        return pa.table({
            "p_partkey": b.column("p_partkey").take(idx),
            "p_size": pa.array(size[keep], pa.int64()),
            "p_retailprice": pa.array(price[keep], pa.float64())})

    cand = collect_table(ds.map_batches(
        local_skyline, batch_format="pyarrow", zero_copy_batch=True))
    if cand.num_rows > merge_max:
        raise ValueError(
            f"skyline merge input {cand.num_rows} exceeds merge_max="
            f"{merge_max}: the frontier itself is near-corpus-sized "
            "(anti-correlated dimensions) — pre-filter a dimension")
    if cand.num_rows == 0:
        return cand
    keep = _skyline_mask(
        cand.column("p_size").to_numpy(zero_copy_only=False)
        .astype(np.float64),
        cand.column("p_retailprice").to_numpy(zero_copy_only=False))
    return cand.filter(pa.array(keep))
