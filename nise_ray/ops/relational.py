"""Relational showcase ops over the TPC-H-ish tables.

`pricing_summary` is the canonical partial-aggregation pattern: each batch
pre-aggregates into (group -> sums) — six groups, so the "shuffle" is a
driver-side merge of tiny partials instead of an all-to-all exchange.
This is the combiner strategy the dedup pipeline uses everywhere, shown
on a plain relational aggregate with a DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from nise_ray.util import collect_table

_FLAGS = {"A": 0, "N": 1, "R": 2}
_STATUS = {"F": 0, "O": 1}
_CUTOFF_US = np.datetime64("1998-09-02", "us").astype(np.int64)


def pricing_summary(sf_dir: str) -> pa.Table:
    """TPC-H-Q1-style: per (l_returnflag, l_linestatus) over rows with
    l_shipdate <= 1998-09-02: sum_qty, sum_base_price, sum_disc_price,
    avg_qty, n_rows."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"])

    def partial(b: pa.Table) -> pa.Table:
        ts = b.column("l_shipdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = ts <= _CUTOFF_US
        if not keep.any():
            return pa.table({"key": pa.array([], pa.int64()),
                             "sum_qty": pa.array([], pa.float64()),
                             "sum_base": pa.array([], pa.float64()),
                             "sum_disc": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        b = b.filter(pa.array(keep))
        flags = b.column("l_returnflag").to_pylist()
        status = b.column("l_linestatus").to_pylist()
        key = np.array([_FLAGS[f] * 2 + _STATUS[s]
                        for f, s in zip(flags, status)], dtype=np.int64)
        qty = b.column("l_quantity").to_numpy(zero_copy_only=False)
        price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        from nise_ray.ops.groupapply import segments
        starts, counts = segments(key[order])
        return pa.table({
            "key": pa.array(key[order][starts], pa.int64()),
            "sum_qty": pa.array(np.add.reduceat(qty[order], starts), pa.float64()),
            "sum_base": pa.array(np.add.reduceat(price[order], starts), pa.float64()),
            "sum_disc": pa.array(
                np.add.reduceat((price * (1.0 - disc))[order], starts), pa.float64()),
            "n": pa.array(counts, pa.int64()),
        })

    partials = collect_table(ds.map_batches(partial, batch_format="pyarrow",
                                            zero_copy_batch=True))
    key = partials.column("key").to_numpy(zero_copy_only=False)
    order = np.argsort(key, kind="stable")
    from nise_ray.ops.groupapply import segments
    starts, _ = segments(key[order])
    agg = {}
    for col in ["sum_qty", "sum_base", "sum_disc", "n"]:
        agg[col] = np.add.reduceat(
            partials.column(col).to_numpy(zero_copy_only=False)[order], starts)
    keys = key[order][starts]
    inv_f = {v: k for k, v in _FLAGS.items()}
    inv_s = {v: k for k, v in _STATUS.items()}
    return pa.table({
        "l_returnflag": pa.array([inv_f[k // 2] for k in keys], pa.string()),
        "l_linestatus": pa.array([inv_s[k % 2] for k in keys], pa.string()),
        "sum_qty": pa.array(np.round(agg["sum_qty"], 2), pa.float64()),
        "sum_base_price": pa.array(np.round(agg["sum_base"], 2), pa.float64()),
        "sum_disc_price": pa.array(np.round(agg["sum_disc"], 2), pa.float64()),
        "avg_qty": pa.array(np.round(agg["sum_qty"] / agg["n"], 4), pa.float64()),
        "n_rows": pa.array(agg["n"], pa.int64()),
    })
