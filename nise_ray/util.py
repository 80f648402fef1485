"""Small shared helpers."""

from __future__ import annotations

import pyarrow as pa

import ray


def collect_table(ds: "ray.data.Dataset") -> pa.Table:
    """Materialize a (small!) Dataset to one pyarrow Table on the driver.

    Robust to empty blocks with degenerate (column-less) schemas, which
    groupby().map_groups() can emit and plain pa.concat_tables rejects.
    Only ever call this on result-sized datasets, never on corpus-sized
    ones (it is a driver materialization by design).
    """
    tables = [ray.get(r) for r in ds.to_arrow_refs()]
    tables = [t for t in tables if t.num_columns > 0]
    if not tables:
        return pa.table({})
    schema = next((t.schema for t in tables if t.num_rows > 0), tables[0].schema)
    tables = [t.cast(schema) if t.schema != schema else t for t in tables]
    return pa.concat_tables(tables)
