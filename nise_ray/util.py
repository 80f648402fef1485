"""Small shared helpers."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

_HEX_DIGITS = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)


def fsb_bytes(arr: "pa.Array | pa.ChunkedArray", width: int) -> np.ndarray:
    """Zero-copy (n, width) uint8 view of a fixed_size_binary(width) column."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    data = np.frombuffer(arr.buffers()[1], dtype=np.uint8)
    return data[arr.offset * width:(arr.offset + n) * width].reshape(n, width)


def hex_column(arr: "pa.Array | pa.ChunkedArray", width: int = 32) -> pa.Array:
    """fixed_size_binary(width) -> lowercase-hex string column, fully
    vectorized (nibble lookup table, no per-row Python)."""
    mat = fsb_bytes(arr, width)
    n = mat.shape[0]
    out = np.empty((n, 2 * width), dtype=np.uint8)
    out[:, 0::2] = _HEX_DIGITS[mat >> 4]
    out[:, 1::2] = _HEX_DIGITS[mat & 0x0F]
    offsets = np.arange(0, 2 * width * (n + 1), 2 * width, dtype=np.int32)
    return pa.Array.from_buffers(
        pa.string(), n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(out.tobytes())])


def collect_table(ds: "ray.data.Dataset") -> pa.Table:
    """Materialize a (small!) Dataset to one pyarrow Table on the driver.

    Robust to empty blocks with degenerate (column-less) schemas, which
    groupby().map_groups() can emit and plain pa.concat_tables rejects.
    Only ever call this on result-sized datasets, never on corpus-sized
    ones (it is a driver materialization by design).
    """
    # NOT ds.to_arrow_refs(): that API executes the plan once via
    # iter_internal_ref_bundles() and then calls schema(fetch_if_missing=
    # True), which on a streaming (non-materialized) Dataset RE-EXECUTES
    # the whole plan with a trailing limit(1) — a full second pass over
    # every upstream shuffle (measured: the sf0.1 candidate exchange ran
    # twice, 8.7 s each). Consuming the ref bundles directly executes
    # exactly once; our blocks are Arrow already (pandas fallback kept
    # for safety).
    refs = [r for b in ds.iter_internal_ref_bundles() for r in b.block_refs]
    tables = []
    for t in ray.get(refs):
        if not isinstance(t, pa.Table):
            t = pa.Table.from_pandas(t)
        if t.num_columns > 0:
            tables.append(t)
    if not tables:
        return pa.table({})
    schema = next((t.schema for t in tables if t.num_rows > 0), tables[0].schema)
    tables = [t.cast(schema) if t.schema != schema else t for t in tables]
    return pa.concat_tables(tables)
