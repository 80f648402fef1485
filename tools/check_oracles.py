"""Local replica of the driver's correctness gate.

For every key in __ray_entry__.oracle_sql(), runs the Ray query AND the
DuckDB oracle over the same sf dir, then compares row count, column-name
set and values (columns sorted by name, rows sorted by all columns,
floats compared with tolerance). Queries without an oracle entry get a
rows-only smoke check.

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_df(out) -> pd.DataFrame:
    import pyarrow as pa

    import ray
    if isinstance(out, pd.DataFrame):
        return out
    if isinstance(out, pa.Table):
        return out.to_pandas()
    if isinstance(out, ray.data.Dataset):
        return out.to_pandas()
    raise TypeError(type(out))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    """Replicate the driver's exact value-hash compare.

    The driver hashes values bit-exactly after sorting columns by name;
    an int64 engine column vs a float64 oracle column (e.g. DuckDB
    HUGEINT window sums round-tripping through pandas) hash-mismatches
    even when numerically identical, so dtype-kind differences and
    exact float differences are FAILURES here, not tolerated."""
    if len(a) != len(b):
        return f"rows {len(a)} != {len(b)}"
    if sorted(a.columns) != sorted(b.columns):
        return f"schema {sorted(a.columns)} != {sorted(b.columns)}"
    a, b = canon(a), canon(b)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        a_float = np.issubdtype(av.dtype, np.floating)
        b_float = np.issubdtype(bv.dtype, np.floating)
        if a_float != b_float:
            return (f"dtype kind mismatch in {c}: engine {av.dtype} vs "
                    f"oracle {bv.dtype} (driver hashes exactly — CAST in "
                    f"the oracle SQL)")
        if a_float:
            avf, bvf = av.astype(float), bv.astype(float)
            both_nan = np.isnan(avf) & np.isnan(bvf)
            if not np.array_equal(avf[~both_nan], bvf[~both_nan]):
                if np.allclose(avf, bvf, rtol=1e-9, atol=1e-9,
                               equal_nan=True):
                    return (f"values in {c} match only with tolerance "
                            f"(driver hashes exactly -> would FAIL)")
                return f"values differ in {c}"
        elif not (av.astype(str) == bv.astype(str)).all():
            return f"values differ in {c}"
    return None


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get(
            "RAY_GRAFT_CPUS", "16")), include_dashboard=False)

    import __ray_entry__ as entry
    qs = entry.queries()
    oracles = entry.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            out = to_df(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows-only {name}: {len(out)} rows ({dt:.1f}s)")
            n_rows_only += 1
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {e}")
            n_fail += 1
            continue
        err = compare(out, exp)
        if err:
            print(f"FAIL {name}: {err} ({dt:.1f}s)")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(out)} rows ({dt:.1f}s)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only ==")
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
