"""Distributed skyline vs a brute-force dominance oracle."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _brute_skyline(size, price):
    keep = []
    for i in range(len(size)):
        dominated = any(
            (size[j] >= size[i] and price[j] >= price[i]
             and (size[j] > size[i] or price[j] > price[i]))
            for j in range(len(size)))
        keep.append(not dominated)
    return np.array(keep)


def _write_parts(tmp_path, size, price):
    n = len(size)
    t = pa.table({
        "p_partkey": pa.array(np.arange(n), pa.int64()),
        "p_name": pa.array([f"p{i}" for i in range(n)]),
        "p_brand": pa.array(["b"] * n),
        "p_type": pa.array(["t"] * n),
        "p_size": pa.array(np.asarray(size, np.int32), pa.int32()),
        "p_retailprice": pa.array(np.asarray(price, np.float64),
                                  pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "part.parquet"))
    return str(tmp_path)


def test_skyline_matches_brute_force(ray_session, tmp_path):
    from nise_ray.ops.skyline import skyline_parts
    rng = np.random.Generator(np.random.PCG64(17))
    size = rng.integers(1, 30, 400)
    price = np.round(rng.uniform(100, 2000, 400), 2)
    # plant exact duplicates of an extreme point: both must survive
    size[10] = size[11] = 29
    price[10] = price[11] = 1999.99
    sf = _write_parts(tmp_path, size, price)
    got = skyline_parts(sf).to_pandas().sort_values("p_partkey")
    ref = np.flatnonzero(_brute_skyline(size, price))
    assert list(got["p_partkey"]) == list(ref)
    assert {10, 11} <= set(got["p_partkey"])


def test_skyline_merge_gate(ray_session, tmp_path):
    """Perfectly anti-correlated dims put every point on the frontier;
    the merge gate fails loudly instead of a silent driver blow-up."""
    import pytest

    from nise_ray.ops.skyline import skyline_parts
    n = 50
    sf = _write_parts(tmp_path, np.arange(n), 1000.0 - np.arange(n))
    # every point is on the frontier: output == corpus
    got = skyline_parts(sf).to_pandas()
    assert len(got) == n
    with pytest.raises(ValueError, match="merge_max"):
        skyline_parts(sf, merge_max=10)
