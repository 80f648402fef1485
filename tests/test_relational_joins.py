"""Distributed-join showcase queries vs DuckDB at sf0.001 — exercises the
ds.join primitive that verify_mode="join" and large-label attach rely on."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"

# broadcast_max=0 forces the distributed hash-join fallback (the 10^12-row
# configuration); the default exercises the scale-gated broadcast path.
PATHS = [pytest.param(0, id="distributed"),
         pytest.param(5_000_000, id="broadcast")]


def _con():
    con = duckdb.connect()
    for t in ["customer", "orders", "lineitem"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con


@pytest.mark.parametrize("bmax", PATHS)
def test_segment_revenue_matches_duckdb(ray_session, bmax):
    from nise_ray.ops.relational import segment_revenue
    got = segment_revenue(SF, broadcast_max=bmax).to_pandas() \
        .sort_values("c_mktsegment").reset_index(drop=True)
    want = _con().execute("""
        SELECT c_mktsegment, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """).fetchdf()
    assert list(got["c_mktsegment"]) == list(want["c_mktsegment"])
    assert list(got["n_orders"]) == list(want["n_orders"])
    assert np.allclose(got["total_price"], want["total_price"])


@pytest.mark.parametrize("bmax", PATHS)
def test_top_unshipped_orders_matches_duckdb(ray_session, bmax):
    from nise_ray.ops.relational import top_unshipped_orders
    got = top_unshipped_orders(SF, broadcast_max=bmax).to_pandas() \
        .reset_index(drop=True)
    want = _con().execute("""
        SELECT l_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               o_orderdate
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey LIMIT 10
    """).fetchdf()
    assert list(got["l_orderkey"]) == list(want["l_orderkey"])
    assert np.allclose(got["revenue"], want["revenue"])


@pytest.mark.parametrize("bmax", PATHS)
def test_customers_without_orders_matches_duckdb(ray_session, bmax):
    """broadcast NOT-IN filter vs the distributed left_anti hash join
    (bmax=0 forces the fallback) — identical rollup either way."""
    from nise_ray.ops.relational import customers_without_orders
    got = customers_without_orders(SF, broadcast_max=bmax).to_pandas() \
        .reset_index(drop=True)
    want = _con().execute("""
        SELECT c_nationkey, count(*) AS n_customers
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 350000)
        GROUP BY c_nationkey ORDER BY c_nationkey
    """).fetchdf()
    assert list(got["c_nationkey"]) == list(want["c_nationkey"])
    assert list(got["n_customers"]) == list(want["n_customers"])


def test_broadcast_side_rejects_duplicate_keys(ray_session):
    """_broadcast_side must fail loudly on duplicate dimension keys (a
    searchsorted lookup would silently drop inner-join multiplicity)."""
    import pyarrow as pa

    import ray
    from nise_ray.ops.relational import _broadcast_side
    dup = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1, 2], pa.int64()),
        "v": pa.array(["a", "b", "c"], pa.string())}))
    with pytest.raises(AssertionError, match="duplicate"):
        _broadcast_side(dup, "k", "v", 1000)


def test_attach_segment_empty_broadcast(ray_session):
    """Empty dimension side: the broadcast join path must yield zero rows,
    not IndexError on the clipped searchsorted."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from nise_ray.ops.relational import segment_revenue
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.table({
            "c_custkey": pa.array([], pa.int64()),
            "c_mktsegment": pa.array([], pa.string())}),
            os.path.join(d, "customer.parquet"))
        pq.write_table(pa.table({
            "o_custkey": pa.array([1, 2], pa.int64()),
            "o_totalprice": pa.array([10.0, 20.0], pa.float64())}),
            os.path.join(d, "orders.parquet"))
        out = segment_revenue(d)
        assert out.num_rows == 0


def _con_all():
    import duckdb
    con = duckdb.connect()
    for t in ["customer", "orders", "lineitem", "supplier", "nation",
              "region"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con


@pytest.mark.parametrize("bmax", PATHS)
def test_local_supplier_revenue_matches_duckdb(ray_session, bmax):
    """Q5-shaped 6-table join chain, both supplier-side paths."""
    from nise_ray.ops.relational import local_supplier_revenue
    got = local_supplier_revenue(SF, broadcast_max=bmax).to_pandas() \
        .reset_index(drop=True)
    want = _con_all().execute("""
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name ORDER BY revenue DESC, n_name
    """).fetchdf()
    assert list(got["n_name"]) == list(want["n_name"])
    assert np.allclose(got["revenue"], want["revenue"])


@pytest.mark.parametrize("bmax", PATHS)
def test_order_priority_counts_matches_duckdb(ray_session, bmax):
    """Q4-shaped EXISTS semi-join, both paths (broadcast IN-filter and
    distributed inner join on the deduped key set)."""
    from nise_ray.ops.relational import order_priority_counts
    got = order_priority_counts(SF, broadcast_max=bmax).to_pandas() \
        .reset_index(drop=True)
    want = _con_all().execute("""
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-07-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_returnflag = 'R')
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """).fetchdf()
    assert list(got["o_orderpriority"]) == list(want["o_orderpriority"])
    assert list(got["n_orders"]) == list(want["n_orders"])


@pytest.mark.parametrize("bmax", PATHS)
def test_promo_revenue_share_matches_duckdb(ray_session, bmax):
    """Q14-shaped dimension join + conditional aggregate, both paths."""
    import duckdb

    from nise_ray.ops.relational import promo_revenue_share
    got = promo_revenue_share(SF, broadcast_max=bmax).to_pandas()
    con = duckdb.connect()
    for t in ["lineitem", "part"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    want = con.execute("""
        SELECT round(sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END), 2) AS promo_revenue,
               round(sum(l_extendedprice * (1 - l_discount)), 2)
                 AS total_revenue,
               round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 4)
                 AS promo_share_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
    """).fetchdf()
    for col in ["promo_revenue", "total_revenue", "promo_share_pct"]:
        assert np.allclose(got[col], want[col]), col


@pytest.mark.parametrize("bmax", PATHS)
def test_degenerate_relational_inputs(ray_session, bmax):
    """Empty-selection robustness on both join paths: an unknown region,
    a returnflag no lineitem carries, and an out-of-range date window
    must each yield a well-typed empty/zero result, not a crash."""
    from nise_ray.ops.relational import (local_supplier_revenue,
                                         order_priority_counts,
                                         promo_revenue_share)
    t = local_supplier_revenue(SF, region="NOWHERE", broadcast_max=bmax)
    assert t.num_rows == 0
    assert t.schema.names == ["n_name", "revenue"]

    t = local_supplier_revenue(SF, date_lo="2030-01-01",
                               date_hi="2030-02-01", broadcast_max=bmax)
    assert t.num_rows == 0  # empty order window -> empty join chain

    t = order_priority_counts(SF, flag="Z", broadcast_max=bmax)
    assert t.num_rows == 0
    assert t.schema.names == ["o_orderpriority", "n_orders"]

    t = promo_revenue_share(SF, date_lo="2030-01-01", date_hi="2030-02-01",
                            broadcast_max=bmax)
    assert t.num_rows == 1
    assert t.column("total_revenue")[0].as_py() == 0.0
    assert t.column("promo_share_pct")[0].as_py() == 0.0


@pytest.mark.parametrize("bmax", PATHS)
def test_customers_without_orders_empty_filter(ray_session, bmax):
    """A min_price no order clears prunes EVERY orders fragment at the
    read; both the broadcast NOT-IN path and the distributed left_anti
    join (which needs the -1 anchor sentinel, or the join aggregator
    cannot infer the empty side's schema) must return ALL customers."""
    from nise_ray.ops.relational import customers_without_orders
    got = customers_without_orders(SF, min_price=1e18, broadcast_max=bmax) \
        .to_pandas().reset_index(drop=True)
    want = _con().execute("""
        SELECT c_nationkey, count(*) AS n_customers FROM customer
        GROUP BY c_nationkey ORDER BY c_nationkey
    """).fetchdf()
    assert list(got["c_nationkey"]) == list(want["c_nationkey"])
    assert list(got["n_customers"]) == list(want["n_customers"])


def test_ranges_zero_counts():
    """_ranges must stay correct when counts contain zeros: a 0 makes
    consecutive reset positions collide (silent corruption of every
    range after it) and a trailing 0 writes past the end."""
    from nise_ray.ops.simjoin import _ranges
    got = _ranges(np.array([5, 9, 20]), np.array([2, 0, 3]))
    assert got.tolist() == [5, 6, 20, 21, 22]
    got = _ranges(np.array([3, 7]), np.array([2, 0]))
    assert got.tolist() == [3, 4]
    assert _ranges(np.array([1, 2]), np.array([0, 0])).tolist() == []
    got = _ranges(np.array([0, 4, 8]), np.array([1, 2, 1]))
    assert got.tolist() == [0, 4, 5, 8]


@pytest.mark.parametrize("bmax", PATHS)
def test_small_quantity_revenue_matches_duckdb(ray_session, bmax):
    """Q17-shaped per-group scalar subquery: threshold map broadcast vs
    the two distributed-join passes — identical either way."""
    from nise_ray.ops.relational import small_quantity_revenue
    con = duckdb.connect()
    for t in ["lineitem", "part"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    got = small_quantity_revenue(SF, broadcast_max=bmax)
    want = con.execute("""
        SELECT round(sum(l_extendedprice)/7.0, 2) AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#4'
          AND l_quantity < (SELECT 0.2*avg(l_quantity) FROM lineitem l2
                            WHERE l2.l_partkey = p_partkey)
    """).fetchone()[0]
    assert got.column("avg_yearly")[0].as_py() == want
    # nonexistent brand -> zero revenue, not a crash (empty filtered read)
    t = small_quantity_revenue(SF, brand="Brand#99", broadcast_max=bmax)
    assert t.column("avg_yearly")[0].as_py() == 0.0


@pytest.mark.parametrize("bmax", PATHS)
def test_large_volume_customers_matches_duckdb(ray_session, bmax):
    """Q18-shaped HAVING + join-back: hot-set broadcast vs the chained
    distributed joins — identical rows, order and all."""
    from nise_ray.ops.relational import large_volume_customers
    got = large_volume_customers(SF, broadcast_max=bmax).to_pandas() \
        .reset_index(drop=True)
    want = _con().execute("""
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               sum(l_quantity) AS total_qty
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY 1,2,3,4,5 HAVING sum(l_quantity) > 200
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """).fetchdf()
    assert list(got["o_orderkey"]) == list(want["o_orderkey"])
    assert list(got["c_name"]) == list(want["c_name"])
    assert np.allclose(got["o_totalprice"], want["o_totalprice"])
    assert np.allclose(got["total_qty"], want["total_qty"])
    # an unreachable HAVING threshold -> typed empty result on both paths
    t = large_volume_customers(SF, min_qty=1e9, broadcast_max=bmax)
    assert t.num_rows == 0
    assert t.schema.names == ["c_name", "c_custkey", "o_orderkey",
                              "o_orderdate", "o_totalprice", "total_qty"]


def test_order_priority_counts_bloom_parity(ray_session):
    """The Bloom-prefilter semi-join mode returns exactly what both
    exact modes return — including with a deliberately undersized
    bitmap (64 bits for ~hundreds of keys => false positives on most
    probes), proving the confirm join removes every false positive."""
    from nise_ray.ops.relational import order_priority_counts
    want = order_priority_counts(SF, broadcast_max=5_000_000).to_pandas()
    for bits in (1 << 20, 64):
        got = order_priority_counts(SF, semi_mode="bloom",
                                    bloom_bits=bits).to_pandas()
        assert list(got["o_orderpriority"]) \
            == list(want["o_orderpriority"]), bits
        assert list(got["n_orders"]) == list(want["n_orders"]), bits


def test_order_priority_counts_bad_mode(ray_session):
    from nise_ray.ops.relational import order_priority_counts
    import pytest as _pytest
    with _pytest.raises(ValueError):
        order_priority_counts(SF, semi_mode="nope")


def test_returned_item_report_paths_agree(ray_session):
    """Q10 shape: broadcast custkey-attach vs the distributed hash-join
    fallback produce identical top-k tables."""
    from nise_ray.ops.relational2 import returned_item_report
    a = returned_item_report(SF).to_pandas()
    b = returned_item_report(SF, broadcast_max=0).to_pandas()
    assert a.equals(b)
    assert list(a.columns) == ["c_custkey", "c_name", "revenue",
                               "c_acctbal", "n_name"]
    # revenue sorted desc with custkey tiebreak
    assert (a["revenue"].values[:-1] >= a["revenue"].values[1:]).all()


def test_global_sales_opportunity_paths_agree(ray_session):
    """Q22 shape: NOT-IN broadcast vs left_anti distributed join give
    the same per-nation rollup, and the scalar-avg gate is non-vacuous
    (some customer survives at the default params)."""
    from nise_ray.ops.relational2 import global_sales_opportunity
    a = global_sales_opportunity(SF).to_pandas()
    b = global_sales_opportunity(SF, broadcast_max=0).to_pandas()
    assert a.equals(b)
    assert list(a.columns) == ["n_name", "numcust", "totacctbal"]
    # empty-side degenerate: a min_price below every order price means
    # every customer has a large order -> empty result, both paths
    e1 = global_sales_opportunity(SF, min_price=0.0).to_pandas()
    e2 = global_sales_opportunity(SF, min_price=0.0,
                                  broadcast_max=0).to_pandas()
    assert len(e1) == 0 and e1.equals(e2)
