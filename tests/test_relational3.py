"""Round-4 third relational batch vs DuckDB at sf0.001: single-scan
predicate aggregate (Q6 shape), late-shipment CASE aggregation (Q12
shape), market-share conditional ratio (Q8 shape), product-profit
rollup (Q9 shape), and the waiting-suppliers multi-EXISTS self-join
(Q21 shape)."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ["customer", "orders", "lineitem", "supplier", "nation",
              "part", "region"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con


def test_forecast_revenue_change_matches_duckdb(ray_session):
    from nise_ray.ops.relational3 import forecast_revenue_change
    got = forecast_revenue_change(SF).to_pandas()
    want = _con().execute("""
        SELECT coalesce(round(sum(l_extendedprice * l_discount), 2), 0.0)
                   AS revenue,
               count(*) AS n_lineitems
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24
    """).fetchdf()
    assert int(got["n_lineitems"][0]) == int(want["n_lineitems"][0])
    assert np.isclose(got["revenue"][0], want["revenue"][0])


def test_forecast_revenue_change_empty_window(ray_session):
    from nise_ray.ops.relational3 import forecast_revenue_change
    got = forecast_revenue_change(SF, date_lo="1970-01-01",
                                  date_hi="1970-01-02")
    assert got.num_rows == 1
    assert got.column("revenue").to_pylist() == [0.0]
    assert got.column("n_lineitems").to_pylist() == [0]


def test_priority_shipment_counts_matches_duckdb(ray_session):
    from nise_ray.ops.relational3 import priority_shipment_counts
    got = priority_shipment_counts(SF).to_pandas()
    want = _con().execute("""
        SELECT l_returnflag AS return_flag,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority NOT IN
                                  ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY
        GROUP BY 1 ORDER BY 1
    """).fetchdf()
    assert list(got["return_flag"]) == list(want["return_flag"])
    assert list(got["high_line_count"]) == list(want["high_line_count"])
    assert list(got["low_line_count"]) == list(want["low_line_count"])


@pytest.mark.parametrize("bmax", [pytest.param(0, id="part-join"),
                                  pytest.param(5_000_000, id="broadcast")])
def test_market_share_matches_duckdb(ray_session, bmax):
    from nise_ray.ops.relational3 import market_share
    got = market_share(SF, broadcast_max=bmax).to_pandas()
    want = _con().execute("""
        SELECT o_year,
               round(sum(CASE WHEN nation = 'NATION_5' THEN volume
                              ELSE 0 END) / sum(volume), 4) AS mkt_share,
               round(sum(volume), 2) AS total_revenue
        FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                     l_extendedprice * (1 - l_discount) AS volume,
                     n2.n_name AS nation
              FROM part, supplier, lineitem, orders, customer,
                   nation n1, nation n2, region
              WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
                AND l_orderkey = o_orderkey AND o_custkey = c_custkey
                AND c_nationkey = n1.n_nationkey
                AND n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
                AND s_nationkey = n2.n_nationkey
                AND o_orderdate >= TIMESTAMP '1996-01-01'
                AND o_orderdate < TIMESTAMP '1998-01-01'
                AND p_type = 'PROMO') a
        GROUP BY o_year ORDER BY o_year
    """).fetchdf()
    assert list(got["o_year"]) == list(want["o_year"])
    assert np.allclose(got["mkt_share"], want["mkt_share"])
    assert np.allclose(got["total_revenue"], want["total_revenue"])


def test_market_share_unknown_keys(ray_session):
    from nise_ray.ops.relational3 import market_share
    assert market_share(SF, region="NOWHERE").num_rows == 0
    assert market_share(SF, target_nation="NO_SUCH").num_rows == 0


@pytest.mark.parametrize("bmax", [pytest.param(0, id="distributed"),
                                  pytest.param(5_000_000, id="broadcast")])
def test_product_profit_matches_duckdb(ray_session, bmax):
    from nise_ray.ops.relational3 import product_profit
    got = product_profit(SF, broadcast_max=bmax).to_pandas()
    want = _con().execute("""
        SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
        FROM (SELECT n_name AS nation,
                     CAST(year(o_orderdate) AS BIGINT) AS o_year,
                     l_extendedprice * (1 - l_discount)
                       - 0.1 * p_retailprice * l_quantity AS amount
              FROM part, supplier, lineitem, orders, nation
              WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
                AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
                AND contains(p_name, 'red')) p
        GROUP BY 1, 2 ORDER BY 1, 2
    """).fetchdf()
    assert list(got["nation"]) == list(want["nation"])
    assert list(got["o_year"]) == list(want["o_year"])
    assert np.allclose(got["sum_profit"], want["sum_profit"])


def test_product_profit_no_matching_parts(ray_session):
    from nise_ray.ops.relational3 import product_profit
    got = product_profit(SF, name_token="zzz_no_such_token")
    assert got.num_rows == 0


def test_waiting_suppliers_matches_duckdb(ray_session):
    from nise_ray.ops.relational3 import waiting_suppliers
    got = waiting_suppliers(SF, k=10).to_pandas()
    want = _con().execute("""
        SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM supplier, lineitem l1, orders
        WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
          AND EXISTS (SELECT * FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT * FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate >
                                o_orderdate + INTERVAL 90 DAY)
        GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10
    """).fetchdf()
    assert list(got["s_name"]) == list(want["s_name"])
    assert list(got["numwait"]) == list(want["numwait"])


def test_waiting_suppliers_no_late_orders(ray_session):
    from nise_ray.ops.relational3 import waiting_suppliers
    # a lateness threshold beyond the data's ship lags -> empty result
    got = waiting_suppliers(SF, late_days=100_000)
    assert got.num_rows == 0
    assert got.column_names == ["s_name", "numwait"]


def test_min_cost_supplier_matches_duckdb(ray_session):
    import __ray_entry__ as e
    from nise_ray.ops.relational3 import min_cost_supplier
    got = min_cost_supplier(SF).to_pandas()
    want = _con().execute(e.oracle_sql()["min_cost_supplier"]).fetchdf()
    assert len(got) == len(want) > 0
    for c in got.columns:
        assert list(got[c]) == list(want[c]), c


def test_important_parts_matches_duckdb(ray_session):
    import __ray_entry__ as e
    from nise_ray.ops.relational3 import important_parts
    got = important_parts(SF).to_pandas()
    want = _con().execute(e.oracle_sql()["important_parts"]).fetchdf()
    assert len(got) == len(want) > 0
    assert list(got["l_partkey"]) == list(want["l_partkey"])
    assert np.array_equal(got["sum_qty"].to_numpy(),
                          want["sum_qty"].to_numpy())


def test_dominant_part_suppliers_matches_duckdb(ray_session):
    import __ray_entry__ as e
    from nise_ray.ops.relational3 import dominant_part_suppliers
    got = dominant_part_suppliers(SF).to_pandas()
    want = _con().execute(e.oracle_sql()["dominant_part_suppliers"]).fetchdf()
    assert len(got) == len(want) > 0
    for c in got.columns:
        assert list(got[c]) == list(want[c]), c
