"""Round-4 second relational batch vs DuckDB at sf0.001: nation-pair
conditional join (Q7 shape), left-outer two-level custdist (Q13 shape),
disjunctive-predicate dimension join (Q19 shape), and the rank-family
window quartet."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"

PATHS = [pytest.param(0, id="distributed"),
         pytest.param(5_000_000, id="broadcast")]


def _con():
    con = duckdb.connect()
    for t in ["customer", "orders", "lineitem", "supplier", "nation",
              "part", "events"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con


@pytest.mark.parametrize("bmax", PATHS)
def test_volume_shipping_matches_duckdb(ray_session, bmax):
    from nise_ray.ops.relational2 import volume_shipping
    got = volume_shipping(SF, broadcast_max=bmax).to_pandas() \
        .reset_index(drop=True)
    want = _con().execute("""
        SELECT supp_nation, cust_nation, l_year,
               round(sum(volume), 2) AS revenue
        FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                     CAST(year(l_shipdate) AS BIGINT) AS l_year,
                     l_extendedprice * (1 - l_discount) AS volume
              FROM supplier, lineitem, orders, customer,
                   nation n1, nation n2
              WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
                AND c_custkey = o_custkey
                AND s_nationkey = n1.n_nationkey
                AND c_nationkey = n2.n_nationkey
                AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
                  OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
                AND l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1998-01-01') s
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """).fetchdf()
    assert list(got["supp_nation"]) == list(want["supp_nation"])
    assert list(got["cust_nation"]) == list(want["cust_nation"])
    assert list(got["l_year"]) == list(want["l_year"])
    assert np.allclose(got["revenue"], want["revenue"])


def test_volume_shipping_unknown_nation(ray_session):
    from nise_ray.ops.relational2 import volume_shipping
    got = volume_shipping(SF, nation_a="NO_SUCH", nation_b="NATION_7")
    assert got.num_rows == 0
    got = volume_shipping(SF, nation_a="NATION_7", nation_b="NATION_7")
    assert got.num_rows == 0


@pytest.mark.parametrize("bmax", PATHS)
def test_customer_order_distribution_matches_duckdb(ray_session, bmax):
    from nise_ray.ops.relational2 import customer_order_distribution
    got = customer_order_distribution(SF, broadcast_max=bmax).to_pandas() \
        .reset_index(drop=True)
    want = _con().execute("""
        SELECT c_count, count(*) AS custdist FROM (
          SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          FROM customer c
          LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
          GROUP BY c.c_custkey) cc
        GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """).fetchdf()
    assert list(got["c_count"]) == list(want["c_count"])
    assert list(got["custdist"]) == list(want["custdist"])
    # the zero bucket is real only if some customer has no order; either
    # way total must equal |customer|
    assert int(got["custdist"].sum()) == _con().execute(
        "SELECT count(*) FROM customer").fetchone()[0]


@pytest.mark.parametrize("bmax", PATHS)
def test_disjunctive_filter_revenue_matches_duckdb(ray_session, bmax):
    from nise_ray.ops.relational2 import disjunctive_filter_revenue
    got = disjunctive_filter_revenue(SF, broadcast_max=bmax).to_pandas()
    want = _con().execute("""
        SELECT coalesce(round(sum(l_extendedprice * (1 - l_discount)), 2),
                        0.0) AS revenue,
               count(*) AS n_lineitems
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """).fetchdf()
    assert int(got["n_lineitems"][0]) == int(want["n_lineitems"][0])
    assert got["n_lineitems"][0] > 0  # predicate actually selects rows
    assert np.allclose(got["revenue"], want["revenue"])


def test_disjunctive_filter_no_match(ray_session):
    """A clause set no row satisfies returns the typed zero row (the
    coalesce contract), on both paths."""
    from nise_ray.ops.relational2 import disjunctive_filter_revenue
    impossible = (("Brand#12", 60, 70, 1e9, 2e9),)
    for bmax in (0, 5_000_000):
        got = disjunctive_filter_revenue(SF, clauses=impossible,
                                         broadcast_max=bmax)
        assert got.column("revenue")[0].as_py() == 0.0
        assert got.column("n_lineitems")[0].as_py() == 0


def test_value_rank_windows_matches_duckdb(ray_session):
    from nise_ray.util import collect_table
    from nise_ray.ops.events import value_rank_windows
    got = collect_table(value_rank_windows(SF)).to_pandas() \
        .sort_values(["user_id", "event_id"]).reset_index(drop=True)
    want = _con().execute("""
        SELECT user_id, event_id, value,
               CAST(rank() OVER w AS BIGINT) AS rnk,
               CAST(dense_rank() OVER w AS BIGINT) AS dense_rnk,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cume_dist
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY value)
        ORDER BY user_id, event_id
    """).fetchdf()
    assert len(got) == len(want)
    for c in ["user_id", "event_id", "rnk", "dense_rnk"]:
        assert list(got[c]) == list(want[c]), c
    # ratios of exact small integers: bit-identical, no tolerance
    assert (got["pct_rank"].to_numpy() == want["pct_rank"].to_numpy()).all()
    assert (got["cume_dist"].to_numpy()
            == want["cume_dist"].to_numpy()).all()


def test_value_rank_windows_tie_semantics(ray_session):
    """Planted ties: rank skips, dense_rank doesn't, cume_dist counts the
    whole tie run — checked on a hand-computed frame."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from nise_ray.ops import events as ev
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "event_id": pa.array([10, 11, 12, 13, 14], pa.int64()),
        "value": pa.array([5.0, 5.0, 7.0, 9.0, 3.0], pa.float64()),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        got = collect_sorted(ev.value_rank_windows(d))
    assert got["rnk"] == [1, 1, 3, 4, 1]
    assert got["dense_rnk"] == [1, 1, 2, 3, 1]
    assert got["pct_rank"] == [0.0, 0.0, 2 / 3, 1.0, 0.0]
    assert got["cume_dist"] == [0.5, 0.5, 0.75, 1.0, 1.0]


def collect_sorted(ds):
    from nise_ray.util import collect_table
    t = collect_table(ds).to_pandas() \
        .sort_values(["user_id", "event_id"]).reset_index(drop=True)
    return {c: list(t[c]) for c in t.columns}


def test_monthly_revenue_matches_duckdb(ray_session):
    from nise_ray.ops.relational2 import monthly_revenue
    got = monthly_revenue(SF).to_pandas().reset_index(drop=True)
    want = _con().execute("""
        SELECT date_trunc('month', o_orderdate) AS month,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders GROUP BY 1 ORDER BY 1
    """).fetchdf()
    assert list(got["month"]) == list(want["month"])
    assert list(got["n_orders"]) == list(want["n_orders"])
    assert np.allclose(got["revenue"], want["revenue"])


def test_event_transitions_matches_duckdb(ray_session):
    from nise_ray.ops.events import event_transitions
    got = event_transitions(SF).to_pandas().reset_index(drop=True)
    want = _con().execute("""
        WITH s AS (
          SELECT user_id, event_type,
                 lag(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_type
          FROM events)
        SELECT prev_type, event_type AS next_type, count(*) AS n
        FROM s WHERE prev_type IS NOT NULL
        GROUP BY 1, 2 ORDER BY 1, 2
    """).fetchdf()
    assert list(got["prev_type"]) == list(want["prev_type"])
    assert list(got["next_type"]) == list(want["next_type"])
    assert list(got["n"]) == list(want["n"])


def test_doc_zscores_matches_duckdb(ray_session):
    from nise_ray.util import collect_table
    from nise_ray.ops.analytics import doc_zscores
    got = collect_table(doc_zscores(SF)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute("""
        SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
               round((n_chars - avg(n_chars) OVER w)
                     / nullif(stddev_pop(n_chars) OVER w, 0), 4) AS z_chars
        FROM documents
        WINDOW w AS (PARTITION BY lang)
        ORDER BY doc_id
    """).fetchdf()
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert list(got["lang"]) == list(want["lang"])
    assert list(got["n_chars"]) == list(want["n_chars"])
    gz, wz = got["z_chars"].to_numpy(), want["z_chars"].to_numpy()
    assert (np.isnan(gz) == np.isnan(wz)).all()
    m = ~np.isnan(gz)
    assert (gz[m] == wz[m]).all()


def test_event_type_user_counts_approx_error_bound(ray_session):
    """HLL estimate within 5% of the exact grouped count-distinct
    (p=14 -> sigma ~0.8%; 5% is >5 sigma, deterministic given the fixed
    splitmix64 hash)."""
    from nise_ray.util import collect_table
    from nise_ray.ops.events import (event_type_user_counts,
                                     event_type_user_counts_approx)
    approx = event_type_user_counts_approx(SF).to_pandas() \
        .set_index("event_type")["n_users_approx"]
    exact_df = collect_table(event_type_user_counts(SF)).to_pandas()
    exact = exact_df.set_index("event_type")["n_users"]
    assert set(approx.index) == set(exact.index)
    for t in exact.index:
        rel = abs(approx[t] - exact[t]) / max(exact[t], 1)
        assert rel < 0.05, (t, approx[t], exact[t])


@pytest.mark.parametrize("bmax", PATHS)
def test_volume_shipping_empty_window(ray_session, bmax):
    """A ship-date window past all data prunes every lineitem fragment;
    the distributed path crashed without the li anchor sentinel
    (zero-block join side, review finding)."""
    from nise_ray.ops.relational2 import volume_shipping
    got = volume_shipping(SF, date_lo="2030-01-01", date_hi="2031-01-01",
                          broadcast_max=bmax)
    assert got.num_rows == 0


def test_moving_event_stats_matches_duckdb(ray_session):
    from nise_ray.ops.events import moving_event_stats
    got = moving_event_stats(SF, frame_rows=7).to_pandas() \
        .sort_values(["user_id", "event_id"]).reset_index(drop=True)
    want = _con().execute("""
        SELECT user_id, event_id,
               CAST(sum(length(props)) OVER w AS BIGINT) AS mov_sum,
               CAST(count(*) OVER w AS BIGINT) AS mov_cnt,
               CAST(sum(length(props)) OVER w AS DOUBLE)
                 / (count(*) OVER w) AS mov_avg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        ORDER BY user_id, event_id
    """).fetchdf()
    assert list(got["mov_sum"]) == list(want["mov_sum"])
    assert list(got["mov_cnt"]) == list(want["mov_cnt"])
    # exact-int division on both sides -> bit-exact
    assert (got["mov_avg"].to_numpy() == want["mov_avg"].to_numpy()).all()
    assert got["mov_cnt"].max() <= 7


def test_moving_event_stats_frame_one(ray_session):
    # frame of 1 row degenerates to the metric itself
    from nise_ray.ops.events import moving_event_stats
    got = moving_event_stats(SF, frame_rows=1).to_pandas()
    assert (got["mov_cnt"] == 1).all()
    assert (got["mov_sum"].to_numpy().astype(float)
            == got["mov_avg"].to_numpy()).all()


def test_scrub_event_props_matches_duckdb(ray_session):
    from nise_ray.ops.strings import scrub_event_props
    got = scrub_event_props(SF).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    want = _con().execute("""
        SELECT event_id,
               CAST(NULLIF(regexp_extract(props, '"k": (\\d+)', 1), '')
                    AS BIGINT) AS k_val,
               regexp_replace(props, '\\d+', '<NUM>', 'g') AS props_masked
        FROM events ORDER BY event_id
    """).fetchdf()
    assert list(got["k_val"]) == list(want["k_val"])
    assert list(got["props_masked"]) == list(want["props_masked"])
    assert not got["props_masked"].str.contains(r"\d").any()


def test_high_value_user_sets_match_duckdb(ray_session):
    # threshold 120: both set-op results non-empty at sf0.001
    from nise_ray.ops.relational2 import high_value_user_sets
    con = _con()
    for op, kw in (("intersect", "INTERSECT"), ("except", "EXCEPT")):
        got = sorted(high_value_user_sets(SF, op=op, min_value=120.0)
                     .to_pandas()["user_id"])
        want = sorted(r[0] for r in con.execute(f"""
            SELECT user_id FROM events
            WHERE event_type = 'purchase' AND value > 120
            {kw}
            SELECT user_id FROM events
            WHERE event_type = 'error' AND value > 120
        """).fetchall())
        assert got == want, op
    # algebra invariant: intersect and except partition set A
    a = sorted(r[0] for r in con.execute(
        "SELECT DISTINCT user_id FROM events "
        "WHERE event_type='purchase' AND value > 120").fetchall())
    inter = sorted(high_value_user_sets(SF, op="intersect", min_value=120.0)
                   .to_pandas()["user_id"])
    exc = sorted(high_value_user_sets(SF, op="except", min_value=120.0)
                 .to_pandas()["user_id"])
    assert sorted(inter + exc) == a


def test_high_value_user_sets_empty_result_keeps_schema(ray_session):
    # impossible threshold -> empty result; the Arrow schema must
    # survive (Ray's to_pandas drops columns on ANY empty dataset, so
    # assert via the Arrow path)
    from nise_ray.ops.relational2 import high_value_user_sets
    from nise_ray.util import collect_table
    out = high_value_user_sets(SF, min_value=1e12)
    assert out.schema().names == ["user_id"]
    t = collect_table(out)
    assert t.num_rows == 0


def test_high_value_user_sets_bad_op(ray_session):
    from nise_ray.ops.relational2 import high_value_user_sets
    with pytest.raises(ValueError):
        high_value_user_sets(SF, op="union_all")


def test_levenshtein_kernel_matches_duckdb():
    import numpy as np
    from nise_ray.ops.strings import _levenshtein_bytes
    con = duckdb.connect()
    cases = [("kitten", "sitting"), ("", "abc"), ("abc", ""),
             ("same", "same"), ("café", "cafe"),
             ("日本語", "日本a"),
             ("ab" * 40, "ba" * 40)]
    rng = np.random.default_rng(7)
    al = np.array(list("abcde "))
    for _ in range(60):
        a = "".join(rng.choice(al, size=rng.integers(0, 30)))
        b = "".join(rng.choice(al, size=rng.integers(0, 30)))
        cases.append((a, b))
    for a, b in cases:
        got = _levenshtein_bytes(np.frombuffer(a.encode(), np.uint8),
                                 np.frombuffer(b.encode(), np.uint8))
        want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert got == want, (a, b)


def test_edit_distance_pairs_matches_duckdb(ray_session):
    from nise_ray.ops.strings import edit_distance_pairs
    got = edit_distance_pairs(SF, k=12).to_pandas() \
        .sort_values(["u", "v"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute("""
        WITH shortest AS (
            SELECT doc_id, text FROM documents
            ORDER BY n_chars, doc_id LIMIT 12)
        SELECT a.doc_id AS u, b.doc_id AS v,
               levenshtein(a.text, b.text) AS dist
        FROM shortest a, shortest b WHERE a.doc_id < b.doc_id
        ORDER BY u, v
    """).fetchdf()
    assert len(got) == 66
    assert list(got["u"]) == list(want["u"])
    assert list(got["v"]) == list(want["v"])
    assert list(got["dist"]) == list(want["dist"])


def test_user_first_last_event_matches_duckdb(ray_session):
    from nise_ray.ops.events import user_first_last_event
    got = user_first_last_event(SF).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    want = _con().execute("""
        SELECT DISTINCT user_id,
               first_value(event_type) OVER w AS first_et,
               last_value(event_type) OVER w AS last_et,
               nth_value(event_type, 2) OVER w AS second_et,
               CAST(count(*) OVER w AS BIGINT) AS n_events
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND UNBOUNDED FOLLOWING)
        ORDER BY user_id
    """).fetchdf()
    for c in ["user_id", "first_et", "last_et", "n_events"]:
        assert list(got[c]) == list(want[c]), c
    assert got["second_et"].fillna("∅").tolist() \
        == want["second_et"].fillna("∅").tolist()


def test_user_first_last_single_event_user(ray_session):
    # planted single-event user: second_et must be NULL, first == last
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from nise_ray.ops import events as ev
    t = pa.table({
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "event_id": pa.array([10, 11, 12], pa.int64()),
        "ts": pa.array([1_000_000, 2_000_000, 3_000_000],
                       pa.timestamp("us")),
        "event_type": pa.array(["a", "b", "c"], pa.string()),
    })
    from nise_ray.util import collect_table
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        df = collect_table(ev.user_first_last_event(d)).to_pandas() \
            .sort_values("user_id").reset_index(drop=True)
        got = {c: [None if v != v else v for v in df[c]] for c in df.columns}
    assert got["first_et"] == ["a", "c"]
    assert got["last_et"] == ["b", "c"]
    assert got["second_et"] == ["b", None]
    assert got["n_events"] == [2, 1]


def test_top_suppliers_by_qty_matches_duckdb(ray_session):
    from nise_ray.ops.relational2 import top_suppliers_by_qty
    got = top_suppliers_by_qty(SF).to_pandas() \
        .sort_values("l_suppkey").reset_index(drop=True)
    want = _con().execute("""
        WITH qty AS (
            SELECT l_suppkey,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
                     AS total_qty
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey)
        SELECT l_suppkey, total_qty FROM qty
        WHERE total_qty = (SELECT max(total_qty) FROM qty)
        ORDER BY l_suppkey
    """).fetchdf()
    assert len(got) >= 1
    assert list(got["l_suppkey"]) == list(want["l_suppkey"])
    assert list(got["total_qty"]) == list(want["total_qty"])
    # with-ties contract: every returned row carries the same max total
    assert got["total_qty"].nunique() == 1


def test_top_suppliers_by_qty_empty_window(ray_session):
    from nise_ray.ops.relational2 import top_suppliers_by_qty
    got = top_suppliers_by_qty(SF, date_lo="2050-01-01",
                               date_hi="2050-02-01")
    assert got.num_rows == 0
    assert got.schema.names == ["l_suppkey", "total_qty"]


def test_token_cooccurrence_matches_duckdb(ray_session):
    from nise_ray.ops.textstats import token_cooccurrence
    got = token_cooccurrence(SF, vocab_limit=64).to_pandas() \
        .sort_values(["tok_a", "tok_b"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute("""
        WITH toks AS (
            SELECT DISTINCT doc_id,
                   unnest(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS tok
            FROM documents),
        vocab AS (
            SELECT tok FROM (
                SELECT unnest(regexp_extract_all(text, '[A-Za-z0-9_]+'))
                       AS tok FROM documents) t
            WHERE tok <> ''
            GROUP BY tok ORDER BY count(*) DESC, tok LIMIT 64)
        SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS n_docs
        FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND a.tok < b.tok
        WHERE a.tok IN (SELECT tok FROM vocab)
          AND b.tok IN (SELECT tok FROM vocab)
        GROUP BY 1, 2 ORDER BY 1, 2
    """).fetchdf()
    assert len(got) == len(want) and len(got) > 0
    for c in ["tok_a", "tok_b", "n_docs"]:
        assert list(got[c]) == list(want[c]), c


def test_token_cooccurrence_vocab_cap(ray_session):
    # capping the vocabulary restricts pairs to the top-2 tokens
    from nise_ray.ops.textstats import token_cooccurrence
    got = token_cooccurrence(SF, vocab_limit=2).to_pandas()
    assert len(got) <= 1
    toks = set(got["tok_a"]) | set(got["tok_b"])
    assert len(toks) <= 2


def test_dup_graph_triangles_planted(ray_session):
    # K3 on one duplicate family + K4 on another -> C(3,3)+C(4,3) = 5
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from nise_ray.ops.ann import dup_graph_triangles
    vecs = [[1.0, 0.0]] * 3 + [[0.0, 1.0]] * 4 + [[1.0, -1.0]]
    t = pa.table({
        "vec_id": pa.array(range(8), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "embeddings.parquet"))
        got = dup_graph_triangles(d, threshold=0.9)
    assert got.column("n_triangles")[0].as_py() == 1 + 4


def test_dup_graph_triangles_no_edges(ray_session):
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from nise_ray.ops.ann import dup_graph_triangles
    t = pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]],
                              pa.list_(pa.float32())),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "embeddings.parquet"))
        got = dup_graph_triangles(d, threshold=0.9)
    assert got.column("n_triangles")[0].as_py() == 0


def test_pagerank_dup_graph_matches_numpy(ray_session):
    # planted graph: K3 family, a 2-chain family, isolated node; parity
    # vs a dense numpy power iteration with identical damping/rounds
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from nise_ray.ops.graph import pagerank_dup_graph
    vecs = ([[1.0, 0.0]] * 3          # K3: ids 0,1,2
            + [[0.0, 1.0]] * 2        # edge: ids 3,4
            + [[1.0, 1.0]])           # isolated: id 5
    t = pa.table({
        "vec_id": pa.array(range(6), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "embeddings.parquet"))
        got = pagerank_dup_graph(d, threshold=0.9, n_iter=10,
                                 round_to=9).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
    # dense reference
    n, damping = 6, 0.85
    adj = np.zeros((n, n))
    for a, b in [(0, 1), (0, 2), (1, 2), (3, 4)]:
        adj[a, b] = adj[b, a] = 1
    deg = adj.sum(axis=1)
    rank = np.full(n, 1 / n)
    for _ in range(10):
        contrib = np.zeros(n)
        for s in range(n):
            if deg[s]:
                contrib += adj[s] * (rank[s] / deg[s])
        dangling = rank[deg == 0].sum()
        rank = (1 - damping) / n + damping * (contrib + dangling / n)
    assert np.allclose(got["rank"].to_numpy(), rank, atol=1e-8)
    # connected nodes outrank the isolated one (which only collects the
    # teleport + its own dangling reflux); total mass sums to 1
    assert got["rank"][0] > got["rank"][5]
    assert got["rank"][3] > got["rank"][5]
    assert abs(got["rank"].sum() - 1.0) < 1e-6


def test_pagerank_dup_graph_empty(ray_session):
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from nise_ray.ops.graph import pagerank_dup_graph
    t = pa.table({
        "vec_id": pa.array([7], pa.int64()),
        "embedding": pa.array([[1.0, 0.0]], pa.list_(pa.float32())),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "embeddings.parquet"))
        got = pagerank_dup_graph(d, threshold=0.9)
    assert got.num_rows == 1
    assert got.column("rank")[0].as_py() == 1.0


@pytest.mark.parametrize("bmax", PATHS)
def test_brand_supplier_counts_matches_duckdb(ray_session, bmax):
    from nise_ray.ops.relational2 import brand_supplier_counts
    got = brand_supplier_counts(SF, broadcast_max=bmax).to_pandas() \
        .reset_index(drop=True)
    want = _con().execute("""
        SELECT p_brand, CAST(count(DISTINCT l_suppkey) AS BIGINT)
                 AS supplier_cnt
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_size BETWEEN 1 AND 25
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand ORDER BY p_brand
    """).fetchdf()
    assert list(got["p_brand"]) == list(want["p_brand"])
    assert list(got["supplier_cnt"]) == list(want["supplier_cnt"])


@pytest.mark.parametrize("bmax", PATHS)
def test_brand_supplier_counts_empty_window(ray_session, bmax):
    from nise_ray.ops.relational2 import brand_supplier_counts
    got = brand_supplier_counts(SF, size_lo=900, size_hi=999,
                                broadcast_max=bmax)
    assert got.num_rows == 0


def test_user_props_bitmask_matches_duckdb(ray_session):
    from nise_ray.ops.strings import user_props_bitmask
    got = user_props_bitmask(SF).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    want = _con().execute("""
        WITH k AS (
            SELECT user_id,
                   CAST(NULLIF(regexp_extract(props, '"k": (\\d+)', 1),
                               '') AS BIGINT) AS kv
            FROM events)
        SELECT user_id, CAST(count(kv) AS BIGINT) AS n_k,
               CAST(bit_or(kv) AS BIGINT) AS k_or,
               CAST(bit_and(kv) AS BIGINT) AS k_and,
               CAST(bit_xor(kv) AS BIGINT) AS k_xor
        FROM k GROUP BY user_id ORDER BY user_id
    """).fetchdf()
    for c in ["user_id", "n_k", "k_or", "k_and", "k_xor"]:
        assert list(got[c]) == list(want[c]), c


def test_user_props_bitmask_all_null_group(ray_session):
    # a user whose props never match the pattern -> NULL masks, n_k=0
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from nise_ray.ops.strings import user_props_bitmask
    t = pa.table({
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "props": pa.array(['{"k": 5}', '{"k": 3}', "no digits here"],
                          pa.string()),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        got = user_props_bitmask(d).to_pandas().set_index("user_id")
    assert got.loc[1, "k_or"] == 7 and got.loc[1, "k_and"] == 1
    assert got.loc[1, "k_xor"] == 6 and got.loc[1, "n_k"] == 2
    assert got.loc[2, "n_k"] == 0
    assert got.loc[2, "k_or"] != got.loc[2, "k_or"]  # NULL -> NaN
