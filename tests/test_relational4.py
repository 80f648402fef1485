"""Round-4 fourth relational batch vs DuckDB at sf0.001: interval-
overlap self-join (counted by sweep, verified against the O(n^2) SQL
pair join), MERGE/upsert changeset application, and UNPIVOT/melt."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ["lineitem", "documents", "orders"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_shipment_overlap_counts_matches_duckdb(ray_session):
    from nise_ray.ops.relational4 import shipment_overlap_counts
    got = _sorted(shipment_overlap_counts(SF).to_pandas())
    want = _sorted(_con().execute("""
        SELECT a.l_suppkey, CAST(count(*) AS BIGINT) AS n_overlap_pairs
        FROM lineitem a JOIN lineitem b
          ON a.l_suppkey = b.l_suppkey
         AND (a.l_shipdate, a.l_orderkey, a.l_linenumber)
             < (b.l_shipdate, b.l_orderkey, b.l_linenumber)
         AND a.l_shipdate + to_days(CAST(a.l_quantity AS INTEGER))
             >= b.l_shipdate
        GROUP BY a.l_suppkey
    """).fetchdf())
    assert got.shape == want.shape and got["n_overlap_pairs"].sum() > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_shipment_overlap_sweep_matches_bruteforce(ray_session):
    # brute-force O(n^2) per supplier over the raw parquet confirms the
    # searchsorted sweep's tie handling (equal shipdates share a start;
    # order falls back to (orderkey, linenumber) exactly as the SQL
    # row-value comparison does)
    import pyarrow.parquet as pq
    from nise_ray.ops.relational4 import shipment_overlap_counts

    t = pq.read_table(f"{SF}/lineitem.parquet",
                      columns=["l_suppkey", "l_orderkey", "l_linenumber",
                               "l_shipdate", "l_quantity"])
    supp = t.column("l_suppkey").to_numpy()
    day = t.column("l_shipdate").cast("int64").to_numpy() // 86_400_000_000
    end = day + t.column("l_quantity").to_numpy().astype(np.int64)
    brute: dict[int, int] = {}
    for s in np.unique(supp):
        m = supp == s
        d, e = day[m], end[m]
        n = 0
        for i in range(len(d)):
            for j in range(len(d)):
                if i != j and d[i] <= d[j] and e[i] >= d[j] \
                        and (d[i] < d[j] or i < j):
                    # (i precedes j) under start order with stable
                    # original-row tiebreak == the (okey, lineno) order
                    # because the parquet is written in that order
                    n += 1
        if n:
            brute[int(s)] = n
    got = shipment_overlap_counts(SF).to_pandas()
    got_map = dict(zip(got["l_suppkey"].astype(int),
                       got["n_overlap_pairs"].astype(int)))
    assert got_map == brute


def test_merge_upsert_semantics(ray_session):
    from nise_ray.ops.relational4 import (MERGE_INSERT_OFFSET,
                                          merge_upsert_docs)
    import pyarrow.parquet as pq

    base = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang", "n_chars"]).to_pandas()
    got = merge_upsert_docs(SF).to_pandas()
    got_by_id = got.set_index("doc_id")

    n_upd = (base["doc_id"] % 10 == 0).sum()
    n_del = (base["doc_id"] % 10 == 1).sum()
    n_ins = (base["doc_id"] % 10 == 2).sum()
    assert len(got) == len(base) - n_del + n_ins
    # deletes gone
    for did in base.loc[base["doc_id"] % 10 == 1, "doc_id"]:
        assert did not in got_by_id.index
    # updates applied
    upd = base[base["doc_id"] % 10 == 0]
    for did, nch in zip(upd["doc_id"], upd["n_chars"]):
        assert int(got_by_id.loc[did, "n_chars"]) == int(nch) + 1000
    # inserts present under offset ids with original n_chars
    ins = base[base["doc_id"] % 10 == 2]
    for did, nch in zip(ins["doc_id"], ins["n_chars"]):
        assert int(got_by_id.loc[did + MERGE_INSERT_OFFSET, "n_chars"]) \
            == int(nch)
    # untouched rows pass through unchanged
    rest = base[base["doc_id"] % 10 >= 3]
    for did, nch in zip(rest["doc_id"], rest["n_chars"]):
        assert int(got_by_id.loc[did, "n_chars"]) == int(nch)


def test_unpivot_quality_matches_duckdb(ray_session):
    from nise_ray.ops.relational4 import unpivot_quality_metrics
    got = _sorted(unpivot_quality_metrics(SF).to_pandas())
    want = _sorted(_con().execute("""
        WITH q AS (
          SELECT doc_id,
                 CAST(length(text) AS BIGINT) AS n_chars_c,
                 CAST(length(text) - length(replace(text, chr(10), ''))
                      + 1 AS BIGINT) AS n_lines,
                 CASE WHEN length(text) = 0 THEN 0.0
                      ELSE CAST(length(regexp_replace(
                             text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                           / length(text) END AS alpha_ratio
          FROM documents)
        SELECT doc_id, 'n_chars_c' AS metric,
               CAST(n_chars_c AS DOUBLE) AS value FROM q
        UNION ALL
        SELECT doc_id, 'n_lines', CAST(n_lines AS DOUBLE) FROM q
        UNION ALL
        SELECT doc_id, 'alpha_ratio', alpha_ratio FROM q
    """).fetchdf())
    assert len(got) == 3 * len(got["doc_id"].unique())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_user_activity_streaks_matches_duckdb(ray_session):
    from nise_ray.ops.relational4 import user_activity_streaks
    got = _sorted(user_activity_streaks(SF).to_pandas())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = _sorted(con.execute("""
        WITH d AS (SELECT DISTINCT user_id,
                          epoch_us(ts) // 86400000000 AS day FROM events),
             i AS (SELECT user_id, day,
                          day - row_number() OVER (
                              PARTITION BY user_id ORDER BY day) AS isl
                   FROM d),
             s AS (SELECT user_id, isl, count(*) AS len
                   FROM i GROUP BY 1, 2)
        SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
               CAST(max(len) AS BIGINT) AS longest_streak,
               CAST(count(*) AS BIGINT) AS n_streaks
        FROM s GROUP BY user_id
    """).fetchdf())
    assert len(got) > 0
    # a streak decomposition invariant: longest <= active days, and
    # n_streaks <= n_active_days
    assert (got["longest_streak"] <= got["n_active_days"]).all()
    assert (got["n_streaks"] <= got["n_active_days"]).all()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_source_vocab_jaccard_matches_duckdb(ray_session):
    from nise_ray.ops.relational4 import source_vocab_jaccard
    got = _sorted(source_vocab_jaccard(SF).to_pandas())
    want = _sorted(_con().execute("""
        WITH st AS (SELECT DISTINCT source, token FROM (
               SELECT source,
                      unnest(regexp_extract_all(
                          text, '[A-Za-z0-9_]+')) AS token
               FROM documents)),
             sz AS (SELECT source, count(*) AS n FROM st GROUP BY 1),
             ix AS (SELECT a.source AS source_a, b.source AS source_b,
                           count(*) AS n_shared
                    FROM st a JOIN st b
                      ON a.token = b.token AND a.source < b.source
                    GROUP BY 1, 2)
        SELECT source_a, source_b, CAST(n_shared AS BIGINT) AS n_shared,
               CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared)
                 AS jaccard
        FROM ix JOIN sz sa ON sa.source = ix.source_a
                JOIN sz sb ON sb.source = ix.source_b
    """).fetchdf())
    assert len(got) > 0
    assert ((got["jaccard"] > 0) & (got["jaccard"] <= 1)).all()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_data_quality_report_discriminative(ray_session):
    from nise_ray.ops.relational4 import data_quality_report
    got = data_quality_report(SF).to_pandas().set_index("rule")
    # clean referential rules are zero, planted signals are not — the
    # report must separate them (an all-zeros engine would fail here)
    assert got.loc["orphan_lineitems", "n_violations"] == 0
    assert got.loc["duplicate_orderkeys", "n_violations"] == 0
    assert got.loc["shipped_before_order", "n_violations"] > 0
    assert got.loc["high_tax", "n_violations"] > 0


def test_denormalized_orders_mode_parity(ray_session):
    from nise_ray.ops.relational4 import denormalized_orders
    got_b = _sorted(denormalized_orders(SF, mode="broadcast").to_pandas())
    got_j = _sorted(denormalized_orders(SF, mode="join").to_pandas())
    pd.testing.assert_frame_equal(got_b, got_j, check_dtype=False,
                                  check_exact=True)
    # row-preserving: one row per order (all orders have customers)
    n_orders = _con().execute(
        "SELECT count(*) FROM orders").fetchone()[0]
    assert len(got_b) == n_orders
