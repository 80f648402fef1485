import numpy as np
import pyarrow.parquet as pq

from nise_ray.util import collect_table

SF = "/root/testdata/sf0.001"


def test_windowed_event_counts(ray_session):
    from nise_ray.ops.events import MICROS_PER_HOUR, windowed_event_counts
    t = collect_table(windowed_event_counts(SF, hours=1))
    raw = pq.read_table(f"{SF}/events.parquet", columns=["ts", "value"])
    assert t.column("n_events").to_pylist()
    assert sum(t.column("n_events").to_pylist()) == raw.num_rows
    # window starts are hour-aligned
    ws = t.column("window_start").cast("int64").to_numpy(zero_copy_only=False)
    assert (ws % MICROS_PER_HOUR == 0).all()


def test_user_event_stats(ray_session):
    from nise_ray.ops.events import user_event_stats
    t = collect_table(user_event_stats(SF))
    raw = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "value"])
    assert sum(t.column("n_events").to_pylist()) == raw.num_rows
    total = sum(t.column("total_value").to_pylist())
    expect = raw.column("value").to_numpy().sum()
    assert abs(total - expect) < 1.0


def test_top_docs_by_len(ray_session):
    from nise_ray.ops.events import top_docs_by_len
    t = top_docs_by_len(SF, k=10)
    assert t.num_rows == 10
    lens = t.column("n_chars").to_pylist()
    assert lens == sorted(lens, reverse=True)
    raw = pq.read_table(f"{SF}/documents.parquet", columns=["n_chars"])
    assert lens[0] == max(raw.column("n_chars").to_pylist())


def test_sliding_windows_match_duckdb(ray_session):
    import duckdb

    from nise_ray.ops.events import sliding_window_counts
    from nise_ray.util import collect_table
    SF = "/root/testdata/sf0.001"
    got = collect_table(sliding_window_counts(SF, 1, 30)).to_pandas() \
        .sort_values("window_start").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute("""
        SELECT make_timestamp(win_us) AS window_start,
               count(*) AS n_events, round(sum(value), 4) AS sum_value
        FROM (SELECT epoch_us(ts) AS tus, value FROM events) e
        CROSS JOIN (SELECT unnest(range(0, 2)) AS i) s
        CROSS JOIN LATERAL (SELECT (tus // 1800000000 - s.i)
                                   * 1800000000 AS win_us) w
        WHERE win_us + 3600000000 > tus
        GROUP BY win_us ORDER BY window_start
    """).fetchdf()
    import numpy as np
    assert list(got["window_start"]) == list(want["window_start"])
    assert list(got["n_events"]) == list(want["n_events"])
    assert np.allclose(got["sum_value"], want["sum_value"])


def test_top_tokens_match_duckdb(ray_session):
    import duckdb

    from nise_ray.ops.textstats import top_tokens
    SF = "/root/testdata/sf0.001"
    got = top_tokens(SF, k=20).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute("""
        SELECT token, count(*) AS n
        FROM (SELECT unnest(regexp_extract_all(text, '[A-Za-z0-9_]+'))
                     AS token FROM documents)
        GROUP BY token ORDER BY n DESC, token LIMIT 20
    """).fetchdf()
    assert list(got["token"]) == list(want["token"])
    assert list(got["n"]) == list(want["n"])


def test_lang_quantiles_sketch_error_bound(ray_session):
    """The DDSketch-style sketch path must return EXACT group counts and
    quantile estimates within its alpha relative-error guarantee of the
    exact quantile_disc values (for every group, both quantiles)."""
    from nise_ray.ops.events import (
        lang_length_quantiles,
        lang_length_quantiles_sketch,
    )
    from nise_ray.util import collect_table
    alpha = 0.01
    exact = collect_table(lang_length_quantiles(SF))
    sketch = collect_table(lang_length_quantiles_sketch(SF, alpha=alpha))
    e = {r["lang"]: r for r in exact.to_pylist()}
    s = {r["lang"]: r for r in sketch.to_pylist()}
    assert set(e) == set(s) and len(e) > 0
    for lang, er in e.items():
        sr = s[lang]
        assert sr["n_docs"] == er["n_docs"]
        for col in ("p50_chars", "p90_chars"):
            rel = abs(sr[col] - er[col]) / max(er[col], 1)
            assert rel <= alpha, (lang, col, sr[col], er[col], rel)


def test_event_interarrival_matches_duckdb(ray_session):
    """LAG/LEAD gaps per user, NULLs at partition edges."""
    import duckdb

    from nise_ray.ops.events import event_interarrival
    sf = "/root/testdata/sf0.001"
    got = event_interarrival(sf).to_pandas() \
        .sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    want = duckdb.connect().execute(f"""
        SELECT user_id, event_id, ts,
               date_diff('microsecond', lag(ts) OVER w, ts) AS gap_prev_us,
               date_diff('microsecond', ts, lead(ts) OVER w) AS gap_next_us
        FROM read_parquet('{sf}/events.parquet')
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, ts, event_id
    """).fetchdf()
    assert len(got) == len(want)
    assert list(got["event_id"]) == list(want["event_id"])
    for col in ["gap_prev_us", "gap_next_us"]:
        g, w = got[col], want[col]
        assert list(g.isna()) == list(w.isna())
        assert list(g.dropna().astype("int64")) == \
            list(w.dropna().astype("int64"))


def test_user_value_quartiles_matches_duckdb(ray_session):
    """NTILE(4) per user vs DuckDB, exact bucket assignment."""
    import duckdb

    from nise_ray.ops.events import user_value_quartiles
    sf = "/root/testdata/sf0.001"
    got = user_value_quartiles(sf).to_pandas() \
        .sort_values(["user_id", "value", "event_id"]).reset_index(drop=True)
    want = duckdb.connect().execute(f"""
        SELECT user_id, event_id, value,
               CAST(ntile(4) OVER (PARTITION BY user_id
                                   ORDER BY value, event_id) AS BIGINT)
                 AS quartile
        FROM read_parquet('{sf}/events.parquet')
        ORDER BY user_id, value, event_id
    """).fetchdf()
    assert list(got["event_id"]) == list(want["event_id"])
    assert list(got["quartile"]) == list(want["quartile"])


def test_ntile_small_partitions(ray_session):
    """NTILE with fewer rows than tiles: buckets 1..m, sizes 1 (ANSI)."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from nise_ray.ops.events import user_value_quartiles
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.table({
            "user_id": pa.array([1, 1, 2, 3, 3, 3, 3, 3], pa.int64()),
            "event_id": pa.array(list(range(8)), pa.int64()),
            "value": pa.array([5.0, 1.0, 9.0, 4.0, 3.0, 2.0, 1.0, 0.0],
                              pa.float64()),
        }), os.path.join(d, "events.parquet"))
        got = user_value_quartiles(d).to_pandas() \
            .sort_values(["user_id", "value", "event_id"]) \
            .reset_index(drop=True)
        # user 1 (2 rows) -> tiles 1,2; user 2 (1 row) -> 1;
        # user 3 (5 rows, 4 tiles) -> sizes 2,1,1,1
        assert list(got["quartile"]) == [1, 2, 1, 1, 1, 2, 3, 4]


def test_top_tokens_sketch_error_bound(ray_session):
    """Misra-Gries truncation bound: estimates only UNDER-count, by at
    most the summed per-block truncation bound; with a forcing-small
    capacity the bound must be non-trivial (truncation actually
    happened) yet still contain the exact counts."""
    from nise_ray.ops.textstats import top_tokens, top_tokens_sketch
    sf = "/root/testdata/sf0.001"
    exact = top_tokens(sf, k=200)
    exact_n = dict(zip(exact.column("token").to_pylist(),
                       exact.column("n").to_pylist()))
    # the synthetic corpus vocab is ~31 tokens, so capacity=8 forces
    # real truncation in every block
    sk = top_tokens_sketch(sf, k=10, capacity=8)
    assert sk.num_rows == 10
    bound = sk.column("err_bound")[0].as_py()
    assert bound > 0
    for tok, est in zip(sk.column("token").to_pylist(),
                        sk.column("n_est").to_pylist()):
        assert tok in exact_n
        assert 0 <= exact_n[tok] - est <= bound, (tok, est, exact_n[tok])
    # sanity: a generous capacity reproduces the exact top-k verbatim
    sk_big = top_tokens_sketch(sf, k=20, capacity=100_000)
    assert sk_big.column("err_bound")[0].as_py() == 0
    assert sk_big.column("token").to_pylist() == \
        exact.column("token").to_pylist()[:20]
    assert sk_big.column("n_est").to_pylist() == \
        exact.column("n").to_pylist()[:20]


def test_lang_quantiles_cont_matches_duckdb(ray_session):
    """percentile_cont interpolation vs DuckDB quantile_cont."""
    import duckdb

    from nise_ray.ops.events import lang_length_quantiles_cont
    sf = "/root/testdata/sf0.001"
    got = lang_length_quantiles_cont(sf).to_pandas() \
        .sort_values("lang").reset_index(drop=True)
    want = duckdb.connect().execute(f"""
        SELECT lang, count(*) AS n_docs,
               round(quantile_cont(n_chars, 0.5), 4) AS p50_chars,
               round(quantile_cont(n_chars, 0.9), 4) AS p90_chars
        FROM read_parquet('{sf}/documents.parquet')
        GROUP BY lang ORDER BY lang
    """).fetchdf()
    assert got.to_dict("list") == want.to_dict("list")


def test_user_event_paths_match_python(ray_session):
    import pyarrow as pa

    from nise_ray.ops.events import user_event_paths
    t = collect_table(user_event_paths(SF)).sort_by("user_id")
    raw = pq.read_table(f"{SF}/events.parquet",
                        columns=["user_id", "ts", "event_id", "event_type"])
    rows = sorted(zip(raw.column("user_id").to_pylist(),
                      raw.column("ts").cast(pa.int64()).to_pylist(),
                      raw.column("event_id").to_pylist(),
                      raw.column("event_type").to_pylist()))
    expect = {}
    for u, _, _, e in rows:
        expect.setdefault(u, []).append(e)
    assert t.column("user_id").to_pylist() == sorted(expect)
    for uid, n, path in zip(t.column("user_id").to_pylist(),
                            t.column("n_events").to_pylist(),
                            t.column("path").to_pylist()):
        assert n == len(expect[uid])
        assert path == "->".join(expect[uid])


def test_user_top_event_match_python(ray_session):
    from collections import Counter

    from nise_ray.ops.events import user_top_event
    t = collect_table(user_top_event(SF)).sort_by("user_id")
    raw = pq.read_table(f"{SF}/events.parquet",
                        columns=["user_id", "event_type"])
    per_user = {}
    for u, e in zip(raw.column("user_id").to_pylist(),
                    raw.column("event_type").to_pylist()):
        per_user.setdefault(u, Counter())[e] += 1
    assert t.column("user_id").to_pylist() == sorted(per_user)
    for uid, top, n in zip(t.column("user_id").to_pylist(),
                           t.column("top_event").to_pylist(),
                           t.column("n").to_pylist()):
        c = per_user[uid]
        best = min((e for e in c if c[e] == max(c.values()))), max(c.values())
        assert (top, n) == (best[0], best[1])


def test_lang_mad_chars_matches_duckdb(ray_session):
    import duckdb

    from nise_ray.ops.events import lang_mad_chars
    got = lang_mad_chars(SF).to_pandas() \
        .sort_values("lang").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute("""
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               round(median(n_chars), 4) AS median_chars,
               round(mad(n_chars), 4) AS mad_chars
        FROM documents GROUP BY lang ORDER BY lang
    """).fetchdf()
    assert list(got["lang"]) == list(want["lang"])
    assert list(got["n_docs"]) == list(want["n_docs"])
    assert (got["median_chars"].to_numpy()
            == want["median_chars"].to_numpy()).all()
    assert (got["mad_chars"].to_numpy()
            == want["mad_chars"].to_numpy()).all()


def test_lang_mad_chars_planted(ray_session):
    # hand-computed: [1,1,2,10] -> median 1.5, deviations [.5,.5,.5,8.5]
    # -> mad 0.5; singleton group -> mad 0
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from nise_ray.ops.events import lang_mad_chars
    t = pa.table({
        "lang": pa.array(["a"] * 4 + ["b"], pa.string()),
        "n_chars": pa.array([1, 1, 2, 10, 5], pa.int64()),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        got = lang_mad_chars(d).to_pandas().set_index("lang")
    assert got.loc["a", "median_chars"] == 1.5
    assert got.loc["a", "mad_chars"] == 0.5
    assert got.loc["b", "mad_chars"] == 0.0


def test_zipf_fit_matches_duckdb(ray_session):
    import duckdb

    from nise_ray.ops.textstats import zipf_fit
    got = zipf_fit(SF).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute("""
        WITH counts AS (
            SELECT tok, count(*) AS n FROM (
                SELECT unnest(regexp_extract_all(text, '[A-Za-z0-9_]+'))
                       AS tok FROM documents) t
            WHERE tok <> '' GROUP BY tok),
        ranked AS (
            SELECT n, row_number() OVER (ORDER BY n DESC, tok) AS rnk
            FROM counts)
        SELECT CAST(count(*) AS BIGINT) AS n_types,
               round(regr_slope(log2(n), log2(rnk)), 4) AS zipf_slope,
               round(regr_intercept(log2(n), log2(rnk)), 4)
                 AS zipf_intercept
        FROM ranked
    """).fetchdf()
    assert got["n_types"][0] == want["n_types"][0]
    assert got["zipf_slope"][0] == want["zipf_slope"][0]
    assert got["zipf_intercept"][0] == want["zipf_intercept"][0]
    assert got["zipf_slope"][0] < 0  # frequency decreases with rank


def test_retention_cohorts_matches_duckdb(ray_session):
    import duckdb

    from nise_ray.ops.events import retention_cohorts

    sf = "/root/testdata/sf0.001"
    got = retention_cohorts(sf).to_pandas()
    want = duckdb.execute(f"""
        WITH ud AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d
                    FROM read_parquet('{sf}/events.parquet')),
        c AS (SELECT user_id, min(d) AS cohort FROM ud GROUP BY user_id)
        SELECT c.cohort AS cohort_day,
               CAST(date_diff('day', c.cohort, ud.d) AS BIGINT)
                   AS day_offset,
               count(*) AS n_users
        FROM ud JOIN c USING (user_id)
        GROUP BY 1, 2 ORDER BY 1, 2
    """).fetchdf()
    assert list(got["cohort_day"]) == list(want["cohort_day"])
    assert list(got["day_offset"]) == list(want["day_offset"])
    assert list(got["n_users"]) == list(want["n_users"])
    # day-0 row exists for every cohort and equals the cohort size
    d0 = got[got["day_offset"] == 0]
    assert set(got["cohort_day"]) == set(d0["cohort_day"])


def test_ohlc_resample_matches_duckdb(ray_session):
    import duckdb

    from nise_ray.ops.events import ohlc_resample
    got = collect_table(ohlc_resample(SF)).to_pandas() \
        .sort_values("bucket").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute("""
        WITH ranked AS (
          SELECT date_trunc('hour', ts) AS bucket, value,
                 row_number() OVER (PARTITION BY date_trunc('hour', ts)
                                    ORDER BY ts, event_id) AS rn_a,
                 row_number() OVER (PARTITION BY date_trunc('hour', ts)
                                    ORDER BY ts DESC, event_id DESC) AS rn_d
          FROM events)
        SELECT bucket, count(*) AS n_events,
               max(CASE WHEN rn_a = 1 THEN value END) AS open_value,
               max(value) AS high_value,
               min(value) AS low_value,
               max(CASE WHEN rn_d = 1 THEN value END) AS close_value,
               round(sum(value), 4) AS sum_value
        FROM ranked GROUP BY bucket ORDER BY bucket
    """).fetchdf()
    assert len(got) == len(want) > 0
    assert list(got["bucket"]) == list(want["bucket"])
    for c in ["n_events", "open_value", "high_value", "low_value",
              "close_value"]:
        assert list(got[c]) == list(want[c]), c
    assert np.allclose(got["sum_value"], want["sum_value"], atol=1e-4)


def test_ohlc_resample_cross_batch_merge(ray_session):
    # force many tiny partials: open/close must survive the partial
    # merge even when each input batch holds a fragment of every bucket
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq2

    from nise_ray.ops import events as ev

    rng = np.random.default_rng(7)
    n = 4000
    ts = rng.integers(0, 6 * ev.MICROS_PER_HOUR, n)
    tbl = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
        "value": pa.array(rng.normal(size=n), pa.float64()),
    })
    with tempfile.TemporaryDirectory() as d:
        # many small row groups -> many partial batches per bucket
        pq2.write_table(tbl, os.path.join(d, "events.parquet"),
                        row_group_size=97)
        got = collect_table(ev.ohlc_resample(d)).to_pandas() \
            .sort_values("bucket").reset_index(drop=True)
    order = np.lexsort((np.arange(n), ts))
    bkt = (ts // ev.MICROS_PER_HOUR) * ev.MICROS_PER_HOUR
    vals = tbl.column("value").to_numpy()
    for i, b in enumerate(got["bucket"]):
        b_us = b.value // 1000 if hasattr(b, "value") else int(b)
        # pandas Timestamp.value is ns
        rows = order[bkt[order] == b_us]
        assert got["open_value"][i] == vals[rows[0]]
        assert got["close_value"][i] == vals[rows[-1]]
        assert got["n_events"][i] == len(rows)
        assert got["high_value"][i] == vals[rows].max()


def test_gopher_quality_matches_duckdb(ray_session):
    import duckdb

    from nise_ray.ops.textstats import gopher_quality
    got = collect_table(gopher_quality(SF)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    import __ray_entry__ as e
    want = con.execute(
        e.oracle_sql()["gopher_quality"] + " ORDER BY doc_id").fetchdf()
    assert len(got) == len(want) > 0
    for c in got.columns:
        assert list(got[c]) == list(want[c]), c


def test_gopher_quality_edge_docs(ray_session):
    # empty doc, symbol-heavy doc, clean passing doc
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq2

    from nise_ray.ops.textstats import gopher_quality
    passing = ("the cat and the dog ran to the park in the rain "
               "and it was fun for all of them that day ") * 3
    docs = ["", "### ### ... ### ...", passing]
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(docs, pa.string()),
    })
    with tempfile.TemporaryDirectory() as d:
        pq2.write_table(tbl, os.path.join(d, "documents.parquet"))
        got = collect_table(gopher_quality(d)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
    assert got["n_words"].tolist()[0] == 0
    assert got["mean_word_len"][0] == 0.0
    assert got["passes"].tolist() == [0, 0, 1]
    assert got["symbol_ratio"][1] > 0.1 and got["alpha_word_ratio"][1] == 0.0


def test_daily_type_coverage_full_outer_nulls(ray_session):
    # planted: day 0 has only clicks, day 2 only errors, day 1 both —
    # the NULL pattern is the FULL OUTER contract
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq2

    from nise_ray.ops import events as ev
    day = 24 * ev.MICROS_PER_HOUR
    rows = [(0, "click"), (int(0.5 * day), "click"),
            (day + 1, "click"), (day + 2, "error"),
            (2 * day + 5, "error"), (2 * day + 6, "error"),
            (day + 3, "view")]          # other types never counted
    tbl = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([r[0] for r in rows], pa.int64())
                .cast(pa.timestamp("us")),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
    })
    with tempfile.TemporaryDirectory() as d:
        pq2.write_table(tbl, os.path.join(d, "events.parquet"))
        got = collect_table(ev.daily_type_coverage(d)).to_pandas() \
            .sort_values("day").reset_index(drop=True)
    assert len(got) == 3
    assert got["n_a"].fillna(-1).tolist() == [2, 1, -1]
    assert got["n_b"].fillna(-1).tolist() == [-1, 1, 2]
