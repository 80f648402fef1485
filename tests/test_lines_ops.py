"""Line-level dedup family (nise_ray/ops/lines.py) vs DuckDB at sf0.001
plus kernel-level edge cases: the deterministic 10-token re-wrap, the
C4-style duplicate-line census, RefinedWeb-style per-doc line dedup
accounting, and the rolling 7-day distinct-active-users window rewritten
as interval coverage."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"

LINES_CTE = """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                  FROM documents),
         expl AS (SELECT doc_id, t,
                         unnest(generate_series(0,
                           CAST(floor((len(t)-1)/10) AS BIGINT))) AS i
                  FROM toks),
         lines AS (SELECT doc_id,
                          array_to_string(t[(i*10+1):(i*10+10)], ' ')
                            AS line
                   FROM expl)
"""


def _con():
    con = duckdb.connect()
    for t in ["documents", "events"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_explode_lines_edges():
    from nise_ray.ops.lines import _explode_lines
    texts = ["a b c d e f g h i j k l",  # 12 toks -> 10 + 2
             "x",                        # 1 tok   -> itself
             "",                         # split(' ') = [''] -> one '' line
             " ".join(str(i) for i in range(20)),  # exactly 2 full lines
             "one two"]
    b = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                  "text": pa.array(texts)})
    out = _explode_lines(b)
    assert out.column("line").to_pylist() == [
        "a b c d e f g h i j", "k l", "x", "",
        " ".join(str(i) for i in range(10)),
        " ".join(str(i) for i in range(10, 20)), "one two"]
    assert out.column("doc_id").to_pylist() == [0, 0, 1, 2, 3, 3, 4]
    # sliced (nonzero-offset) batches explode identically
    out2 = _explode_lines(b.slice(2, 3))
    assert out2.column("line").to_pylist() == out.column("line") \
        .to_pylist()[3:]
    # lines re-join back to the original text
    joined = {}
    for d, ln in zip(out.column("doc_id").to_pylist(),
                     out.column("line").to_pylist()):
        joined[d] = (joined.get(d, "") + " " + ln).strip() if d in joined \
            else ln
    assert [joined[i] for i in range(5)] == texts


def test_duplicate_lines_matches_duckdb(ray_session):
    from nise_ray.ops.lines import duplicate_lines_docs
    got = _sorted(duplicate_lines_docs(SF).to_pandas())
    want = _sorted(_con().execute(LINES_CTE + """
        SELECT line, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               count(*) AS n_occurrences
        FROM lines GROUP BY line
        HAVING count(DISTINCT doc_id) >= 2
    """).fetchdf())
    assert len(got) > 0
    assert (got["n_occurrences"] >= got["n_docs"]).all()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_line_dedup_matches_duckdb(ray_session):
    from nise_ray.ops.lines import line_dedup_docs
    got = _sorted(line_dedup_docs(SF).to_pandas())
    want = _sorted(_con().execute(LINES_CTE + """
        , marked AS (SELECT doc_id, line,
                            count(DISTINCT doc_id)
                              OVER (PARTITION BY line) AS nd
                     FROM lines)
        SELECT doc_id, count(*) AS n_lines,
               CAST(sum(CASE WHEN nd < 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_kept,
               CAST(coalesce(sum(CASE WHEN nd < 2 THEN len(line)
                                      ELSE 0 END), 0) AS BIGINT)
                 AS kept_chars
        FROM marked GROUP BY doc_id
    """).fetchdf())
    assert len(got) > 0
    assert (got["n_kept"] <= got["n_lines"]).all()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # cross-consistency with the census: total dropped occurrences ==
    # total occurrences of duplicated lines
    from nise_ray.ops.lines import duplicate_lines_docs
    dup = duplicate_lines_docs(SF).to_pandas()
    assert int((got["n_lines"] - got["n_kept"]).sum()) == \
        int(dup["n_occurrences"].sum())


def test_rolling_wau_matches_duckdb(ray_session):
    from nise_ray.ops.lines import rolling_active_users
    got = _sorted(rolling_active_users(SF).to_pandas())
    want = _sorted(_con().execute("""
        WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS day
                      FROM events)
        SELECT d.day,
               CAST((SELECT count(DISTINCT e.user_id) FROM events e
                     WHERE date_trunc('day', e.ts)
                       BETWEEN d.day - INTERVAL 6 DAY AND d.day)
                    AS BIGINT) AS wau
        FROM days d
    """).fetchdf())
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_rolling_wau_interval_merge_property(ray_session, tmp_path):
    """Planted case exercising run merges, gaps > window, and the
    remainder calendar: user 1 active on days {0, 3, 12}, user 2 on
    {0}, window 7 — coverage computed by brute force."""
    days_u1 = [0, 3, 12]
    days_u2 = [0]
    rows = [(d, 1) for d in days_u1] + [(d, 2) for d in days_u2]
    ts = pa.array([d * 86_400_000_000 for d, _ in rows],
                  pa.timestamp("us"))
    t = pa.table({"ts": ts,
                  "user_id": pa.array([u for _, u in rows], pa.int64())})
    import pyarrow.parquet as pq
    pq.write_table(t, tmp_path / "events.parquet")
    from nise_ray.ops.lines import rolling_active_users
    got = rolling_active_users(str(tmp_path)).to_pandas()
    by_day = dict(zip(
        got["day"].astype("datetime64[s]").astype("int64") // 86_400,
        got["wau"]))
    active = {1: set(days_u1), 2: set(days_u2)}
    for d in sorted({0, 3, 12}):
        expect = sum(1 for u, ds in active.items()
                     if any(d - 6 <= a <= d for a in ds))
        assert by_day[d] == expect, (d, by_day[d], expect)
    assert set(by_day) == {0, 3, 12}


def test_line_dedup_mark_modes_parity(ray_session, tmp_path):
    """Broadcast (string-confirmed probe) and exchange mark modes return
    identical per-doc accounting on a planted corpus that includes a
    near-universal boilerplate line (the skew case the two-level census
    exists for)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    header = " ".join(f"h{i}" for i in range(10))  # exactly one line
    texts, ids = [], []
    for d in range(40):
        body = " ".join(f"w{d}_{j}" for j in range(13))
        texts.append(header + " " + body)   # header + 2 more lines
        ids.append(d)
    texts.append("unique solo doc")  # no dup lines
    ids.append(99)
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array(texts),
                             "lang": pa.array(["py"] * len(ids)),
                             "source": pa.array(["s"] * len(ids)),
                             "n_chars": pa.array(
                                 [len(t) for t in texts], pa.int64())}),
                   tmp_path / "documents.parquet")
    from nise_ray.ops.lines import duplicate_lines_docs, line_dedup_docs
    got_b = line_dedup_docs(str(tmp_path), mark_mode="broadcast") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    got_e = line_dedup_docs(str(tmp_path), mark_mode="exchange") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_b, got_e)
    # the header line (in all 40 docs) is the only dup line
    census = duplicate_lines_docs(str(tmp_path)).to_pandas()
    assert len(census) == 1 and census.iloc[0]["n_docs"] == 40
    hdr_docs = got_b[got_b.doc_id < 99]
    assert (hdr_docs["n_lines"] == 3).all()
    assert (hdr_docs["n_kept"] == 2).all()
    solo = got_b[got_b.doc_id == 99].iloc[0]
    assert solo["n_lines"] == 1 and solo["n_kept"] == 1
