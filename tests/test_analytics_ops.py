"""Round-3 analytics operators vs DuckDB at sf0.001: gap-based
sessionization, per-user event-type pivot, deterministic stratified
sampling, ROLLUP multi-level aggregates."""

import duckdb

SF = "/root/testdata/sf0.001"


def _con(tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con


def test_user_sessions_match_duckdb(ray_session):
    from nise_ray.ops.events import user_sessions
    from nise_ray.util import collect_table
    got = collect_table(user_sessions(SF, gap_minutes=30)).to_pandas() \
        .sort_values(["user_id", "session_num"]).reset_index(drop=True)
    want = _con(["events"]).execute("""
        WITH flagged AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                           > 1800000000
                      THEN 1 ELSE 0 END AS new_sess
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        numbered AS (
          SELECT user_id, ts,
                 sum(new_sess) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING)
                   AS session_num
          FROM flagged)
        SELECT user_id, session_num,
               min(ts) AS session_start, max(ts) AS session_end,
               count(*) AS n_events
        FROM numbered GROUP BY user_id, session_num
        ORDER BY user_id, session_num
    """).fetchdf()
    assert len(got) == len(want) > 0
    # every user has >1 session in a 30-day event window with 30-min gaps
    assert want["session_num"].max() > 1
    for col in ["user_id", "session_num", "n_events"]:
        assert list(got[col]) == list(want[col]), col
    for col in ["session_start", "session_end"]:
        assert list(got[col]) == list(want[col]), col


def test_user_sessions_single_user_gap_boundary(ray_session):
    """Gap exactly == gap_minutes stays in the same session (strict >)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile, os
    us = 60_000_000
    rows = {
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array([0, 30 * us, 60 * us + 1, 61 * us],
                       pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array([7, 7, 7, 7], pa.int64()),
    }
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.table(rows), os.path.join(d, "events.parquet"))
        from nise_ray.ops.events import user_sessions
        from nise_ray.util import collect_table
        got = collect_table(user_sessions(d, gap_minutes=30)).to_pandas() \
            .sort_values("session_num").reset_index(drop=True)
    # ts=0 and ts=30min: gap == 30min -> same session; ts=60min+1us opens
    # session 2 (gap 30min+1us), ts=61min joins it
    assert list(got["session_num"]) == [1, 2]
    assert list(got["n_events"]) == [2, 2]


def test_event_type_pivot_matches_duckdb(ray_session):
    from nise_ray.ops.events import event_type_pivot
    from nise_ray.util import collect_table
    got = collect_table(event_type_pivot(SF)).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    want = _con(["events"]).execute("""
        SELECT user_id,
               count(*) FILTER (event_type = 'click')    AS n_click,
               count(*) FILTER (event_type = 'error')    AS n_error,
               count(*) FILTER (event_type = 'purchase') AS n_purchase,
               count(*) FILTER (event_type = 'signup')   AS n_signup,
               count(*) FILTER (event_type = 'view')     AS n_view,
               count(*) AS n_total
        FROM events GROUP BY user_id ORDER BY user_id
    """).fetchdf()
    assert got.values.tolist() == want.values.tolist()


def test_stratified_sample_matches_duckdb(ray_session):
    from nise_ray.ops.analytics import stratified_sample_docs
    got = stratified_sample_docs(SF, k=10).to_pandas()
    want = _con(["documents"]).execute("""
        SELECT lang, doc_id, n_chars FROM documents
        QUALIFY row_number() OVER (
          PARTITION BY lang
          ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) <= 10
        ORDER BY lang, doc_id
    """).fetchdf()
    assert len(got) == len(want) > 0
    assert got.values.tolist() == want.values.tolist()


def test_snapshot_diff_matches_duckdb(ray_session):
    from nise_ray.ops.analytics import snapshot_diff_docs
    from nise_ray.util import collect_table
    got = collect_table(snapshot_diff_docs(SF)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = _con(["documents"]).execute("""
        WITH a AS (SELECT doc_id, n_chars AS va FROM documents
                   WHERE doc_id % 5 <> 0),
             b AS (SELECT doc_id,
                          n_chars + CASE WHEN doc_id % 7 = 0
                                         THEN 1 ELSE 0 END AS vb
                   FROM documents WHERE doc_id % 3 <> 0)
        SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
               CASE WHEN a.doc_id IS NULL THEN 'added'
                    WHEN b.doc_id IS NULL THEN 'removed'
                    WHEN a.va <> b.vb THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
        ORDER BY doc_id
    """).fetchdf()
    assert len(got) == len(want) > 0
    # all four statuses must actually occur in the synthetic snapshots
    assert set(want["status"]) == {"added", "removed", "changed",
                                   "unchanged"}
    assert got.values.tolist() == want.values.tolist()


def test_top_doc_terms_matches_duckdb(ray_session):
    from nise_ray.ops.textstats import top_doc_terms
    from nise_ray.util import collect_table
    got = collect_table(top_doc_terms(SF, k=3)).to_pandas() \
        .sort_values(["doc_id", "rank"]).reset_index(drop=True)
    want = _con(["documents"]).execute("""
        WITH tok AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS token
          FROM documents),
        tf AS (SELECT doc_id, token, count(*) AS tf
               FROM tok GROUP BY 1, 2),
        df AS (SELECT token, count(DISTINCT doc_id) AS df
               FROM tok GROUP BY 1)
        SELECT doc_id, token, tf, df, rank FROM (
          SELECT tf.doc_id, tf.token, tf.tf, df.df,
                 row_number() OVER (PARTITION BY tf.doc_id
                                    ORDER BY tf.tf DESC, df.df ASC,
                                             tf.token) AS rank
          FROM tf JOIN df USING (token))
        WHERE rank <= 3
        ORDER BY doc_id, rank
    """).fetchdf()
    assert len(got) == len(want) > 0
    assert got.values.tolist() == want.values.tolist()


def test_rollup_matches_duckdb(ray_session):
    from nise_ray.ops.analytics import rollup_doc_counts
    got = rollup_doc_counts(SF).to_pandas()
    want = _con(["documents"]).execute("""
        SELECT coalesce(lang, 'ALL') AS lang,
               coalesce(source, 'ALL') AS source,
               count(*) AS n_docs, sum(n_chars) AS sum_chars
        FROM documents
        GROUP BY ROLLUP(documents.lang, documents.source)
        ORDER BY 1, 2
    """).fetchdf()
    assert len(got) == len(want)
    assert got.values.tolist() == want.values.tolist()


def test_cube_doc_counts_matches_duckdb(ray_session):
    """All four CUBE grouping sets vs DuckDB GROUP BY CUBE."""
    import duckdb

    from nise_ray.ops.analytics import cube_doc_counts
    sf = "/root/testdata/sf0.001"
    got = cube_doc_counts(sf).to_pandas().reset_index(drop=True)
    want = duckdb.connect().execute(f"""
        SELECT coalesce(lang, 'ALL') AS lang,
               coalesce(source, 'ALL') AS source,
               count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM read_parquet('{sf}/documents.parquet')
        GROUP BY CUBE(lang, source) ORDER BY 1, 2
    """).fetchdf()
    assert got.to_dict("list") == want.to_dict("list")


def test_lang_char_moments_matches_duckdb(ray_session):
    """Mergeable moment sums (n, Σx, Σx²) vs DuckDB avg/stddev_pop."""
    import duckdb

    from nise_ray.ops.analytics import lang_char_moments
    sf = "/root/testdata/sf0.001"
    got = lang_char_moments(sf).to_pandas().reset_index(drop=True)
    want = duckdb.connect().execute(f"""
        SELECT lang, count(*) AS n_docs,
               round(avg(n_chars), 4) AS mean_chars,
               round(stddev_pop(n_chars), 4) AS sd_chars
        FROM read_parquet('{sf}/documents.parquet')
        GROUP BY lang ORDER BY lang
    """).fetchdf()
    assert got.to_dict("list") == want.to_dict("list")


def test_chunk_documents_matches_duckdb(ray_session):
    """Overlapping context-window chunking vs the SQL substr/range
    formulation — bit-exact including end-of-doc short chunks."""
    import duckdb

    from nise_ray.ops.analytics import chunk_documents
    from nise_ray.util import collect_table
    got = collect_table(chunk_documents(SF)).to_pandas() \
        .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute("""
        WITH n AS (SELECT doc_id, text,
                          CAST(floor((length(text)-1)/384) AS BIGINT)
                            AS last_i
                   FROM documents WHERE length(text) > 0)
        SELECT doc_id, CAST(u.i AS BIGINT) AS chunk_idx,
               substr(text, CAST(1 + u.i*384 AS BIGINT), 512) AS chunk_text
        FROM n, unnest(range(0, last_i + 1)) AS u(i)
        ORDER BY doc_id, chunk_idx
    """).fetchdf()
    assert got.equals(want)


def test_chunk_documents_degenerate(ray_session, tmp_path):
    """Empty text emits no chunks; a doc shorter than one stride emits
    exactly one chunk; reconstruction: stride-prefixes of consecutive
    chunks concatenate back to the original text."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nise_ray.ops.analytics import chunk_documents
    from nise_ray.util import collect_table
    long_text = "x" * 1000 + "tail"
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["", "short", long_text], pa.string()),
        "lang": pa.array(["en"] * 3, pa.string()),
        "source": pa.array(["s"] * 3, pa.string()),
        "n_chars": pa.array([0, 5, len(long_text)], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = collect_table(chunk_documents(str(tmp_path), size=512,
                                        stride=384)).to_pandas() \
        .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    assert 1 not in set(got["doc_id"])
    assert list(got[got["doc_id"] == 2]["chunk_text"]) == ["short"]
    chunks = list(got[got["doc_id"] == 3]["chunk_text"])
    rebuilt = "".join(c[:384] for c in chunks[:-1]) + chunks[-1]
    assert rebuilt == long_text


def test_pack_documents_invariants(ray_session):
    """Every doc packed exactly once; pack char-sums respect the budget
    (except single oversized docs); packs are doc_id-contiguous within a
    bucket; result identical when the input arrives in one block vs many
    (determinism across cluster width)."""
    import numpy as np
    import pyarrow.parquet as pq

    from nise_ray.ops.analytics import pack_documents
    from nise_ray.util import collect_table
    budget = 1500
    got = collect_table(pack_documents(SF, budget=budget,
                                       bucket_docs=100)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    n = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert len(got) == n
    assert got["doc_id"].is_unique
    sums = got.groupby("pack_id").agg(s=("n_chars", "sum"),
                                      c=("n_chars", "count"))
    over = sums[sums["s"] > budget]
    assert (over["c"] == 1).all()  # only oversized singletons exceed
    # greedy contiguity: within a bucket, pack seq is nondecreasing in
    # doc_id and a doc never fits in the previous (unfinished) pack
    got["bucket"] = got["pack_id"] // (1 << 32)
    for _, grp in got.groupby("bucket"):
        seq = (grp.sort_values("doc_id")["pack_id"] & ((1 << 32) - 1)) \
            .to_numpy()
        assert (np.diff(seq) >= 0).all()
        assert (np.diff(seq) <= 1).all()

    again = collect_table(pack_documents(SF, budget=budget,
                                         bucket_docs=100)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got.drop(columns=["bucket"]).equals(again)


def test_weighted_sample_matches_duckdb(ray_session):
    """A-Res weighted sample: the selected SET matches the SQL top-k by
    the same deterministic key (key itself not compared — engines differ
    by 1 ulp in pow), and heavier docs are overrepresented."""
    from nise_ray.ops.analytics import weighted_sample_docs
    got = weighted_sample_docs(SF, k=50).to_pandas()
    con = _con(["documents"])
    want = con.execute("""
        SELECT doc_id, n_chars FROM (
          SELECT doc_id, n_chars,
                 pow((((doc_id * 2654435761) % 4294967296) + 1)
                       / 4294967297.0,
                     1.0 / greatest(n_chars, 1)) AS key
          FROM documents ORDER BY key DESC, doc_id LIMIT 50)
        ORDER BY doc_id
    """).fetchdf()
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert list(got["n_chars"]) == list(want["n_chars"])
    # weighting property: the sample mean length exceeds the corpus mean
    corpus_mean = con.execute(
        "SELECT avg(n_chars) FROM documents").fetchone()[0]
    assert got["n_chars"].mean() > corpus_mean


def test_length_histogram_matches_duckdb(ray_session):
    from nise_ray.ops.analytics import length_histogram
    got = length_histogram(SF).to_pandas()
    want = _con(["documents"]).execute("""
        SELECT lang, (n_chars // 100) * 100 AS bucket_lo,
               count(*) AS n_docs
        FROM documents GROUP BY 1, 2 ORDER BY 1, 2
    """).fetchdf()
    assert len(got) == len(want) > 0
    assert got.values.tolist() == want.values.tolist()
    # histogram totals must equal corpus size
    n = _con(["documents"]).execute(
        "SELECT count(*) FROM documents").fetchone()[0]
    assert got["n_docs"].sum() == n


def test_prepare_training_docs_matches_python(ray_session):
    import re

    import pyarrow as pa
    import pyarrow.parquet as pq

    from nise_ray.ops.analytics import prepare_training_docs
    from nise_ray.util import collect_table

    SF = "/root/testdata/sf0.001"
    got = collect_table(prepare_training_docs(SF)).sort_by(
        [("doc_id", "ascending"), ("chunk_idx", "ascending")])
    t = pq.read_table(f"{SF}/documents.parquet")
    alpha = re.compile(r"[A-Za-z]")
    seen_texts = {}
    expect = []
    rows = sorted(zip(t.column("doc_id").to_pylist(),
                      t.column("text").to_pylist()))
    for did, txt in rows:
        n = len(txt)
        if n < 100 or len(alpha.findall(txt)) * 100 < 50 * n:
            continue
        if txt in seen_texts:  # exact dedup keeps the min doc_id
            continue
        seen_texts[txt] = did
        for i in range((n - 1) // 384 + 1):
            expect.append((did, i, txt[i * 384:i * 384 + 512]))
    assert list(zip(got.column("doc_id").to_pylist(),
                    got.column("chunk_idx").to_pylist(),
                    got.column("chunk_text").to_pylist())) == expect
    assert len(expect) > 0


def test_prepare_training_docs_join_fallback_parity(ray_session):
    """broadcast vs distributed-semi-join keep paths produce the
    identical chunk set (broadcast_max=0 forces the join)."""
    from nise_ray.ops.analytics import prepare_training_docs
    from nise_ray.util import collect_table

    SF = "/root/testdata/sf0.001"
    key = [("doc_id", "ascending"), ("chunk_idx", "ascending")]
    a = collect_table(prepare_training_docs(SF)).sort_by(key)
    b = collect_table(prepare_training_docs(SF, broadcast_max=0)) \
        .select(["doc_id", "chunk_idx", "chunk_text"]).sort_by(key)
    assert a.equals(b)


def test_lang_char_skewkurt_matches_duckdb(ray_session):
    import duckdb

    from nise_ray.ops.analytics import lang_char_skewkurt
    got = lang_char_skewkurt(SF).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute("""
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               round(skewness(n_chars), 4) AS skew_chars,
               round(kurtosis(n_chars), 4) AS kurt_chars
        FROM documents GROUP BY lang ORDER BY lang
    """).fetchdf()
    assert list(got["lang"]) == list(want["lang"])
    assert list(got["n_docs"]) == list(want["n_docs"])
    assert (got["skew_chars"].to_numpy()
            == want["skew_chars"].to_numpy()).all()
    assert (got["kurt_chars"].to_numpy()
            == want["kurt_chars"].to_numpy()).all()


def test_lang_char_skewkurt_small_groups(ray_session):
    # n=3 group: skew defined, kurtosis NULL; n=2: both NULL; constant
    # group: both NULL (m2 == 0)
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from nise_ray.ops.analytics import lang_char_skewkurt
    t = pa.table({
        "lang": pa.array(["a"] * 3 + ["b"] * 2 + ["c"] * 5, pa.string()),
        "n_chars": pa.array([10, 20, 40, 7, 9, 5, 5, 5, 5, 5], pa.int64()),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        got = lang_char_skewkurt(d).to_pandas().set_index("lang")
    assert got.loc["a", "skew_chars"] == got.loc["a", "skew_chars"]  # not NaN
    assert got.loc["a", "kurt_chars"] != got.loc["a", "kurt_chars"]  # NaN
    assert got.loc["b", "skew_chars"] != got.loc["b", "skew_chars"]
    assert got.loc["c", "skew_chars"] != got.loc["c", "skew_chars"]


def test_lang_doc_share_matches_duckdb(ray_session):
    import duckdb
    import numpy as np

    from nise_ray.ops.analytics import lang_doc_share
    got = lang_doc_share(SF).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute("""
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(*) AS DOUBLE) / (sum(count(*)) OVER ()) AS share
        FROM documents GROUP BY lang ORDER BY lang
    """).fetchdf()
    assert list(got["lang"]) == list(want["lang"])
    assert list(got["n_docs"]) == list(want["n_docs"])
    # exact-int division: bit-identical, no tolerance
    assert (got["share"].to_numpy() == want["share"].to_numpy()).all()
    assert abs(got["share"].sum() - 1.0) < 1e-12


def test_user_value_trend_matches_duckdb(ray_session):
    import duckdb
    import numpy as np

    from nise_ray.ops.analytics import user_value_trend
    got = user_value_trend(SF).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute("""
        SELECT user_id, CAST(count(value) AS BIGINT) AS n_pairs,
               round(regr_slope(value,
                     (epoch_us(ts) % 86400000000) / 1000000.0), 4) AS slope,
               round(regr_intercept(value,
                     (epoch_us(ts) % 86400000000) / 1000000.0), 4)
                 AS intercept
        FROM events GROUP BY user_id ORDER BY user_id
    """).fetchdf()
    assert list(got["user_id"]) == list(want["user_id"])
    assert list(got["n_pairs"]) == list(want["n_pairs"])
    for c in ("slope", "intercept"):
        g, w = got[c].to_numpy(), want[c].to_numpy()
        assert (np.isnan(g) == np.isnan(w)).all()
        m = ~np.isnan(g)
        assert (g[m] == w[m]).all(), c


def test_user_value_trend_degenerate(ray_session):
    # constant-x group -> NULL slope/intercept (regr_* semantics)
    import os
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nise_ray.ops.analytics import user_value_trend
    t = pa.table({
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "ts": pa.array([5_000_000, 5_000_000, 9_000_000],
                       pa.timestamp("us")),
        "value": pa.array([1.0, 3.0, 7.0], pa.float64()),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        got = user_value_trend(d).to_pandas().set_index("user_id")
    assert np.isnan(got.loc[1, "slope"]) and np.isnan(got.loc[2, "slope"])


def test_user_event_entropy_matches_duckdb(ray_session):
    import duckdb

    from nise_ray.ops.analytics import user_event_entropy
    got = user_event_entropy(SF).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute("""
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
               round(entropy(event_type), 4) AS type_entropy
        FROM events GROUP BY user_id ORDER BY user_id
    """).fetchdf()
    assert list(got["user_id"]) == list(want["user_id"])
    assert list(got["n_events"]) == list(want["n_events"])
    assert (got["type_entropy"].to_numpy()
            == want["type_entropy"].to_numpy()).all()
    # diversity bounds: 0 <= H <= log2(5) for a 5-type vocabulary
    import numpy as np
    assert (got["type_entropy"] >= 0).all()
    assert (got["type_entropy"] <= np.log2(5) + 1e-9).all()
