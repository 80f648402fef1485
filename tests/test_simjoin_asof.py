"""Exact token-Jaccard similarity join, as-of join, and per-lang
quantiles — each checked against a brute-force / DuckDB reference at
sf0.001 (the driver's oracle re-checks at sf0.01)."""

import re

import duckdb
import numpy as np
import pyarrow.parquet as pq

from nise_ray.util import collect_table

SF = "/root/testdata/sf0.001"
_TOK = re.compile(r"[A-Za-z0-9_]+")


def test_token_jaccard_matches_bruteforce(ray_session):
    from nise_ray.ops.simjoin import token_jaccard_pairs
    tau = 0.5
    got = token_jaccard_pairs(SF, tau=tau)
    raw = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    sets = {int(i): frozenset(_TOK.findall(t))
            for i, t in zip(raw.column("doc_id").to_pylist(),
                            raw.column("text").to_pylist())}
    ids = sorted(sets)
    want = set()
    for a_i, a in enumerate(ids):
        ta = sets[a]
        if not ta:
            continue
        for b in ids[a_i + 1:]:
            tb = sets[b]
            if not tb:
                continue
            inter = len(ta & tb)
            union = len(ta) + len(tb) - inter
            if inter >= tau * union:
                want.add((a, b, inter, union))
    have = set(zip(got.column("doc_id_u").to_pylist(),
                   got.column("doc_id_v").to_pylist(),
                   got.column("n_inter").to_pylist(),
                   got.column("n_union").to_pylist()))
    assert have == want
    assert len(want) > 10, f"fixture too sparse: {len(want)} pairs"


def test_asof_join_matches_duckdb(ray_session):
    from nise_ray.ops.events import asof_join_events
    got = collect_table(asof_join_events(SF, "click", "view"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    ot = con.execute("""
        SELECT c.event_id AS event_id, c.user_id AS user_id, c.ts AS ts,
               c.value AS value, v.ts AS right_ts, v.value AS right_value
        FROM (SELECT * FROM events WHERE event_type='click') c
        ASOF JOIN (SELECT * FROM events WHERE event_type='view') v
          ON c.user_id = v.user_id AND c.ts >= v.ts
    """).arrow()
    cols = sorted(got.column_names)
    g = got.select(cols).sort_by([(c, "ascending") for c in cols])
    o = ot.select(cols).cast(g.schema).sort_by([(c, "ascending") for c in cols])
    assert g.num_rows == o.num_rows > 50
    assert g.equals(o)


def test_asof_tie_and_boundary_semantics(ray_session):
    """Right event at exactly left.ts matches; a right from a DIFFERENT
    user never leaks across the per-user boundary; lefts with no prior
    right are dropped (inner)."""
    import os
    import tempfile

    import pyarrow as pa
    from nise_ray.ops.events import asof_join_events
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "ts": pa.array([100, 100, 50, 200, 10, 300],
                       pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array([7, 7, 7, 8, 8, 9], pa.int64()),
        "event_type": pa.array(["view", "click", "view", "click", "view",
                                "click"], pa.string()),
        "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0], pa.float64()),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        got = collect_table(asof_join_events(d, "click", "view"))
    rows = {int(e): (int(rts), rv) for e, rts, rv in zip(
        got.column("event_id").to_pylist(),
        got.column("right_ts").cast(pa.int64()).to_pylist(),
        got.column("right_value").to_pylist())}
    assert rows[2] == (100, 1.0)   # equal-ts view matches, not the t=50 one
    assert rows[4] == (10, 5.0)    # user 8's own view, not user 7's
    assert 6 not in rows           # user 9 has no view -> dropped
    assert got.num_rows == 2


def test_lang_quantiles_match_duckdb(ray_session):
    from nise_ray.ops.events import lang_length_quantiles
    got = collect_table(lang_length_quantiles(SF))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    ot = con.execute("""
        SELECT lang, count(*) AS n_docs,
               quantile_disc(n_chars, 0.5) AS p50_chars,
               quantile_disc(n_chars, 0.9) AS p90_chars
        FROM documents GROUP BY lang
    """).arrow()
    cols = sorted(got.column_names)
    g = got.select(cols).sort_by([(c, "ascending") for c in cols])
    o = ot.select(cols).cast(g.schema).sort_by([(c, "ascending") for c in cols])
    assert g.equals(o)


def test_range_join_matches_duckdb(ray_session):
    from nise_ray.ops.events import user_prior_event_counts
    got = collect_table(user_prior_event_counts(SF, window_minutes=60))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    ot = con.execute("""
        SELECT a.event_id AS event_id, count(b.event_id) AS n_prior
        FROM events a LEFT JOIN events b
          ON a.user_id = b.user_id
         AND b.ts >= a.ts - INTERVAL 1 HOUR AND b.ts < a.ts
        GROUP BY a.event_id
    """).arrow()
    cols = sorted(got.column_names)
    g = got.select(cols).sort_by([(c, "ascending") for c in cols])
    o = ot.select(cols).cast(g.schema).sort_by([(c, "ascending") for c in cols])
    assert g.equals(o)
    assert max(got.column("n_prior").to_pylist()) > 0


def test_window_running_stats_match_duckdb(ray_session):
    from nise_ray.ops.events import user_running_stats
    got = collect_table(user_running_stats(SF))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    ot = con.execute("""
        SELECT event_id, row_number() OVER w AS row_num,
               max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS running_max
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """).arrow()
    cols = sorted(got.column_names)
    g = got.select(cols).sort_by([(c, "ascending") for c in cols])
    o = ot.select(cols).cast(g.schema).sort_by([(c, "ascending") for c in cols])
    assert g.equals(o)
    # running max is genuinely running (non-decreasing within a user)
    assert max(got.column("row_num").to_pylist()) > 5


def test_source_overlap_matches_duckdb(ray_session):
    from nise_ray.ops.simjoin import source_overlap_pairs
    got = source_overlap_pairs(SF, tau=0.5)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute("""
        WITH d AS (SELECT DISTINCT doc_id,
                     unnest(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS tok
                   FROM documents),
        sz AS (SELECT doc_id, count(*) AS n FROM d GROUP BY doc_id),
        inter AS (SELECT a.doc_id u, b.doc_id v, count(*) i
                  FROM d a JOIN d b ON a.tok = b.tok AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
        p AS (SELECT u, v FROM inter
              JOIN sz su ON su.doc_id = u JOIN sz sv ON sv.doc_id = v
              WHERE CAST(i AS DOUBLE) >= 0.5 * (su.n + sv.n - i))
        SELECT LEAST(du.source, dv.source) AS source_u,
               GREATEST(du.source, dv.source) AS source_v,
               count(*) AS n_pairs
        FROM p JOIN documents du ON du.doc_id = p.u
               JOIN documents dv ON dv.doc_id = p.v
        WHERE du.source <> dv.source GROUP BY 1, 2 ORDER BY 1, 2
    """).fetchall()
    have = list(zip(got.column("source_u").to_pylist(),
                    got.column("source_v").to_pylist(),
                    got.column("n_pairs").to_pylist()))
    assert have == [tuple(r) for r in want]
    assert len(have) > 0, "fixture produced no cross-source overlap"


def test_source_overlap_join_fallback_parity(ray_session):
    """The distributed-join path (broadcast gate forced to 0) must return
    exactly the broadcast path's rollup."""
    from nise_ray.ops.simjoin import source_overlap_pairs
    a = source_overlap_pairs(SF, tau=0.5)
    b = source_overlap_pairs(SF, tau=0.5, broadcast_max=0)
    assert a.equals(b)


def test_token_jaccard_df_join_parity(ray_session):
    """The distributed df path ("join": hash join on tok + doc_id regroup
    — the 100-TB configuration, no vocab-sized broadcast) must emit
    exactly the broadcast path's pair set."""
    from nise_ray.ops.simjoin import token_jaccard_pairs
    a = token_jaccard_pairs(SF, tau=0.5, df_mode="broadcast")
    b = token_jaccard_pairs(SF, tau=0.5, df_mode="join")
    assert a.num_rows > 0
    assert a.equals(b)


def test_containment_pairs_matches_bruteforce(ray_session):
    from nise_ray.ops.simjoin import containment_token_pairs
    tau = 0.8
    got = containment_token_pairs(SF, tau=tau)
    raw = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    sets = {int(i): frozenset(_TOK.findall(t))
            for i, t in zip(raw.column("doc_id").to_pylist(),
                            raw.column("text").to_pylist())}
    ids = sorted(sets)
    want = set()
    for a_i, a in enumerate(ids):
        ta = sets[a]
        if not ta:
            continue
        for b in ids[a_i + 1:]:
            tb = sets[b]
            if not tb:
                continue
            inter = len(ta & tb)
            if inter >= tau * min(len(ta), len(tb)):
                want.add((a, b, inter, min(len(ta), len(tb))))
    have = set(zip(got.column("doc_id_u").to_pylist(),
                   got.column("doc_id_v").to_pylist(),
                   got.column("n_inter").to_pylist(),
                   got.column("n_min").to_pylist()))
    assert have == want
    assert len(want) > 0  # fixture must exercise the op


def test_containment_catches_asymmetric_pair(ray_session):
    """A small file pasted into a much larger one: containment ~1.0
    but Jaccard far below any sane tau — the case this op exists for."""
    import pyarrow as pa
    import ray

    from nise_ray.ops.simjoin import containment_token_pairs
    import nise_ray.ops.simjoin as sj

    small = " ".join(f"needle{i}" for i in range(20))
    big = " ".join(f"hay{i}" for i in range(400)) + " " + small
    other = " ".join(f"stone{i}" for i in range(50))
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([small, big, other], pa.string()),
    })
    import tempfile, os
    d = tempfile.mkdtemp()
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    got = containment_token_pairs(d, tau=0.9)
    rows = list(zip(got.column("doc_id_u").to_pylist(),
                    got.column("doc_id_v").to_pylist(),
                    got.column("n_inter").to_pylist(),
                    got.column("n_min").to_pylist()))
    assert rows == [(1, 2, 20, 20)]


def test_tfidf_cosine_matches_duckdb(ray_session):
    from nise_ray.ops.allpairs import tfidf_cosine_pairs
    got = tfidf_cosine_pairs(SF, tau=0.6).to_pandas()
    want = duckdb.execute(f"""
        WITH tf AS (SELECT doc_id, tok, count(*) AS c FROM (
            SELECT doc_id,
                   unnest(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS tok
            FROM read_parquet('{SF}/documents.parquet')) GROUP BY 1, 2),
        df AS (SELECT tok, count(*) AS dfc FROM tf GROUP BY tok),
        nn AS (SELECT count(*) AS nd
               FROM read_parquet('{SF}/documents.parquet')),
        w AS (SELECT doc_id, tf.tok, c * ln((SELECT nd FROM nn) / dfc) AS w
              FROM tf JOIN df ON tf.tok = df.tok),
        nrm AS (SELECT doc_id, sqrt(sum(w*w)) AS s FROM w GROUP BY doc_id),
        dot AS (SELECT a.doc_id AS u, b.doc_id AS v, sum(a.w*b.w) AS d
                FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
        SELECT u AS doc_id_u, v AS doc_id_v,
               round(d / (su.s * sv.s), 4) AS cosine
        FROM dot JOIN nrm su ON su.doc_id = u JOIN nrm sv ON sv.doc_id = v
        WHERE d / (su.s * sv.s) >= 0.6 ORDER BY 1, 2
    """).fetchdf()
    assert list(got["doc_id_u"]) == list(want["doc_id_u"])
    assert list(got["doc_id_v"]) == list(want["doc_id_v"])
    assert (got["cosine"].values == want["cosine"].values).all()
    assert len(got) > 0


def test_tfidf_cosine_catches_tf_skew_pair(ray_session, tmp_path):
    """A doc repeating one rare identifier dominates its TF-IDF vector:
    cosine to a doc sharing that identifier is high even though the
    token-SET Jaccard is tiny — the case weighting exists for."""
    import pyarrow as pa

    from nise_ray.ops.allpairs import tfidf_cosine_pairs

    rare = "xz_rare_sym "
    a = rare * 50 + "alpha beta"
    b = rare * 40 + " ".join(f"w{i}" for i in range(8))
    # background docs so df(rare)=2 out of many and common words exist
    bg = [" ".join(f"w{j}" for j in range(8)) + f" alpha beta g{i}"
          for i in range(20)]
    t = pa.table({
        "doc_id": pa.array(list(range(1, 23)), pa.int64()),
        "text": pa.array([a, b] + bg, pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = tfidf_cosine_pairs(str(tmp_path), tau=0.9)
    pairs = set(zip(got.column("doc_id_u").to_pylist(),
                    got.column("doc_id_v").to_pylist()))
    assert (1, 2) in pairs
    # their token-set Jaccard is far below 0.9
    ta = set(a.split())
    tb = set(b.split())
    assert len(ta & tb) / len(ta | tb) < 0.2


def test_containment_df_mode_parity(ray_session):
    """broadcast vs distributed-join df attach must emit identical
    containment pairs (mirrors the Jaccard op's df-mode parity)."""
    from nise_ray.ops.simjoin import containment_token_pairs
    a = containment_token_pairs(SF, tau=0.8, df_mode="broadcast")
    b = containment_token_pairs(SF, tau=0.8, df_mode="join")
    assert a.equals(b)
    assert a.num_rows > 0


def test_tfidf_df_mode_parity(ray_session):
    """broadcast vs distributed-join weighted-postings paths must emit
    identical cosine pairs (values bit-equal after the 1e-4 grid)."""
    from nise_ray.ops.allpairs import tfidf_cosine_pairs
    a = tfidf_cosine_pairs(SF, tau=0.6, df_mode="broadcast")
    b = tfidf_cosine_pairs(SF, tau=0.6, df_mode="join")
    assert a.num_rows == b.num_rows > 0
    assert a.column("doc_id_u").equals(b.column("doc_id_u"))
    assert a.column("doc_id_v").equals(b.column("doc_id_v"))
    ca = a.column("cosine").to_numpy()
    cb = b.column("cosine").to_numpy()
    assert (ca == cb).all()


def test_jaccard_components_vs_recursive_cte(ray_session):
    """The star-decomposition CC over the exact J>=0.8 graph must match
    DuckDB's recursive-CTE transitive closure, singletons included."""
    import duckdb
    import pandas as pd

    from nise_ray.ops.simjoin import jaccard_components
    got = jaccard_components("/root/testdata/sf0.001", tau=0.8) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "read_parquet('/root/testdata/sf0.001/documents.parquet')")
    want = con.execute("""
        WITH RECURSIVE
         d AS (SELECT DISTINCT doc_id,
                      unnest(regexp_extract_all(
                          text, '[A-Za-z0-9_]+')) AS tok
               FROM documents),
         sz AS (SELECT doc_id, count(*) AS n FROM d GROUP BY doc_id),
         e AS (SELECT a.doc_id AS u, b.doc_id AS v, count(*) AS i
               FROM d a JOIN d b ON a.tok = b.tok AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
         ed AS (SELECT u, v FROM e
                JOIN sz su ON su.doc_id = e.u
                JOIN sz sv ON sv.doc_id = e.v
                WHERE CAST(e.i AS DOUBLE) >= 0.8 * (su.n + sv.n - e.i)),
         bid AS (SELECT u, v FROM ed UNION ALL SELECT v AS u, u AS v FROM ed),
         reach(node, m) AS (
           SELECT u, v FROM bid
           UNION
           SELECT r.node, b.v FROM reach r JOIN bid b ON b.u = r.m
         )
        SELECT d2.doc_id,
               CAST(least(d2.doc_id, coalesce(min(r.m), d2.doc_id))
                    AS BIGINT) AS cluster_id
        FROM documents d2 LEFT JOIN reach r ON r.node = d2.doc_id
        GROUP BY d2.doc_id
        ORDER BY d2.doc_id""").fetchdf()
    assert len(got) == len(want) and len(got) > 0
    # structure sanity: real clusters AND real singletons both present
    sizes = got.groupby("cluster_id").size()
    assert (sizes > 1).any() and (sizes == 1).any()
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_token_jaccard_verify_join_parity(ray_session):
    """verify_mode='join' (distributed endpoint token-set attach, no
    driver-resident map) must emit pairs identical to the broadcast
    verify — the 100-TB fallback behind the verify gate."""
    from nise_ray.ops.simjoin import token_jaccard_pairs
    a = token_jaccard_pairs(SF, tau=0.5, verify_mode="broadcast")
    b = token_jaccard_pairs(SF, tau=0.5, verify_mode="join")
    assert a.num_rows > 0
    assert a.equals(b)
    # auto gate with a zero cap must pick the join path and still agree
    c = token_jaccard_pairs(SF, tau=0.5, verify_broadcast_max=0)
    assert a.equals(c)


def test_containment_verify_join_parity(ray_session):
    from nise_ray.ops.simjoin import containment_token_pairs
    a = containment_token_pairs(SF, tau=0.8, verify_mode="broadcast")
    b = containment_token_pairs(SF, tau=0.8, verify_mode="join")
    assert a.num_rows > 0
    assert a.equals(b)


def test_sha_ngram_kernel_matches_bruteforce():
    """batch_sha_ngram_hashes: per-row sorted-unique sha256[:8] trigram
    hashes vs a per-row Python reference — kernel-level, no Ray."""
    import hashlib

    import pyarrow as pa

    from nise_ray.ops.normalize import batch_sha_ngram_hashes

    texts = ["a b c d e", "", "x", "foo bar foo bar foo bar baz",
             "a  b\tc", "one two three", "t t t t"]
    flat, offs = batch_sha_ngram_hashes(pa.array(texts, pa.string()), 3)
    for i, t in enumerate(texts):
        toks = _TOK.findall(t)
        grams = {" ".join(toks[j:j + 3]) for j in range(len(toks) - 2)}
        want = sorted(int.from_bytes(
            hashlib.sha256(g.encode()).digest()[:8], "big") for g in grams)
        assert flat[offs[i]:offs[i + 1]].tolist() == want, (i, t)


def test_simhash_sha_matches_duckdb(ray_session):
    """The oracle-able SimHash: DuckDB re-derives every fingerprint bit
    by majority vote over the identical sha256 shingle hashes."""
    import pandas as pd

    from nise_ray.ops.dedupx import simhash_sha_docs
    got = simhash_sha_docs(SF).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute("""
        WITH t AS (SELECT doc_id,
                          regexp_extract_all(text, '[A-Za-z0-9_]+') AS toks
                   FROM documents),
        sh AS (SELECT DISTINCT doc_id,
                 CAST(concat('0x', substr(sha256(
                   array_to_string(toks[i:i+2], ' ')), 1, 16))
                   AS UBIGINT) AS h
               FROM t, UNNEST(range(1, greatest(len(toks)-2, 0)+1)) AS u(i)),
        bits AS (SELECT doc_id, j,
                   CASE WHEN 2*SUM(CAST((h >> CAST(j AS INTEGER)) & 1
                                        AS BIGINT)) > COUNT(*)
                        THEN CAST(1 AS UBIGINT)
                        ELSE CAST(0 AS UBIGINT) END AS bit
                 FROM sh, UNNEST(range(0, 64)) AS b(j) GROUP BY doc_id, j),
        fp AS (SELECT doc_id, bit_or(bit << CAST(j AS INTEGER)) AS f
               FROM bits GROUP BY doc_id)
        SELECT d.doc_id, coalesce(lpad(lower(to_hex(fp.f)), 16, '0'),
                                  '0000000000000000') AS simhash_hex
        FROM (SELECT DISTINCT doc_id FROM documents) d
        LEFT JOIN fp ON fp.doc_id = d.doc_id ORDER BY 1
    """).fetchdf()
    assert (got["simhash_hex"] != "0000000000000000").any()
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_ngram_jaccard_exact_matches_duckdb(ray_session):
    """Exact trigram-shingle Jaccard via the prefix-filter plan with
    sha_ngram units vs the DuckDB shingle-explode self-join."""
    import pandas as pd

    from nise_ray.ops.dedupx import ngram_jaccard_exact_pairs
    got = ngram_jaccard_exact_pairs(SF, w=3, tau=0.5).to_pandas() \
        .reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute("""
        WITH t AS (SELECT doc_id,
                          regexp_extract_all(text, '[A-Za-z0-9_]+') AS toks
                   FROM documents),
        d AS (SELECT DISTINCT doc_id,
                     array_to_string(toks[i:i+2], ' ') AS sh
              FROM t, UNNEST(range(1, greatest(len(toks)-2, 0)+1)) AS u(i)),
        sz AS (SELECT doc_id, count(*) AS n FROM d GROUP BY doc_id),
        inter AS (SELECT a.doc_id AS u, b.doc_id AS v, count(*) AS i
                  FROM d a JOIN d b ON a.sh = b.sh AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
        SELECT u AS doc_id_u, v AS doc_id_v,
               i AS n_inter, su.n + sv.n - i AS n_union
        FROM inter JOIN sz su ON su.doc_id = u JOIN sz sv ON sv.doc_id = v
        WHERE CAST(i AS DOUBLE) >= 0.5 * (su.n + sv.n - i)
        ORDER BY 1, 2
    """).fetchdf()
    assert len(got) == len(want) and len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_jaccard_threshold_sweep(ray_session):
    """The tau-sensitivity buckets must partition the tau_min pair set
    exactly (integer bucketing parity with the pair table)."""
    from nise_ray.ops.simjoin import jaccard_threshold_sweep, token_jaccard_pairs
    sweep = jaccard_threshold_sweep(SF, tau_min=0.5)
    pairs = token_jaccard_pairs(SF, tau=0.5)
    assert sweep.num_rows > 1  # more than one decile represented
    assert sum(sweep.column("n_pairs").to_pylist()) == pairs.num_rows
    ni = np.array(pairs.column("n_inter").to_pylist())
    nu = np.array(pairs.column("n_union").to_pylist())
    k = (10 * ni) // nu
    import collections
    want = collections.Counter(k.tolist())
    got = dict(zip(sweep.column("bucket").to_pylist(),
                   sweep.column("n_pairs").to_pylist()))
    assert got == dict(want)
