"""Round-4 analytics batch 2 vs DuckDB at sf0.001: PERCENT_RANK /
CUME_DIST window fractions (exact int->double divisions, checked
bit-exact) and bigram collocation lift (broadcast and distributed-join
unigram-attach modes, parity + oracle)."""

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    return con


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_percent_rank_bitexact(ray_session):
    from nise_ray.ops.analytics2 import percent_rank_docs
    got = _sorted(percent_rank_docs(SF).to_pandas())
    want = _sorted(_con().execute("""
        SELECT doc_id, lang, n_chars,
               percent_rank() OVER (PARTITION BY lang ORDER BY n_chars)
                 AS pct_rank,
               cume_dist() OVER (PARTITION BY lang ORDER BY n_chars)
                 AS cume_dist
        FROM documents""").fetchdf())
    assert len(got) == 500
    assert ((got["pct_rank"] >= 0) & (got["pct_rank"] <= 1)).all()
    assert (got["cume_dist"] > 0).all()
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)


BIGRAM_SQL = """
    WITH toks AS (SELECT doc_id,
                         regexp_extract_all(text, '[A-Za-z0-9_]+') AS t
                  FROM documents),
         expl AS (SELECT t, unnest(generate_series(1, len(t)-1)) AS i
                  FROM toks WHERE len(t) >= 2),
         big AS (SELECT t[i] AS tok_a, t[i+1] AS tok_b FROM expl),
         bc AS (SELECT tok_a, tok_b, count(*) AS n_ab
                FROM big GROUP BY 1, 2 HAVING count(*) >= 2),
         uni AS (SELECT unnest(t) AS tok FROM toks),
         uc AS (SELECT tok, count(*) AS n FROM uni GROUP BY 1),
         tot AS (SELECT count(*) AS n_total FROM uni)
    SELECT tok_a, tok_b, n_ab, ua.n AS n_a, ub.n AS n_b,
           (CAST(n_ab AS DOUBLE) * CAST(n_total AS DOUBLE)) /
           (CAST(ua.n AS DOUBLE) * CAST(ub.n AS DOUBLE)) AS lift
    FROM bc JOIN uc ua ON ua.tok = bc.tok_a
            JOIN uc ub ON ub.tok = bc.tok_b, tot
"""


def test_bigram_collocations_bitexact_and_mode_parity(ray_session):
    from nise_ray.ops.analytics2 import bigram_collocations
    got_b = _sorted(bigram_collocations(SF, df_mode="broadcast")
                    .to_pandas())
    got_j = _sorted(bigram_collocations(SF, df_mode="join").to_pandas())
    pd.testing.assert_frame_equal(got_b, got_j, check_exact=True)
    want = _sorted(_con().execute(BIGRAM_SQL).fetchdf())
    assert len(got_b) > 0
    # a bigram can't outnumber either of its unigrams
    assert (got_b["n_ab"] <= got_b[["n_a", "n_b"]].min(axis=1)).all()
    pd.testing.assert_frame_equal(got_b, want, check_dtype=False,
                                  check_exact=True)
