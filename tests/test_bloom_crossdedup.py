"""Bloom semi-join (build/probe kernels + oracle + bloom/no-bloom
parity), cross-corpus prefix dedup vs DuckDB, and hard-negative mining
label invariants — all at sf0.001."""

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_bloom_bits_no_false_negatives():
    from nise_ray.ops.bloom import _probe_positions, _set_bits, _test_bits
    m_bits, k = 1 << 16, 4
    rng_keys = (np.arange(5000, dtype=np.int64) * 2654435761) % 999983
    members, probes = rng_keys[:2000], rng_keys[2000:]
    bm = np.zeros(m_bits // 8, dtype=np.uint8)
    _set_bits(bm, _probe_positions(members, m_bits, k))
    # every member tests positive (false negatives impossible)
    assert _test_bits(bm, _probe_positions(members, m_bits, k)).all()
    # fp rate on non-members stays near the analytic bound
    nonmem = probes[~np.isin(probes, members)]
    fp = _test_bits(bm, _probe_positions(nonmem, m_bits, k)).mean()
    bound = (1 - np.exp(-k * len(members) / m_bits)) ** k
    assert fp <= 5 * bound + 0.01, (fp, bound)


def test_urgent_items_bloom_oracle_and_parity(ray_session):
    from nise_ray.ops.bloom import urgent_items_by_flag
    a = _sorted(urgent_items_by_flag(SF, use_bloom=True).to_pandas())
    b = _sorted(urgent_items_by_flag(SF, use_bloom=False).to_pandas())
    pd.testing.assert_frame_equal(a, b)  # bloom never changes results
    o = _sorted(duckdb.connect().execute(f"""
        SELECT l_returnflag, count(*) AS n_items,
               CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        FROM read_parquet('{SF}/lineitem.parquet')
        WHERE EXISTS (SELECT 1
                      FROM read_parquet('{SF}/orders.parquet')
                      WHERE o_orderkey = l_orderkey
                        AND o_orderpriority = '1-URGENT')
        GROUP BY l_returnflag""").fetchdf())
    pd.testing.assert_frame_equal(a, o)


def test_cross_dedup_docs_oracle(ray_session):
    from nise_ray.ops.dedupx import cross_dedup_docs
    got = _sorted(cross_dedup_docs(SF, prefix_chars=200).to_pandas())
    o = _sorted(duckdb.connect().execute(f"""
        SELECT d.doc_id,
               CAST(EXISTS (SELECT 1
                            FROM read_parquet('{SF}/documents.parquet') r
                            WHERE r.doc_id % 2 = 0
                              AND substr(r.text, 1, 200)
                                  = substr(d.text, 1, 200)) AS BIGINT)
                 AS in_reference
        FROM read_parquet('{SF}/documents.parquet') d
        WHERE d.doc_id % 2 = 1""").fetchdf())
    pd.testing.assert_frame_equal(got, o)
    assert (got["in_reference"] == 1).any()  # discriminative fixture


def test_hard_negatives_label_invariant(ray_session):
    from nise_ray.ops.ann import hard_negatives
    got = hard_negatives(SF, n_queries=5, k=10).to_pandas()
    labels = duckdb.connect().execute(
        f"SELECT vec_id, label FROM "
        f"read_parquet('{SF}/embeddings.parquet')").fetchdf()
    qlab = dict(zip(labels.vec_id, labels.label))
    assert len(got) > 0
    per_q = got.groupby("query_id").size()
    assert (per_q <= 10).all()
    # no negative shares its query's label, none is the query itself
    for row in got.itertuples():
        assert row.vec_id != row.query_id
        assert qlab[row.vec_id] != qlab[row.query_id]


def test_blocklist_filter_docs_oracle(ray_session):
    from nise_ray.ops.textstats import blocklist_filter_docs
    got = _sorted(blocklist_filter_docs(SF).to_pandas())
    o = _sorted(duckdb.connect().execute(f"""
        SELECT doc_id,
               CAST(length(list_filter(
                   regexp_extract_all(text, '[A-Za-z0-9_]+'),
                   t -> t IN ('dup', 'deadlock'))) AS BIGINT) AS n_blocked,
               CAST(length(list_filter(
                   regexp_extract_all(text, '[A-Za-z0-9_]+'),
                   t -> t IN ('dup', 'deadlock'))) > 0 AS BIGINT) AS blocked
        FROM read_parquet('{SF}/documents.parquet')""").fetchdf())
    pd.testing.assert_frame_equal(got, o)
