"""Round-3 grouped / join operators vs DuckDB at sf0.001:
exact embedding-cosine dup pairs, grouped count-distinct, grouped top-N,
distributed anti-join."""

import duckdb
import numpy as np

SF = "/root/testdata/sf0.001"


def _con(tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con


def test_embedding_dup_pairs_exact_matches_duckdb(ray_session):
    from nise_ray.ops.ann import embedding_dup_pairs_exact
    got = embedding_dup_pairs_exact(SF, threshold=0.3).to_pandas()
    want = _con(["embeddings"]).execute("""
        SELECT a.vec_id AS u, b.vec_id AS v,
               round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])), 4)
                   AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])), 4)
              >= 0.3
        ORDER BY 1, 2
    """).fetchdf()
    assert len(got) == len(want) > 0
    assert list(got["u"]) == list(want["u"])
    assert list(got["v"]) == list(want["v"])
    assert np.allclose(got["cosine"], want["cosine"], atol=2e-4)


def test_embedding_dup_pairs_exact_scale_gate(ray_session):
    import pytest
    from nise_ray.ops.ann import embedding_dup_pairs_exact
    with pytest.raises(ValueError, match="broadcast_max"):
        embedding_dup_pairs_exact(SF, broadcast_max=10)


def test_exact_pairs_superset_of_lsh_pairs(ray_session):
    """The SRP-LSH variant is approximate: every pair it reports must be a
    true pair under the exact baseline (precision 1.0 by construction —
    within-bucket scoring is exact), i.e. LSH pairs ⊆ exact pairs."""
    from nise_ray.ops.ann import embedding_dup_pairs, embedding_dup_pairs_exact
    from nise_ray.util import collect_table
    exact = embedding_dup_pairs_exact(SF, threshold=0.3)
    lsh = collect_table(embedding_dup_pairs(SF, threshold=0.3))
    exact_set = set(zip(exact.column("u").to_pylist(),
                        exact.column("v").to_pylist()))
    lsh_set = set(zip(lsh.column("u").to_pylist(),
                      lsh.column("v").to_pylist()))
    assert lsh_set <= exact_set
    # recall floor from SRP theory: P(bucket collision | cosine=0.3) =
    # (1 - acos(0.3)/pi)^8 ~ 1.6% per table, 1-(1-p)^8 ~ 12% over 8
    # tables — 0.3 is far below the 0.95 design point, so only a
    # theory-consistent floor is asserted here (the 0.95+ design point
    # recall is gated in test_training_ops)
    assert len(lsh_set) >= 0.05 * len(exact_set)


def test_event_type_user_counts_matches_duckdb(ray_session):
    from nise_ray.ops.events import event_type_user_counts
    from nise_ray.util import collect_table
    got = collect_table(event_type_user_counts(SF)) \
        .to_pandas().sort_values("event_type").reset_index(drop=True)
    want = _con(["events"]).execute("""
        SELECT event_type, count(DISTINCT user_id) AS n_users,
               count(*) AS n_events
        FROM events GROUP BY event_type ORDER BY event_type
    """).fetchdf()
    assert list(got["event_type"]) == list(want["event_type"])
    assert list(got["n_users"]) == list(want["n_users"])
    assert list(got["n_events"]) == list(want["n_events"])


def test_top_docs_per_lang_matches_duckdb(ray_session):
    from nise_ray.ops.events import top_docs_per_lang
    got = top_docs_per_lang(SF, n_per_group=3).to_pandas()
    want = _con(["documents"]).execute("""
        SELECT lang, doc_id, n_chars, rank FROM (
          SELECT lang, doc_id, n_chars,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY n_chars DESC, doc_id) AS rank
          FROM documents)
        WHERE rank <= 3 ORDER BY lang, rank
    """).fetchdf()
    assert got.values.tolist() == want.values.tolist()


def test_customers_without_orders_matches_duckdb(ray_session):
    from nise_ray.ops.relational import customers_without_orders
    got = customers_without_orders(SF).to_pandas()
    want = _con(["customer", "orders"]).execute("""
        SELECT c_nationkey, count(*) AS n_customers
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 350000)
        GROUP BY c_nationkey ORDER BY c_nationkey
    """).fetchdf()
    assert len(got) > 0
    assert got.values.tolist() == want.values.tolist()
