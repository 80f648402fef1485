"""Weighted (TF-multiset) similarity join family: exact join vs the
DuckDB brute-force oracle (bit-exact incl. the jw double), df-mode
parity, CWS estimator property (collision prob == weighted Jaccard),
and the LSH recall gate against the exact join."""

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"

_ORACLE = """
WITH tf AS (
  SELECT doc_id, tok, count(*) AS w
  FROM (SELECT doc_id,
               unnest(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS tok
        FROM documents)
  GROUP BY doc_id, tok),
s AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS tot FROM tf GROUP BY doc_id),
i AS (SELECT a.doc_id AS u, b.doc_id AS v,
             CAST(sum(least(a.w, b.w)) AS BIGINT) AS m
      FROM tf a JOIN tf b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
SELECT i.u AS doc_id_u, i.v AS doc_id_v, i.m AS w_inter,
       su.tot + sv.tot - i.m AS w_union,
       CAST(i.m AS DOUBLE) / CAST(su.tot + sv.tot - i.m AS DOUBLE) AS jw
FROM i JOIN s su ON su.doc_id = i.u JOIN s sv ON sv.doc_id = i.v
WHERE CAST(i.m AS DOUBLE) / CAST(su.tot + sv.tot - i.m AS DOUBLE) >= 0.5
ORDER BY 1, 2
"""


def _oracle() -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    return con.execute(_ORACLE).fetchdf()


def test_weighted_jaccard_bitexact(ray_session):
    from nise_ray.ops.weightedjoin import weighted_jaccard_pairs
    got = weighted_jaccard_pairs(SF, tau=0.5).to_pandas() \
        .sort_values(["doc_id_u", "doc_id_v"]).reset_index(drop=True)
    want = _oracle().reset_index(drop=True)
    assert len(got) == len(want) and len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_exact=True)
    # TF-sensitivity: weighted must differ from the distinct-set join
    # somewhere (otherwise the op adds nothing over token_jaccard)
    assert (got["w_inter"] > 0).all() and (got["jw"] >= 0.5).all()


def test_weighted_df_mode_parity(ray_session):
    from nise_ray.ops.weightedjoin import weighted_jaccard_pairs
    a = weighted_jaccard_pairs(SF, tau=0.5, df_mode="broadcast")
    b = weighted_jaccard_pairs(SF, tau=0.5, df_mode="join")
    assert a.equals(b)


def test_weighted_differs_from_unweighted(ray_session):
    """Crafted docs where distinct-set Jaccard is 1.0 but weighted is
    below it: the unweighted join cannot tell them apart."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from nise_ray.ops.weightedjoin import weighted_jaccard_pairs
    docs = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a b", "a a a a b"], pa.string()),
        "lang": pa.array(["en", "en"], pa.string()),
        "source": pa.array(["s", "s"], pa.string()),
        "n_chars": pa.array([3, 9], pa.int64()),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(docs, os.path.join(d, "documents.parquet"))
        out = weighted_jaccard_pairs(d, tau=0.3).to_pydict()
    # min/max per token: a -> 1/4, b -> 1/1 => m=2, union=5, jw=0.4
    assert out["w_inter"] == [2] and out["w_union"] == [5]
    assert abs(out["jw"][0] - 0.4) < 1e-15


def test_cws_estimator_property():
    """Pr[sig components agree] must equal the weighted Jaccard (Ioffe
    2010, exactness of CWS) — no Ray needed, kernel-level."""
    from nise_ray.ops.weightedjoin import cws_signatures
    rng = np.random.default_rng(3)
    toks = rng.integers(0, 2**63, 30, dtype=np.int64).astype(np.uint64)
    wa = rng.integers(1, 8, 30).astype(np.int64)
    wb = rng.integers(1, 8, 30).astype(np.int64)
    # doc b drops some tokens entirely
    keep_b = rng.random(30) > 0.3
    tb, wbb = toks[keep_b], wb[keep_b]
    jw = (np.sum(np.minimum(wa, np.where(keep_b, wb, 0)))
          / np.sum(np.maximum(wa, np.where(keep_b, wb, 0))))
    K = 3000
    uf = np.concatenate([toks, tb])
    tf = np.concatenate([wa, wbb])
    uoffs = np.array([0, len(toks), len(toks) + len(tb)], np.int64)
    sig = cws_signatures(uf, tf, uoffs, K)
    est = float(np.mean(sig[0] == sig[1]))
    sd = np.sqrt(jw * (1 - jw) / K)
    assert abs(est - jw) < 4 * sd + 1e-9, (est, jw, sd)


def test_cws_empty_and_single_rows():
    from nise_ray.ops.weightedjoin import cws_signatures
    sig = cws_signatures(np.empty(0, np.uint64), np.empty(0, np.int64),
                         np.array([0, 0, 0], np.int64), 8)
    assert sig.shape == (2, 8) and (sig == 0).all()
    # identical single-token rows must collide on every component
    uf = np.array([7, 7], np.uint64)
    tf = np.array([5, 5], np.int64)
    sig = cws_signatures(uf, tf, np.array([0, 1, 2], np.int64), 16)
    assert (sig[0] == sig[1]).all() and (sig[0] != 0).any()


def test_weighted_lsh_recall_gate(ray_session):
    """CWS-LSH path: recall >= 0.95 vs the exact join at the default
    banding (deterministic seeds -> deterministic result; theory says
    ~0.996 at the tau boundary), precision 1.0 by construction."""
    from nise_ray.ops.weightedjoin import weighted_recall_report
    r = weighted_recall_report(SF, tau=0.5).to_pydict()
    assert r["n_hit"][0] == r["n_lsh"][0]  # no false positives
    assert r["recall"][0] >= 0.95, r


def test_nearest_neighbor_docs(ray_session):
    """Per-doc best weighted-Jaccard neighbor vs brute-force SQL —
    NULL rows for docs with no neighbor above tau, tie-break to the
    smaller neighbor id."""
    from nise_ray.ops.weightedjoin import nearest_neighbor_docs
    got = nearest_neighbor_docs(SF, tau=0.3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute("""
        WITH tf AS (
          SELECT doc_id, tok, count(*) AS w
          FROM (SELECT doc_id, unnest(regexp_extract_all(
                    text, '[A-Za-z0-9_]+')) AS tok FROM documents)
          GROUP BY doc_id, tok),
        s AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS tot
              FROM tf GROUP BY doc_id),
        i AS (SELECT a.doc_id AS u, b.doc_id AS v,
                     CAST(sum(least(a.w, b.w)) AS BIGINT) AS m
              FROM tf a JOIN tf b ON a.tok = b.tok AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
        p AS (SELECT i.u, i.v,
                     CAST(i.m AS DOUBLE)
                       / CAST(su.tot + sv.tot - i.m AS DOUBLE) AS jw
              FROM i JOIN s su ON su.doc_id = i.u
                     JOIN s sv ON sv.doc_id = i.v
              WHERE CAST(i.m AS DOUBLE)
                      / CAST(su.tot + sv.tot - i.m AS DOUBLE) >= 0.3),
        bid AS (SELECT u AS doc_id, v AS nb, jw FROM p
                UNION ALL SELECT v AS doc_id, u AS nb, jw FROM p),
        best AS (SELECT doc_id, nb, jw, row_number() OVER (
                     PARTITION BY doc_id ORDER BY jw DESC, nb ASC) AS rn
                 FROM bid)
        SELECT d.doc_id, b.nb AS nn_doc_id, b.jw AS nn_jw
        FROM documents d
        LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
        ORDER BY d.doc_id""").fetchdf()
    assert len(got) == len(want) and len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)


def test_dedup_cluster_stats_invariants(ray_session):
    """Cluster stats must be consistent with the assignment itself:
    member counts sum to the corpus, saved_chars = total - kept."""
    from nise_ray.ops.simjoin import dedup_cluster_stats, jaccard_components
    stats = dedup_cluster_stats(SF, tau=0.8).to_pandas()
    comp = jaccard_components(SF, tau=0.8).to_pandas()
    assert stats["n_members"].sum() == len(comp)
    sizes = comp.groupby("cluster_id").size()
    merged = stats.set_index("cluster_id")["n_members"]
    assert (merged.sort_index() == sizes.sort_index()).all()
    assert (stats["saved_chars"] <= stats["total_chars"]).all()
    assert (stats.loc[stats["n_members"] == 1, "saved_chars"] == 0).all()


def test_nn_attach_join_parity(ray_session):
    """Broadcast and left-outer-join attach paths of
    nearest_neighbor_docs must produce identical results."""
    from nise_ray.ops.weightedjoin import nearest_neighbor_docs
    a = nearest_neighbor_docs(SF, tau=0.3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = nearest_neighbor_docs(SF, tau=0.3, nn_broadcast_max=0) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0
    assert a["nn_doc_id"].isna().equals(b["nn_doc_id"].isna())
    pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                  check_exact=True)


def test_cluster_label_attach_join_parity(ray_session):
    """Broadcast and join label-attach paths of jaccard_components /
    dedup_cluster_stats must agree."""
    from nise_ray.ops.simjoin import dedup_cluster_stats, jaccard_components
    a = jaccard_components(SF, tau=0.8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = jaccard_components(SF, tau=0.8, broadcast_max=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    sa = dedup_cluster_stats(SF, tau=0.8).to_pandas()
    sb = dedup_cluster_stats(SF, tau=0.8, broadcast_max=0).to_pandas()
    pd.testing.assert_frame_equal(sa, sb, check_exact=True)


def test_weighted_verify_join_parity(ray_session):
    """verify_mode='join' (distributed endpoint tf-map attach, no
    driver-resident map) must match the broadcast verify bit-exact,
    including the jw double."""
    from nise_ray.ops.weightedjoin import weighted_jaccard_pairs
    a = weighted_jaccard_pairs(SF, tau=0.5, verify_mode="broadcast")
    b = weighted_jaccard_pairs(SF, tau=0.5, verify_mode="join")
    assert a.num_rows > 0
    assert a.equals(b)
    c = weighted_jaccard_pairs(SF, tau=0.5, verify_broadcast_max=0)
    assert a.equals(c)


def test_weighted_minhash_verify_join_parity(ray_session):
    from nise_ray.ops.weightedjoin import weighted_minhash_pairs
    a = weighted_minhash_pairs(SF, tau=0.5, verify_mode="broadcast")
    b = weighted_minhash_pairs(SF, tau=0.5, verify_mode="join")
    assert a.num_rows > 0
    assert a.equals(b)


def test_weighted_minhash_bands_validation(ray_session):
    import pytest
    from nise_ray.ops.weightedjoin import weighted_minhash_pairs
    with pytest.raises(ValueError, match="divisible"):
        weighted_minhash_pairs(SF, tau=0.5, k=10, bands=4)
