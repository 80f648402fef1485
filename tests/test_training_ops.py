"""Tests for the training-data operators (ANN, textstats, dedupx,
multimodal plumbing) and the index build/query surface."""

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def test_brute_force_topk_matches_numpy(ray_session):
    import pyarrow.parquet as pq

    from nise_ray.ops.ann import _embedding_matrix, _normalize, brute_force_topk
    got = brute_force_topk(SF, n_queries=3, k=5)
    t = pq.read_table(f"{SF}/embeddings.parquet")
    m = _normalize(_embedding_matrix(t))
    vids = t.column("vec_id").to_numpy(zero_copy_only=False)
    order = np.argsort(vids)
    for qpos in range(3):
        qi = order[qpos]
        sims = m @ m[qi]
        mask = vids != vids[qi]
        cand = np.flatnonzero(mask)
        best = cand[np.lexsort((vids[cand], -sims[cand]))][:5]
        expect = list(vids[best])
        got_q = got.filter(pa.compute.equal(got.column("query_id"), int(vids[qi])))
        assert got_q.column("vec_id").to_pylist() == expect


def test_lsh_topk_recall(ray_session):
    from nise_ray.ops.ann import brute_force_topk, lsh_topk
    exact = brute_force_topk(SF, n_queries=5, k=10)
    approx = lsh_topk(SF, n_queries=5, k=10, n_tables=16, n_bits=6)
    exact_set = set(zip(exact.column("query_id").to_pylist(),
                        exact.column("vec_id").to_pylist()))
    approx_set = set(zip(approx.column("query_id").to_pylist(),
                         approx.column("vec_id").to_pylist()))
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"LSH ANN recall {recall}"  # approximate by design


def test_ivf_topk_recall(ray_session):
    from nise_ray.ops.ann import brute_force_topk, ivf_topk
    exact = brute_force_topk(SF, n_queries=5, k=10)
    approx = ivf_topk(SF, n_queries=5, k=10, n_centroids=32, n_probe=16)
    exact_set = set(zip(exact.column("query_id").to_pylist(),
                        exact.column("vec_id").to_pylist()))
    approx_set = set(zip(approx.column("query_id").to_pylist(),
                         approx.column("vec_id").to_pylist()))
    recall = len(exact_set & approx_set) / len(exact_set)
    # probing half the cells of near-orthogonal synthetic vectors
    assert recall >= 0.5, f"IVF ANN recall {recall}"
    # determinism: same seed, same result
    again = ivf_topk(SF, n_queries=5, k=10, n_centroids=32, n_probe=16)
    assert approx.equals(again)


def test_token_stats_match_python(ray_session):
    import re

    import pyarrow.parquet as pq

    from nise_ray.ops.textstats import token_stats
    got = {r["doc_id"]: r["n_tokens"]
           for r in token_stats(SF).take_all()}
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    rx = re.compile(r"[A-Za-z0-9_]+")
    for did, text in zip(t.column("doc_id").to_pylist()[:50],
                         t.column("text").to_pylist()[:50]):
        assert got[did] == len(rx.findall(text))


def test_exact_dedup_docs_counts(ray_session):
    from nise_ray.ops.dedupx import exact_dedup_documents
    from nise_ray.util import collect_table
    t = collect_table(exact_dedup_documents(SF))
    assert t.column("n_dups").to_pylist().count(0) == 0
    import pyarrow.parquet as pq
    n_docs = pq.ParquetFile(f"{SF}/documents.parquet").metadata.num_rows
    assert sum(t.column("n_dups").to_pylist()) == n_docs


def test_language_id_scores(ray_session):
    from nise_ray.ops.textstats import language_id
    rows = language_id(SF).take_all()
    assert all(0.0 <= r["lang_score"] <= 1.0 for r in rows)
    assert all(r["lang_pred"] in {"en", "de", "fr", "es", "unknown"} for r in rows)


def test_multimodal_feature_stage(ray_session):
    import ray

    from nise_ray.ops.multimodal import (
        FrameSampler,
        ImageFeatureExtractor,
        make_fake_media_table,
    )
    media = make_fake_media_table(n=30, seed=1)
    ds = ray.data.from_arrow(media)
    feats = ds.map_batches(ImageFeatureExtractor,
                           fn_constructor_kwargs={"fake": True},
                           batch_size=8, concurrency=(1, 2),
                           batch_format="pyarrow")
    t = pa.concat_tables([ray.get(r) for r in feats.to_arrow_refs()])
    assert t.num_rows == 30
    assert t.column("feature").type.list_size == 64
    # deterministic across runs
    t2 = pa.concat_tables([ray.get(r) for r in ds.map_batches(
        ImageFeatureExtractor, fn_constructor_kwargs={"fake": True},
        batch_size=8, concurrency=(1, 2), batch_format="pyarrow").to_arrow_refs()])
    assert t.sort_by("media_id").equals(t2.sort_by("media_id"))

    vids = ds.filter(lambda r: r["kind"] == "video")
    frames = vids.map_batches(FrameSampler,
                              fn_constructor_kwargs={"n_frames": 3, "fake": True},
                              batch_size=8, concurrency=(1, 2),
                              batch_format="pyarrow")
    ft = pa.concat_tables([ray.get(r) for r in frames.to_arrow_refs()])
    assert ft.num_rows == vids.count() * 3

    # real decode path: clearly-marked NotImplementedError
    ex = ImageFeatureExtractor(fake=False)
    with pytest.raises(NotImplementedError):
        ex(media.slice(0, 2))


def test_index_build_and_query(ray_session, small_fixture, tmp_path):
    import ray

    from nise_ray.config import DedupConfig
    from nise_ray.hashing import doc_key as doc_key_fn
    from nise_ray.index import build_index, query_index
    from nise_ray.util import collect_table

    fx = small_fixture
    index_dir = str(tmp_path / "index")
    build_index(ray.data.from_arrow(fx.corpus), index_dir, DedupConfig())

    # query with 5 corpus rows that have known near-dups (exact clones)
    tp = fx.truth_pairs
    exact_rows = [i for i in range(tp.num_rows)
                  if tp.column("kind")[i].as_py() == "exact"][:5]
    keys = {}
    q_rows = []
    corpus_keys = {}
    for i in range(fx.corpus.num_rows):
        r = (fx.corpus.column("repo")[i].as_py(), fx.corpus.column("path")[i].as_py(),
             fx.corpus.column("commit")[i].as_py())
        corpus_keys[r] = doc_key_fn(*r)
    for i in exact_rows:
        triple = (tp.column("u_repo")[i].as_py(), tp.column("u_path")[i].as_py(),
                  tp.column("u_commit")[i].as_py())
        v_triple = (tp.column("v_repo")[i].as_py(), tp.column("v_path")[i].as_py(),
                    tp.column("v_commit")[i].as_py())
        keys[corpus_keys[triple]] = corpus_keys[v_triple]
    # build the query table: rows of the corpus whose doc_key is in keys
    sel = []
    for i in range(fx.corpus.num_rows):
        r = (fx.corpus.column("repo")[i].as_py(), fx.corpus.column("path")[i].as_py(),
             fx.corpus.column("commit")[i].as_py())
        if corpus_keys[r] in keys:
            sel.append(i)
    qt = fx.corpus.take(pa.array(sel))
    matches = collect_table(query_index(index_dir, qt, DedupConfig(), top_k=5))
    by_q: dict[int, list[int]] = {}
    for q, m2 in zip(matches.column("query_key").to_pylist(),
                     matches.column("match_key").to_pylist()):
        by_q.setdefault(q, []).append(m2)
    for qk, expect_match in keys.items():
        assert qk in by_q, f"query {qk} returned no matches"
        assert expect_match in by_q[qk], "exact clone not in top-k matches"


def test_repetition_stats_match_duckdb(ray_session):
    """Gopher-style repetition signals vs the SQL definition — exact,
    including zero-token docs (coalesced to 0/0/0.0/0.0) and the
    unrounded integer-ratio doubles."""
    import duckdb

    from nise_ray.ops.textstats import repetition_stats
    from nise_ray.util import collect_table
    got = collect_table(repetition_stats(SF)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute("""
        WITH tok AS (SELECT doc_id,
                            unnest(regexp_extract_all(text, '[A-Za-z0-9_]+'))
                              AS token
                     FROM documents),
        tf AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2),
        agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                       CAST(count(*) AS BIGINT) AS n_uniq_tokens,
                       1.0 - count(*) / CAST(sum(c) AS DOUBLE)
                         AS dup_token_frac,
                       max(c) / CAST(sum(c) AS DOUBLE) AS top_token_share
                FROM tf GROUP BY 1)
        SELECT d.doc_id, coalesce(a.n_tokens, 0) AS n_tokens,
               coalesce(a.n_uniq_tokens, 0) AS n_uniq_tokens,
               coalesce(a.dup_token_frac, 0.0) AS dup_token_frac,
               coalesce(a.top_token_share, 0.0) AS top_token_share
        FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY doc_id
    """).fetchdf()
    for c in want.columns:
        assert (got[c] == want[c]).all(), c


def test_repetition_batch_degenerate():
    """Empty text, whitespace-only, and a pathological all-one-token doc."""
    import pyarrow as pa

    from nise_ray.ops.textstats import repetition_batch
    b = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["", "   \t ", "spam spam spam spam"],
                                   pa.string())})
    t = repetition_batch(b)
    assert t.column("n_tokens").to_pylist() == [0, 0, 4]
    assert t.column("n_uniq_tokens").to_pylist() == [0, 0, 1]
    assert t.column("dup_token_frac").to_pylist() == [0.0, 0.0, 0.75]
    assert t.column("top_token_share").to_pylist() == [0.0, 0.0, 1.0]


def test_bm25_scores_match_duckdb(ray_session):
    """BM25 (Lucene idf variant) vs the SQL formulation — bit-exact
    after round(,4); empty-hit query yields a typed empty table."""
    import duckdb

    from nise_ray.ops.textstats import bm25_scores
    got = bm25_scores(SF, query="hash join merge").to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute("""
        WITH tok AS (SELECT doc_id,
                            unnest(regexp_extract_all(
                                text, '[A-Za-z0-9_]+')) AS token
                     FROM documents),
        tf AS (SELECT doc_id, token, count(*) AS c FROM tok
               WHERE token IN ('hash', 'join', 'merge') GROUP BY 1, 2),
        dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
        consts AS (SELECT (SELECT count(*) FROM documents) AS n,
                          (SELECT CAST(count(*) AS DOUBLE) FROM tok)
                            / (SELECT count(*) FROM documents) AS avgdl),
        df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1)
        SELECT tf.doc_id,
               round(sum( ln((n - df + 0.5)/(df + 0.5) + 1.0)
                          * c * (1.2 + 1.0)
                          / (c + 1.2*(1.0 - 0.75 + 0.75*dl.dl/avgdl)) ), 4)
                 AS bm25
        FROM tf JOIN dl USING (doc_id) JOIN df USING (token)
        CROSS JOIN consts
        GROUP BY tf.doc_id ORDER BY tf.doc_id
    """).fetchdf()
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert (got["bm25"] == want["bm25"]).all()
    empty = bm25_scores(SF, query="zzznotoken")
    assert empty.num_rows == 0
    assert empty.schema.names == ["doc_id", "bm25"]


def test_bigram_repetition_match_duckdb(ray_session):
    """Dup-2-gram Gopher signals vs the SQL list-comprehension bigram
    construction — exact, including zero-bigram docs."""
    import duckdb

    from nise_ray.ops.textstats import bigram_repetition_stats
    from nise_ray.util import collect_table
    got = collect_table(bigram_repetition_stats(SF)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute("""
        WITH grams AS (
          SELECT doc_id,
                 unnest(list_transform(
                   generate_series(1, greatest(length(toks)-1, 0)),
                   i -> toks[i] || chr(1) || toks[i+1])) AS g
          FROM (SELECT doc_id,
                       regexp_extract_all(text, '[A-Za-z0-9_]+') AS toks
                FROM documents)),
        gf AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2),
        agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
                       CAST(count(*) AS BIGINT) AS n_uniq_bigrams,
                       1.0 - count(*) / CAST(sum(c) AS DOUBLE)
                         AS dup_bigram_frac,
                       max(c) / CAST(sum(c) AS DOUBLE) AS top_bigram_share
                FROM gf GROUP BY 1)
        SELECT d.doc_id, coalesce(a.n_bigrams, 0) AS n_bigrams,
               coalesce(a.n_uniq_bigrams, 0) AS n_uniq_bigrams,
               coalesce(a.dup_bigram_frac, 0.0) AS dup_bigram_frac,
               coalesce(a.top_bigram_share, 0.0) AS top_bigram_share
        FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY doc_id
    """).fetchdf()
    for c in want.columns:
        assert (got[c] == want[c]).all(), c


def test_bigram_repetition_degenerate():
    """Single-token and empty docs emit zero bigrams; a doc of one
    repeated token is all duplicate bigrams."""
    import pyarrow as pa

    from nise_ray.ops.textstats import bigram_repetition_batch
    b = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["solo", "", "ha ha ha ha"], pa.string())})
    t = bigram_repetition_batch(b)
    assert t.column("n_bigrams").to_pylist() == [0, 0, 3]
    assert t.column("n_uniq_bigrams").to_pylist() == [0, 0, 1]
    assert t.column("top_bigram_share").to_pylist() == [0.0, 0.0, 1.0]


def test_multimodal_real_codecs(ray_session):
    """REAL decode paths: BMP images round-trip through the Ray stage
    with pixel-true block-mean features, WAV audio decodes to exact
    sample-derived stats; compressed mimes still refuse honestly."""
    import ray

    from nise_ray.ops.multimodal import (
        AudioFeatureExtractor,
        RealImageFeatureExtractor,
        bmp_feature,
        decode_bmp,
        make_real_media_table,
    )
    media = make_real_media_table(n=24, seed=3)
    ds = ray.data.from_arrow(media)

    imgs = ds.filter(lambda r: r["kind"] == "image")
    feats = imgs.map_batches(RealImageFeatureExtractor,
                             fn_constructor_kwargs={"fake": False},
                             batch_size=8, concurrency=(1, 2),
                             batch_format="pyarrow")
    t = pa.concat_tables([ray.get(r) for r in feats.to_arrow_refs()]) \
        .sort_by("media_id")
    assert t.num_rows == imgs.count()
    # feature equals the feature of the locally-decoded payload
    pay = {m: p for m, p in zip(media.column("media_id").to_pylist(),
                                media.column("payload").to_pylist())}
    for i in range(min(3, t.num_rows)):
        mid = t.column("media_id")[i].as_py()
        want = bmp_feature(decode_bmp(pay[mid]))
        got = np.asarray(t.column("feature")[i].as_py(), dtype=np.float32)
        assert np.array_equal(got, want)

    auds = ds.filter(lambda r: r["kind"] == "audio")
    at = pa.concat_tables([ray.get(r) for r in auds.map_batches(
        AudioFeatureExtractor, batch_size=8, concurrency=(1, 2),
        batch_format="pyarrow").to_arrow_refs()]).sort_by("media_id")
    assert at.num_rows == auds.count()
    durs = {m: d for m, d in zip(media.column("media_id").to_pylist(),
                                 media.column("duration_ms").to_pylist())}
    for i in range(at.num_rows):
        mid = at.column("media_id")[i].as_py()
        assert at.column("duration_ms")[i].as_py() == durs[mid]
        assert 0.0 < at.column("rms")[i].as_py() <= 1.0
        assert 0.0 < at.column("zcr")[i].as_py() < 1.0

    # compressed formats refuse with the documented boundary
    ex = RealImageFeatureExtractor(fake=False)
    vids = media.filter(pa.compute.equal(media.column("kind"), "video"))
    with pytest.raises(NotImplementedError):
        ex(vids.slice(0, 1))


def test_embedding_clusters_match_python_union_find(ray_session):
    """embedding_clusters (large-star/small-star over the exact cosine
    pair graph) must equal a pure-Python union-find over the same
    pairs — the clustering-core parity check behind the DuckDB
    recursive-CTE oracle."""
    import pyarrow.parquet as pq

    from nise_ray.ops.ann import (_embedding_matrix, _normalize,
                                  embedding_clusters)
    got = embedding_clusters(SF, threshold=0.35)
    t = pq.read_table(f"{SF}/embeddings.parquet")
    vids = t.column("vec_id").to_numpy(zero_copy_only=False)
    m = _normalize(_embedding_matrix(t))
    sims = np.round(m @ m.T, 4)
    ii, jj = np.nonzero(sims >= 0.35)
    parent = {int(v): int(v) for v in vids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    n_pairs = 0
    for a, b in zip(vids[ii], vids[jj]):
        if a < b:
            n_pairs += 1
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    assert n_pairs > 0, "fixture produced no pairs — threshold too high"
    expect = {v: find(v) for v in parent}
    got_map = dict(zip(got.column("vec_id").to_pylist(),
                       got.column("cluster_id").to_pylist()))
    assert got_map == expect
    assert len(set(expect.values())) < len(expect)  # non-trivial merge


def test_unigram_logprob_matches_python(ray_session):
    import math
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    from nise_ray.ops.textstats import unigram_logprob
    got = unigram_logprob(SF).to_pandas().set_index("doc_id")
    t = pq.read_table(f"{SF}/documents.parquet")
    tok_re = re.compile(r"[A-Za-z0-9_]+")
    docs = {i: tok_re.findall(txt) for i, txt in zip(
        t.column("doc_id").to_pylist(), t.column("text").to_pylist())}
    freq = Counter()
    for toks in docs.values():
        freq.update(toks)
    total = sum(freq.values())
    assert len(got) == len(docs)
    for i, toks in docs.items():
        assert got.loc[i, "n_tokens"] == len(toks)
        if not toks:
            assert got.loc[i, "logprob_mean"] == 0.0
            continue
        lp = sum(c * math.log(freq[w] / total)
                 for w, c in Counter(toks).items()) / len(toks)
        assert abs(got.loc[i, "logprob_mean"] - round(lp, 4)) < 1e-9
        assert got.loc[i, "logprob_mean"] < 0.0


def test_funnel_counts_matches_python(ray_session):
    import pyarrow.parquet as pq

    from nise_ray.ops.events import funnel_counts
    steps = ("signup", "view", "click", "purchase")
    got = funnel_counts(SF, steps=steps)
    t = pq.read_table(f"{SF}/events.parquet")
    uid = t.column("user_id").to_pylist()
    ts = t.column("ts").cast(pa.int64()).to_pylist()
    et = t.column("event_type").to_pylist()
    by_user = {}
    for u, s, e in zip(uid, ts, et):
        by_user.setdefault(u, []).append((s, e))
    counts = [0] * len(steps)
    for evs in by_user.values():
        prev = -1
        for k, step in enumerate(steps):
            times = [s for s, e in evs if e == step and s > prev]
            if not times:
                break
            prev = min(times)
            counts[k] += 1
    assert got.column("n_users").to_pylist() == counts
    assert got.column("step").to_pylist() == [1, 2, 3, 4]
    # funnel counts are non-increasing by construction
    ns = got.column("n_users").to_pylist()
    assert all(a >= b for a, b in zip(ns, ns[1:]))
    assert counts[0] > 0


def test_token_entropy_matches_python(ray_session):
    import math
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    from nise_ray.ops.textstats import token_entropy
    got = token_entropy(SF).to_pandas().set_index("doc_id")
    t = pq.read_table(f"{SF}/documents.parquet")
    tok_re = re.compile(r"[A-Za-z0-9_]+")
    for i, txt in zip(t.column("doc_id").to_pylist(),
                      t.column("text").to_pylist()):
        toks = tok_re.findall(txt)
        assert got.loc[i, "n_tokens"] == len(toks)
        if not toks:
            assert got.loc[i, "entropy"] == 0.0
            continue
        n = len(toks)
        h = math.log(n) - sum(c * math.log(c)
                              for c in Counter(toks).values()) / n
        assert abs(got.loc[i, "entropy"] - round(h, 4)) < 1e-9
        assert got.loc[i, "entropy"] >= 0.0


def test_value_time_correlation_matches_numpy(ray_session):
    import pyarrow.parquet as pq

    from nise_ray.ops.analytics import value_time_correlation
    got = value_time_correlation(SF)
    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["event_type", "ts", "value"])
    et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
    ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    x = (ts % 86_400_000_000).astype(np.float64) / 1e6
    y = t.column("value").to_numpy(zero_copy_only=False)
    for typ, n, r in zip(got.column("event_type").to_pylist(),
                         got.column("n_events").to_pylist(),
                         got.column("corr_value_tod").to_pylist()):
        m = et == typ
        assert n == int(m.sum())
        expect = np.corrcoef(x[m], y[m])[0, 1]
        assert abs(r - expect) < 2e-4  # engine rounds to 4
        assert -1.0 <= r <= 1.0


def test_dedup_rate_by_source_planted(ray_session):
    # planted: source A has 3 docs / 2 distinct texts; B all unique
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from nise_ray.ops.dedupx import dedup_rate_by_source
    t = pa.table({
        "source": pa.array(["A", "A", "A", "B", "B"], pa.string()),
        "text": pa.array(["x", "x", "y", "p", "q"], pa.string()),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        got = dedup_rate_by_source(d).to_pandas().set_index("source")
    assert got.loc["A", "n_docs"] == 3 and got.loc["A", "n_distinct"] == 2
    assert got.loc["A", "dup_rate"] == 1.0 - 2.0 / 3.0
    assert got.loc["B", "dup_rate"] == 0.0


def test_chunk_dedup_docs_planted(ray_session):
    # size=4 windows; doc 0 "aaaabbbbcc", doc 1 repeats doc 0's first
    # window then unique, doc 2 is an exact copy of doc 0 (keeps
    # nothing), doc 3 empty, doc 4 shorter than one window
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from nise_ray.ops.dedupx import chunk_dedup_docs
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array(["aaaabbbbcc", "aaaazzzz", "aaaabbbbcc", "", "qq"],
                         pa.string()),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        got = (chunk_dedup_docs(d, size=4).to_pandas()
               .set_index("doc_id").sort_index())
    # doc 0 wins all 3 of its windows ("aaaa","bbbb","cc")
    assert got.loc[0, "text"] == "aaaabbbbcc"
    assert got.loc[0, "n_chunks"] == 3 and got.loc[0, "n_kept"] == 3
    # doc 1 loses "aaaa" (doc 0, idx 0 wins), keeps "zzzz"
    assert got.loc[1, "text"] == "zzzz"
    assert got.loc[1, "n_chunks"] == 2 and got.loc[1, "n_kept"] == 1
    # doc 2 is a full duplicate of doc 0 -> empty output, still present
    assert got.loc[2, "text"] == "" and got.loc[2, "n_kept"] == 0
    assert got.loc[2, "n_chunks"] == 3
    # empty doc: zero chunks, empty text
    assert got.loc[3, "text"] == "" and got.loc[3, "n_chunks"] == 0
    # sub-window doc keeps its single short window
    assert got.loc[4, "text"] == "qq"
    assert got.loc[4, "n_chunks"] == 1 and got.loc[4, "n_kept"] == 1


def test_chunk_dedup_docs_oracle_parity(ray_session):
    # full-corpus parity vs DuckDB at sf0.001 (the driver gate shape)
    import duckdb

    from nise_ray.ops.dedupx import chunk_dedup_docs
    got = (chunk_dedup_docs(SF).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    import __ray_entry__ as entry
    sql = entry.oracle_sql()["chunk_dedup_docs"] + " ORDER BY doc_id"
    ora = con.sql(sql).df()
    assert got.equals(ora)


def test_type2_clone_groups_planted(ray_session, tmp_path):
    """Renamed-variable code copies (type-2 clones) group together;
    differently-STRUCTURED code does not."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nise_ray.ops.dedupx import type2_clone_groups
    from nise_ray.util import collect_table

    a = "def total(xs):\n    acc = 0\n    for x in xs:\n        acc += x * 2\n    return acc\n"
    # same structure, every identifier and literal renamed
    b = "def sum_up(vals):\n    out = 0\n    for v in vals:\n        out += v * 7\n    return out\n"
    # different structure (extra statement)
    c = "def total(xs):\n    acc = 0\n    for x in xs:\n        acc += x * 2\n    acc -= 1\n    return acc\n"
    t = pa.table({"doc_id": pa.array([10, 20, 30], pa.int64()),
                  "text": pa.array([a, b, c], pa.string())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = collect_table(type2_clone_groups(str(tmp_path))) \
        .sort_by([("doc_id", "ascending")])
    assert got.column("doc_id").to_pylist() == [10, 20]
    assert got.column("clone_id").to_pylist() == [10, 10]
    assert got.column("group_size").to_pylist() == [2, 2]


def test_type2_clone_groups_matches_duckdb(ray_session):
    import duckdb

    from nise_ray.ops.dedupx import type2_clone_groups
    from nise_ray.util import collect_table

    sf = "/root/testdata/sf0.001"
    got = collect_table(type2_clone_groups(sf)) \
        .sort_by([("doc_id", "ascending")]).to_pandas()
    want = duckdb.execute(f"""
        WITH n AS (
          SELECT doc_id,
                 regexp_replace(regexp_replace(text,
                     '[A-Za-z_][A-Za-z0-9_]*', 'ID', 'g'),
                     '[0-9]+', 'N', 'g') AS nt
          FROM read_parquet('{sf}/documents.parquet')),
        g AS (SELECT nt, min(doc_id) AS clone_id, count(*) AS group_size
              FROM n GROUP BY nt HAVING count(*) >= 2)
        SELECT n.doc_id, g.clone_id, g.group_size
        FROM n JOIN g USING (nt) ORDER BY n.doc_id
    """).fetchdf()
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert list(got["clone_id"]) == list(want["clone_id"])
    assert list(got["group_size"]) == list(want["group_size"])


def test_dedup_recall_report_meets_gate(ray_session):
    from nise_ray.ops.dedupx import dedup_recall_report

    got = dedup_recall_report("/root/testdata/sf0.001")
    assert got.num_rows == 1
    assert got.column("n_docs").to_pylist() == [500]
    assert got.column("n_gate_pairs")[0].as_py() > 0
    assert got.column("recall")[0].as_py() >= 0.99


def test_compression_ratio_signal(ray_session, tmp_path):
    """Repetitive text compresses far below random text; empty docs
    emit NULL; counts match a direct zlib reference."""
    import zlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nise_ray.ops.textstats import compression_ratio
    from nise_ray.util import collect_table

    rng = np.random.Generator(np.random.PCG64(5))
    rand = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 4000))
    rep = "spam and eggs " * 300
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array([rand, rep, ""], pa.string())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = collect_table(compression_ratio(str(tmp_path))) \
        .sort_by([("doc_id", "ascending")])
    ratios = got.column("ratio").to_pylist()
    assert ratios[2] is None
    assert ratios[1] < 0.05 < ratios[0]
    for i, text in enumerate([rand, rep]):
        assert got.column("n_compressed")[i].as_py() == \
            len(zlib.compress(text.encode(), 6))


def test_ann_recall_report(ray_session):
    from nise_ray.ops.ann import ann_recall_report

    got = ann_recall_report("/root/testdata/sf0.001")
    assert got.column("method").to_pylist() == ["lsh", "ivf"]
    recalls = dict(zip(got.column("method").to_pylist(),
                       got.column("recall").to_pylist()))
    assert recalls["lsh"] >= 0.5      # approximate by design
    assert recalls["ivf"] >= 0.5
    assert (got.column("n_truth")[0].as_py() ==
            got.column("n_truth")[1].as_py() > 0)


def test_png_codec_roundtrip_all_filters():
    """decode_png must reconstruct the exact pixels for every scanline
    filter (None/Sub/Up/Average/Paeth) and gray/gray+alpha/RGB/RGBA
    color types — kernel-level golden test, no Ray."""
    from nise_ray.ops.multimodal import decode_png, encode_png

    rng = np.random.default_rng(5)
    for c in (1, 2, 3, 4):
        img = rng.integers(0, 256, (13, 9, c), dtype=np.uint8)
        for f in range(5):
            got = decode_png(encode_png(img, filter_type=f))
            assert got.shape == img.shape, (c, f)
            assert np.array_equal(got, img), (c, f)
    # gradient image (exercises filter deltas beyond random noise)
    grad = np.outer(np.arange(32), np.ones(17, np.uint8))[..., None] \
        .astype(np.uint8).repeat(3, axis=2)
    for f in range(5):
        assert np.array_equal(decode_png(encode_png(grad, f)), grad)


def test_png_codec_refusals():
    import pytest

    from nise_ray.ops.multimodal import decode_png

    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"BMnope")
    # 16-bit depth must refuse, not mis-decode
    import struct, zlib
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + \
            struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
    payload = sig + chunk(b"IHDR", ihdr) + \
        chunk(b"IDAT", zlib.compress(b"\x00" * 10)) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        decode_png(payload)


def test_multimodal_real_png_stage(ray_session):
    """fake=False image path on planted PNGs through the Ray actor-pool
    stage: features must equal the locally decoded pixels' block-mean
    grid for every row (all five filters represented in the input)."""
    import ray

    from nise_ray.ops.multimodal import (
        RealImageFeatureExtractor,
        bmp_feature,
        decode_png,
        make_png_media_table,
        png_to_rgb,
    )
    media = make_png_media_table(n=20, seed=7)
    ds = ray.data.from_arrow(media)
    feats = ds.map_batches(RealImageFeatureExtractor,
                           fn_constructor_kwargs={"fake": False},
                           batch_size=8, concurrency=(1, 2),
                           batch_format="pyarrow")
    t = pa.concat_tables([ray.get(r) for r in feats.to_arrow_refs()]) \
        .sort_by("media_id")
    assert t.num_rows == 20
    pay = {m: p for m, p in zip(media.column("media_id").to_pylist(),
                                media.column("payload").to_pylist())}
    for i in range(t.num_rows):
        mid = t.column("media_id")[i].as_py()
        want = bmp_feature(png_to_rgb(decode_png(pay[mid])))
        got = np.asarray(t.column("feature")[i].as_py(), dtype=np.float32)
        assert np.allclose(got, want)
