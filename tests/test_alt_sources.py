"""JSONL / CSV corpus ingest: same 5-column contract, same pipeline
results as the parquet path on an identical fixture."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nise_ray.util import collect_table


@pytest.fixture(scope="module")
def tri_fixture(tmp_path_factory):
    """The same small corpus written as parquet, jsonl and csv."""
    from nise_ray.fixtures import gen_corpus

    d = tmp_path_factory.mktemp("alt_sources")
    fx = gen_corpus(seed=11, n_base=40, max_lines=60)
    t = fx.corpus
    pq.write_table(t, str(d / "corpus.parquet"))
    rows = t.to_pylist()
    with open(d / "corpus.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    import csv as _csv
    with open(d / "corpus.csv", "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=t.column_names)
        w.writeheader()
        w.writerows(rows)
    return d


def _assign_table(ds):
    from nise_ray.config import DedupConfig
    from nise_ray.pipeline import dedup_pipeline

    res = dedup_pipeline(ds, DedupConfig())
    return collect_table(res.assignments.select_columns(
        ["doc_key", "content_sha256", "cluster_id"])) \
        .sort_by([("doc_key", "ascending")])


def test_jsonl_matches_parquet(ray_session, tri_fixture):
    import ray

    from nise_ray.io import read_corpus, read_corpus_jsonl

    a = _assign_table(read_corpus(str(tri_fixture / "corpus.parquet")))
    b = _assign_table(read_corpus_jsonl(str(tri_fixture / "corpus.jsonl")))
    assert a.equals(b)
    assert a.num_rows > 0


def test_csv_matches_parquet(ray_session, tri_fixture):
    from nise_ray.io import read_corpus, read_corpus_csv

    a = _assign_table(read_corpus(str(tri_fixture / "corpus.parquet")))
    b = _assign_table(read_corpus_csv(str(tri_fixture / "corpus.csv")))
    assert a.equals(b)


def test_jsonl_missing_column_raises(ray_session, tmp_path):
    from nise_ray.io import read_corpus_jsonl

    with open(tmp_path / "bad.jsonl", "w") as f:
        f.write(json.dumps({"repo": "r", "path": "p", "lang": "x"}) + "\n")
    with pytest.raises(Exception, match="missing required columns"):
        collect_table(read_corpus_jsonl(str(tmp_path / "bad.jsonl")))
