"""Degenerate inputs: empty corpus, single row, all-identical contents,
huge exact group (the boilerplate cliff)."""

import pyarrow as pa

from nise_ray.config import DedupConfig
from nise_ray.pipeline import dedup_pipeline
from nise_ray.util import collect_table


def _corpus(contents, repos=None):
    n = len(contents)
    return pa.table({
        "repo": pa.array(repos or [f"r{i}" for i in range(n)], pa.string()),
        "path": pa.array([f"p{i}.py" for i in range(n)], pa.string()),
        "commit": pa.array(["c"] * n, pa.string()),
        "lang": pa.array(["python"] * n, pa.string()),
        "content": pa.array(contents, pa.string()),
    })


def test_empty_corpus(ray_session):
    import ray
    res = dedup_pipeline(ray.data.from_arrow(_corpus([])), DedupConfig())
    assert res.stats["n_edges"] == 0
    assert res.stats["n_docs"] == 0


def test_single_row(ray_session):
    import ray
    res = dedup_pipeline(ray.data.from_arrow(_corpus(["def f(): pass"])),
                         DedupConfig())
    a = collect_table(res.assignments)
    assert a.num_rows == 1
    assert res.stats["n_edges"] == 0
    # singleton labels itself
    assert a.column("cluster_id")[0].as_py() == a.column("doc_key")[0].as_py()


def test_all_identical(ray_session):
    import ray
    body = " ".join(f"tok{i}" for i in range(100))
    res = dedup_pipeline(ray.data.from_arrow(_corpus([body] * 50)), DedupConfig())
    a = collect_table(res.assignments)
    assert a.num_rows == 50
    assert len(set(a.column("cluster_id").to_pylist())) == 1
    # exact star edges: 49, no quadratic blowup
    assert res.stats["n_edges"] == 49


def test_giant_exact_group_beyond_cap(ray_session):
    import ray
    cfg = DedupConfig(bucket_cap=10)
    body = " ".join(f"w{i}" for i in range(200))
    contents = [body] * 80 + [body.replace("w5 ", "wX ")]
    res = dedup_pipeline(ray.data.from_arrow(_corpus(contents)), cfg)
    a = collect_table(res.assignments)
    # all 81 docs must land in ONE cluster (exact stars + near-dup edge)
    assert len(set(a.column("cluster_id").to_pylist())) == 1


def test_whitespace_only_and_empty_strings(ray_session):
    import ray
    res = dedup_pipeline(ray.data.from_arrow(
        _corpus(["", "   ", "\n\n\n", "", "x"])), DedupConfig())
    a = collect_table(res.assignments)
    assert a.num_rows == 5
    # the two empty strings are exact dups of each other
    edges = collect_table(res.edges)
    assert edges.num_rows >= 1
    assert "exact" in set(edges.column("src").to_pylist())
