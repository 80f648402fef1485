"""Stage selection toggles (SURVEY §3.9): each stage can be disabled and
the pipeline still produces consistent output."""

import pyarrow as pa
import pytest

from nise_ray.config import DedupConfig
from nise_ray.pipeline import dedup_pipeline
from nise_ray.util import collect_table


def _run(fx, cfg):
    import ray
    res = dedup_pipeline(ray.data.from_arrow(fx.corpus), cfg)
    edges = collect_table(res.edges)
    return res, edges


def test_exact_only(ray_session, small_fixture):
    cfg = DedupConfig(minhash_enabled=False, simhash_enabled=False)
    res, edges = _run(small_fixture, cfg)
    assert res.stats["n_docs"] == small_fixture.corpus.num_rows
    srcs = set(edges.column("src").to_pylist())
    assert srcs <= {"exact"}
    assert edges.num_rows > 0  # planted exact clones exist


def test_minhash_without_simhash(ray_session, small_fixture):
    cfg = DedupConfig(simhash_enabled=False)
    _, edges = _run(small_fixture, cfg)
    srcs = set(edges.column("src").to_pylist())
    assert "simhash" not in srcs
    assert "minhash" in srcs


def test_no_exact_still_clusters_nears(ray_session, small_fixture):
    cfg = DedupConfig(exact_enabled=False)
    _, edges = _run(small_fixture, cfg)
    srcs = set(edges.column("src").to_pylist())
    assert "exact" not in srcs
    # identical contents share identical sigs -> minhash still pairs them
    assert edges.num_rows > 0
