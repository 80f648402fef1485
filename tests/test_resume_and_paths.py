"""Resume semantics, distributed-CC parity, salted-shuffle parity."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nise_ray.util import collect_table

from nise_ray.config import DedupConfig
from nise_ray.pipeline import dedup_pipeline


def _assignments_table(result):
    import ray
    t = collect_table(result.assignments)
    return t.sort_by("doc_key").select(["doc_key", "cluster_id", "content_sha256"])


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory, small_fixture):
    from nise_ray.fixtures import write_fixture
    d = tmp_path_factory.mktemp("fixture")
    write_fixture(small_fixture, str(d), rows_per_file=60)
    return str(d)


def test_resume_skips_completed_stages(ray_session, fixture_dir, tmp_path):
    run_dir = str(tmp_path / "run")
    cfg = DedupConfig()
    r1 = dedup_pipeline(f"{fixture_dir}/corpus", cfg, run_dir=run_dir)
    a1 = _assignments_table(r1)
    import glob
    chunk_markers = sorted(glob.glob(
        os.path.join(run_dir, "stage=signed", "chunk=*.done.json")))
    assert chunk_markers, "sign stage should checkpoint per chunk"
    mtimes = {p: os.path.getmtime(p) for p in chunk_markers}

    r2 = dedup_pipeline(f"{fixture_dir}/corpus", cfg, run_dir=run_dir, resume=True)
    a2 = _assignments_table(r2)
    assert a1.equals(a2)
    # completed sign chunks were read back, not recomputed
    for p, m in mtimes.items():
        assert os.path.getmtime(p) == m, f"chunk recomputed: {p}"


def test_resume_recomputes_truncated_stage(ray_session, fixture_dir, tmp_path):
    run_dir = str(tmp_path / "run")
    cfg = DedupConfig()
    r1 = dedup_pipeline(f"{fixture_dir}/corpus", cfg, run_dir=run_dir)
    a1 = _assignments_table(r1)
    # simulate a crash after the sign stage: downstream markers vanish
    for stage in ["edges_exact", "edges_minhash", "edges_simhash", "edges",
                  "assignments"]:
        p = os.path.join(run_dir, f"stage={stage}", "_SUCCESS.json")
        if os.path.exists(p):
            os.remove(p)
    r2 = dedup_pipeline(f"{fixture_dir}/corpus", cfg, run_dir=run_dir, resume=True)
    assert a1.equals(_assignments_table(r2))


def test_config_mismatch_refused(ray_session, fixture_dir, tmp_path):
    run_dir = str(tmp_path / "run")
    dedup_pipeline(f"{fixture_dir}/corpus", DedupConfig(), run_dir=run_dir)
    with pytest.raises(ValueError, match="different config"):
        dedup_pipeline(f"{fixture_dir}/corpus", DedupConfig(tau=0.8),
                       run_dir=run_dir, resume=True)


def test_distributed_cc_matches_driver_path(ray_session, small_fixture):
    import ray
    cfg_driver = DedupConfig()
    cfg_dist = DedupConfig(driver_cc_max_edges=0)  # force hash-to-min
    ds1 = ray.data.from_arrow(small_fixture.corpus)
    ds2 = ray.data.from_arrow(small_fixture.corpus)
    a1 = _assignments_table(dedup_pipeline(ds1, cfg_driver))
    a2 = _assignments_table(dedup_pipeline(ds2, cfg_dist))
    assert a1.equals(a2)


def test_salted_path_preserves_recall(ray_session, small_fixture):
    import ray
    from nise_ray.hashing import doc_key as doc_key_fn
    from nise_ray.ops.components import UnionFind
    cfg = DedupConfig(salt_shards=4, bucket_cap=50)
    ds = ray.data.from_arrow(small_fixture.corpus)
    res = dedup_pipeline(ds, cfg)
    edges = collect_table(res.edges)
    uf = UnionFind()
    for u, v in zip(edges.column("u").to_pylist(), edges.column("v").to_pylist()):
        uf.union(u, v)
    tp = small_fixture.truth_pairs
    denom = hit = 0
    for i in range(tp.num_rows):
        kind = tp.column("kind")[i].as_py()
        jv = tp.column("true_jaccard")[i].as_py()
        if not (kind == "exact" or (kind in ("near_high", "whitespace")
                                    and jv is not None and jv >= 0.8)):
            continue
        u = doc_key_fn(tp.column("u_repo")[i].as_py(), tp.column("u_path")[i].as_py(),
                       tp.column("u_commit")[i].as_py())
        v = doc_key_fn(tp.column("v_repo")[i].as_py(), tp.column("v_path")[i].as_py(),
                       tp.column("v_commit")[i].as_py())
        denom += 1
        if u in uf.parent and v in uf.parent and uf.find(u) == uf.find(v):
            hit += 1
    assert denom > 50
    assert hit / denom >= 0.99, f"salted recall {hit/denom:.4f}"
