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


def test_curate_corpus_kill_and_resume(ray_session, tmp_path):
    """curate_corpus checkpointing: identical output to the
    non-checkpointed run; a full resume skips every stage (mtimes
    unchanged); a simulated mid-run kill (downstream stages missing)
    re-derives only the missing stages from the surviving checkpoints;
    resuming with different params fails loudly."""
    import os
    import shutil

    import pandas as pd

    from nise_ray.ops.curate import curate_corpus

    sf = "/root/testdata/sf0.001"
    d = str(tmp_path / "curate_run")

    def canon(ds):
        return ds.to_pandas().sort_values(["lang", "doc_id"]) \
            .reset_index(drop=True)

    base = canon(curate_corpus(sf))            # no checkpointing
    out1 = canon(curate_corpus(sf, run_dir=d))  # fresh checkpointed run
    pd.testing.assert_frame_equal(base, out1, check_exact=True)

    stages = ["curate_kept", "curate_lm", "curate_scored", "curate_out"]
    marks = {s: os.path.join(d, f"stage={s}", "_SUCCESS.json")
             for s in stages}
    assert all(os.path.exists(p) for p in marks.values())
    mt0 = {s: os.path.getmtime(p) for s, p in marks.items()}

    out2 = canon(curate_corpus(sf, run_dir=d, resume=True))
    pd.testing.assert_frame_equal(base, out2, check_exact=True)
    assert {s: os.path.getmtime(p) for s, p in marks.items()} == mt0

    # simulated pre-emption: downstream stages lost, survivors + LM kept
    for s in ("curate_scored", "curate_out"):
        shutil.rmtree(os.path.join(d, f"stage={s}"))
    out3 = canon(curate_corpus(sf, run_dir=d, resume=True))
    pd.testing.assert_frame_equal(base, out3, check_exact=True)
    assert os.path.getmtime(marks["curate_kept"]) == mt0["curate_kept"]
    assert os.path.getmtime(marks["curate_lm"]) == mt0["curate_lm"]
    assert os.path.getmtime(marks["curate_scored"]) > mt0["curate_scored"]

    import pytest
    with pytest.raises(ValueError, match="different config"):
        curate_corpus(sf, n_buckets=5, run_dir=d, resume=True)


def test_prepare_training_docs_resume(ray_session, tmp_path):
    import os

    import pandas as pd

    from nise_ray.ops.analytics import prepare_training_docs

    sf = "/root/testdata/sf0.001"
    d = str(tmp_path / "prep_run")

    def canon(ds):
        return ds.to_pandas().sort_values(["doc_id", "chunk_idx"]) \
            .reset_index(drop=True)

    base = canon(prepare_training_docs(sf))
    out1 = canon(prepare_training_docs(sf, run_dir=d))
    pd.testing.assert_frame_equal(base, out1, check_exact=True)
    mark = os.path.join(d, "stage=prep_kept", "_SUCCESS.json")
    mt0 = os.path.getmtime(mark)
    out2 = canon(prepare_training_docs(sf, run_dir=d, resume=True))
    pd.testing.assert_frame_equal(base, out2, check_exact=True)
    assert os.path.getmtime(mark) == mt0
