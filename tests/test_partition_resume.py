"""Partition-level sign resume: only incomplete chunks are recomputed."""

import glob
import os
import shutil

from nise_ray.config import DedupConfig
from nise_ray.pipeline import dedup_pipeline
from nise_ray.util import collect_table


def test_partial_chunk_resume(ray_session, small_fixture, tmp_path):
    from nise_ray.fixtures import write_fixture
    fdir = tmp_path / "fx"
    write_fixture(small_fixture, str(fdir), rows_per_file=20)  # many files
    run_dir = str(tmp_path / "run")
    cfg = DedupConfig(sign_chunk_files=3)
    r1 = dedup_pipeline(f"{fdir}/corpus", cfg, run_dir=run_dir)
    a1 = collect_table(r1.assignments).sort_by("doc_key")

    markers = sorted(glob.glob(
        os.path.join(run_dir, "stage=signed", "chunk=*.done.json")))
    assert len(markers) >= 2, "need multiple chunks to test partial resume"
    # simulate a crash mid-sign: last chunk incomplete, downstream gone
    victim = markers[-1]
    os.remove(victim)
    shutil.rmtree(victim[: -len(".done.json")], ignore_errors=True)
    for stage in ["edges_candidates", "edges", "assignments"]:
        p = os.path.join(run_dir, f"stage={stage}", "_SUCCESS.json")
        if os.path.exists(p):
            os.remove(p)
    keep_mtimes = {p: os.path.getmtime(p) for p in markers[:-1]}

    r2 = dedup_pipeline(f"{fdir}/corpus", cfg, run_dir=run_dir, resume=True)
    a2 = collect_table(r2.assignments).sort_by("doc_key")
    assert a1.select(["doc_key", "cluster_id", "content_sha256"]).equals(
        a2.select(["doc_key", "cluster_id", "content_sha256"]))
    # untouched chunks were NOT recomputed; the victim was
    for p, m in keep_mtimes.items():
        assert os.path.getmtime(p) == m
    assert os.path.exists(victim)
