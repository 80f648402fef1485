"""Incremental (delta) dedup: base sign chunks are reused, output is
identical to a from-scratch run over base ∪ delta."""

import glob
import os

import pyarrow.parquet as pq

from nise_ray.config import DedupConfig
from nise_ray.pipeline import dedup_delta, dedup_pipeline
from nise_ray.util import collect_table


def _assignments_view(res):
    t = collect_table(res.assignments)
    t = t.sort_by("doc_key")
    return t.select(["doc_key", "content_sha256"]), t.column("cluster_id")


def test_delta_reuses_base_chunks_and_matches_scratch(ray_session,
                                                      small_fixture,
                                                      tmp_path):
    corpus = small_fixture.corpus
    n = corpus.num_rows
    cut = (n * 4) // 5
    base_dir = tmp_path / "base"
    delta_dir = tmp_path / "delta"
    all_dir = tmp_path / "all"
    for d in (base_dir, delta_dir, all_dir):
        d.mkdir()
    # several base files so there are several sign chunks
    per_file = max(1, cut // 4)
    for i, lo in enumerate(range(0, cut, per_file)):
        pq.write_table(corpus.slice(lo, min(per_file, cut - lo)),
                       str(base_dir / f"part-{i}.parquet"))
    pq.write_table(corpus.slice(cut), str(delta_dir / "part-0.parquet"))
    pq.write_table(corpus, str(all_dir / "part-0.parquet"))

    cfg = DedupConfig(sign_chunk_files=2)
    base_run = str(tmp_path / "base_run")
    base_res = dedup_pipeline(str(base_dir), cfg, run_dir=base_run)
    assert base_res.stats["n_docs"] == cut

    markers = sorted(glob.glob(os.path.join(base_run, "stage=signed",
                                            "chunk=*.done.json")))
    assert markers, "base run produced no sign-chunk markers"
    mtimes = {m: os.path.getmtime(m) for m in markers}

    delta_res = dedup_delta(str(base_dir), str(delta_dir), cfg,
                            base_run_dir=base_run)
    assert delta_res.stats["n_docs"] == n
    # unchanged base chunks were NOT re-signed
    for m, t0 in mtimes.items():
        assert os.path.getmtime(m) == t0, f"base chunk re-signed: {m}"

    scratch = dedup_pipeline(str(all_dir), cfg)
    dv, dc = _assignments_view(delta_res)
    sv, sc = _assignments_view(scratch)
    assert dv.equals(sv)
    # cluster ids are min-doc_key labels — identical, not just isomorphic
    assert dc.to_pylist() == sc.to_pylist()


def test_delta_requires_base_run_dir(ray_session, tmp_path):
    import pytest
    with pytest.raises(ValueError, match="base_run_dir"):
        dedup_delta(str(tmp_path / "x"), str(tmp_path / "y"), DedupConfig())
