"""CLI surface: python -m nise_ray.run end-to-end in a subprocess."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest


@pytest.mark.slow
def test_cli_end_to_end(small_fixture, tmp_path):
    from nise_ray.fixtures import write_fixture
    fdir = tmp_path / "fx"
    write_fixture(small_fixture, str(fdir), rows_per_file=60)
    out = tmp_path / "out"
    env = dict(os.environ, RAY_ADDRESS="local")
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "nise_ray.run",
         "--input", f"{fdir}/corpus", "--output", str(out),
         "--run-dir", str(tmp_path / "run"), "--num-cpus", "4"],
        capture_output=True, text=True, timeout=600, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["n_docs"] == small_fixture.corpus.num_rows
    t = pq.read_table(str(out / "assignments"))
    assert t.num_rows == small_fixture.corpus.num_rows
    with open(out / "stats.json") as f:
        assert json.load(f)["n_edges"] == stats["n_edges"]
