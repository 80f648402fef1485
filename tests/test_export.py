"""WebDataset tar-shard export: round-trip, determinism, resume."""

import hashlib
import json
import os
import tarfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, n=37):
    texts = [f"doc {i} body é中{'x' * (i % 7)}" for i in range(n)]
    t = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["py"] * n),
        "source": pa.array(["s"] * n),
        "n_chars": pa.array([len(s) for s in texts], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path), texts


def test_export_round_trip_and_determinism(ray_session, tmp_path):
    from nise_ray.export import export_tar_shards
    sf, texts = _write_docs(tmp_path)
    out1, out2 = str(tmp_path / "o1"), str(tmp_path / "o2")
    m1 = export_tar_shards(sf, out1, n_shards=4).to_pandas()
    m2 = export_tar_shards(sf, out2, n_shards=4).to_pandas()
    # manifest accounting
    assert m1["n_docs"].sum() == 37
    assert list(m1["shard_id"]) == [0, 1, 2, 3]
    # byte-identical across independent runs (zeroed tar metadata)
    assert list(m1["sha256"]) == list(m2["sha256"])
    for sid in range(4):
        b1 = open(os.path.join(out1, f"shard-{sid:05d}.tar"), "rb").read()
        assert hashlib.sha256(b1).hexdigest() == m1["sha256"][sid]
    # member round-trip: every doc lands in shard doc_id % 4, text intact
    seen = {}
    for sid in range(4):
        with tarfile.open(os.path.join(out1, f"shard-{sid:05d}.tar")) as tf:
            names = tf.getnames()
            assert names == sorted(names)  # doc_id order
            for name in names:
                did = int(name.split(".")[0])
                assert did % 4 == sid
                seen[did] = tf.extractfile(name).read().decode("utf-8")
    assert seen == {i: texts[i] for i in range(37)}


def test_export_resume_skips_done_shards(ray_session, tmp_path):
    from nise_ray.export import export_tar_shards
    sf, _ = _write_docs(tmp_path, n=20)
    out = str(tmp_path / "o")
    m1 = export_tar_shards(sf, out, n_shards=2).to_pandas()
    mt0 = {f: os.path.getmtime(os.path.join(out, f))
           for f in os.listdir(out) if f.endswith(".tar")}
    m2 = export_tar_shards(sf, out, n_shards=2, resume=True).to_pandas()
    assert list(m1["sha256"]) == list(m2["sha256"])
    for f, t0 in mt0.items():
        assert os.path.getmtime(os.path.join(out, f)) == t0  # untouched
    # a stale sidecar (wrong count) forces a rewrite
    done = os.path.join(out, "shard-00000.tar.done.json")
    meta = json.load(open(done))
    meta["n_docs"] = 999
    json.dump(meta, open(done, "w"))
    m3 = export_tar_shards(sf, out, n_shards=2, resume=True).to_pandas()
    assert list(m3["sha256"]) == list(m1["sha256"])
    # the rewrite restored a truthful sidecar
    assert json.load(open(done))["n_docs"] == int(m1["n_docs"][0])
