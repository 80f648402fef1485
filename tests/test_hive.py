"""Hive-partitioned rewrite + directory-pruned read round-trip."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_hive_round_trip_counts(ray_session, tmp_path):
    from nise_ray.ops.hive import hive_pruned_counts
    langs = ["en", "fr", "en", "en", "fr", "de"]
    srcs = ["a", "a", "b", "a", "b", "a"]
    n = len(langs)
    t = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array([f"t{i}" for i in range(n)]),
        "lang": pa.array(langs),
        "source": pa.array(srcs),
        "n_chars": pa.array([10 * (i + 1) for i in range(n)], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = str(tmp_path / "hive")
    got = hive_pruned_counts(str(tmp_path), lang="en", out_dir=out) \
        .to_pandas().sort_values("source").reset_index(drop=True)
    # en docs: ids 0 (a, 10), 2 (b, 30), 3 (a, 40)
    assert list(got["source"]) == ["a", "b"]
    assert list(got["n_docs"]) == [2, 1]
    assert list(got["sum_chars"]) == [50, 30]
    # the layout is really hive-partitioned, one dir per lang
    assert sorted(d for d in os.listdir(out) if d.startswith("lang=")) \
        == ["lang=de", "lang=en", "lang=fr"]


def test_hive_rewrite_is_idempotent(ray_session, tmp_path):
    from nise_ray.ops.hive import hive_pruned_counts
    t = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["x", "y"]),
        "lang": pa.array(["en", "en"]),
        "source": pa.array(["s", "s"]),
        "n_chars": pa.array([5, 7], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = str(tmp_path / "hive")
    a = hive_pruned_counts(str(tmp_path), lang="en", out_dir=out) \
        .to_pandas()
    b = hive_pruned_counts(str(tmp_path), lang="en", out_dir=out) \
        .to_pandas()  # overwrite mode: no doubling on rewrite
    assert list(a["n_docs"]) == list(b["n_docs"]) == [2]
    assert list(a["sum_chars"]) == list(b["sum_chars"]) == [12]
