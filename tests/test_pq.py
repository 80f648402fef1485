"""Product-quantization ANN: determinism, codes schema, recall gate."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _clustered_fixture(tmp_path, n_clusters=12, per=30, dim=32, noise=0.05):
    rng = np.random.Generator(np.random.PCG64(21))
    cents = rng.standard_normal((n_clusters, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    vecs = np.repeat(cents, per, axis=0) \
        + noise * rng.standard_normal((n_clusters * per, dim))
    t = pa.table({
        "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
        "embedding": pa.array(list(vecs.astype(np.float32)),
                              pa.list_(pa.float32())),
        "label": pa.array(np.zeros(len(vecs), np.int32), pa.int32()),
    })
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_pq_encode_schema_and_determinism(ray_session, tmp_path):
    from nise_ray.ops.pq import pq_encode
    sf = _clustered_fixture(tmp_path)
    a = pq_encode(sf, m=4, ks=8).to_pandas().sort_values("vec_id")
    b = pq_encode(sf, m=4, ks=8).to_pandas().sort_values("vec_id")
    assert list(a.columns) == ["vec_id"] + [f"code_{s}" for s in range(4)]
    for s in range(4):
        col = a[f"code_{s}"]
        assert col.dtype == np.uint8
        assert (col < 8).all()
        assert (col.to_numpy() == b[f"code_{s}"].to_numpy()).all()
    assert len(a) == 360


def test_pq_topk_recall_on_clustered_data(ray_session, tmp_path):
    """ADC top-k recovers most of the exact cosine top-k in the
    clustered regime PQ is designed for."""
    from nise_ray.ops.ann import brute_force_topk
    from nise_ray.ops.pq import pq_topk
    sf = _clustered_fixture(tmp_path)
    k = 10
    exact = brute_force_topk(sf, n_queries=5, k=k)
    truth = set(zip(exact.column("query_id").to_pylist(),
                    exact.column("vec_id").to_pylist()))
    # ADC + exact re-rank (the standard deployment): near-exact recall
    rr = pq_topk(sf, n_queries=5, k=k, m=8, ks=16, rerank=50)
    got_rr = set(zip(rr.column("query_id").to_pylist(),
                     rr.column("vec_id").to_pylist()))
    assert len(truth & got_rr) / len(truth) >= 0.9
    # raw ADC: within tight clusters the ranking is quantization-tied,
    # so the honest guarantee is CLUSTER-level recall (right cluster
    # found), not exact-rank recall
    approx = pq_topk(sf, n_queries=5, k=k, m=8, ks=16)
    ap = approx.to_pandas()
    same_cluster = (ap["vec_id"] // 30 == ap["query_id"] // 30).mean()
    assert same_cluster >= 0.9, same_cluster
    top1 = ap.sort_values(["query_id", "cosine"],
                          ascending=[True, False]) \
        .groupby("query_id").head(1)
    for r in top1.itertuples():
        assert r.vec_id // 30 == r.query_id // 30


def test_pq_dim_not_divisible_raises(ray_session, tmp_path):
    import pytest

    from nise_ray.ops.pq import pq_topk
    sf = _clustered_fixture(tmp_path, dim=30)
    with pytest.raises(ValueError, match="not divisible"):
        pq_topk(sf, m=8)
