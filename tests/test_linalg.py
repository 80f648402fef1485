"""Distributed Gram/covariance combiner and PCA spectrum vs numpy."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_embeddings(tmp_path, vecs: np.ndarray) -> str:
    t = pa.table({
        "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
        "embedding": pa.array(list(vecs.astype(np.float32)),
                              pa.list_(pa.float32())),
        "label": pa.array(np.zeros(len(vecs), np.int32), pa.int32()),
    })
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_covariance_matches_numpy(ray_session, tmp_path):
    """Merged block partials reproduce np.cov(bias=True) bit-close;
    upper-triangle indexing is 1-based (SQL list semantics)."""
    from nise_ray.ops.linalg import embedding_covariance
    rng = np.random.Generator(np.random.PCG64(3))
    x = rng.standard_normal((257, 6))  # odd count -> uneven blocks
    got = embedding_covariance(_write_embeddings(tmp_path, x),
                               round_to=9).to_pandas()
    ref = np.cov(x.astype(np.float32).astype(np.float64),
                 rowvar=False, bias=True)
    assert len(got) == 6 * 7 // 2
    for row in got.itertuples():
        assert row.i <= row.j
        np.testing.assert_allclose(
            row.cov, ref[row.i - 1, row.j - 1], rtol=0, atol=2e-9)


def test_pca_spectrum_matches_numpy(ray_session, tmp_path):
    """Eigen-spectrum equals eigvalsh of the same covariance, descending,
    with explained ratios summing toward 1."""
    from nise_ray.ops.linalg import embedding_pca
    rng = np.random.Generator(np.random.PCG64(5))
    # anisotropic data: a dominant direction the spectrum must expose
    base = rng.standard_normal((300, 8))
    base[:, 0] *= 5.0
    got = embedding_pca(_write_embeddings(tmp_path, base),
                        top_k=8, round_to=9).to_pandas()
    xf = base.astype(np.float32).astype(np.float64)
    ref = np.linalg.eigvalsh(np.cov(xf, rowvar=False, bias=True))[::-1]
    np.testing.assert_allclose(got["eigenvalue"].to_numpy(), ref,
                               rtol=0, atol=2e-8)
    assert (got["component"].to_numpy() == np.arange(1, 9)).all()
    assert got["eigenvalue"].iloc[0] > 5 * got["eigenvalue"].iloc[1]
    assert abs(got["cum_explained_var"].iloc[-1] - 1.0) < 1e-6


def test_covariance_empty_table(ray_session, tmp_path):
    from nise_ray.ops.linalg import (embedding_covariance,
                                     embedding_outliers, embedding_pca)
    sf = _write_embeddings(tmp_path, np.zeros((0, 4)))
    assert embedding_covariance(sf).num_rows == 0
    assert embedding_pca(sf).num_rows == 0
    assert embedding_outliers(sf).num_rows == 0


def test_label_centroids_match_numpy(ray_session, tmp_path):
    """Per-label merged partials equal a direct per-label mean."""
    import pyarrow.parquet as pq

    from nise_ray.ops.linalg import label_centroids
    rng = np.random.Generator(np.random.PCG64(13))
    x = rng.standard_normal((123, 4))
    labels = rng.integers(0, 3, 123).astype(np.int32)
    t = pa.table({
        "vec_id": pa.array(np.arange(123), pa.int64()),
        "embedding": pa.array(list(x.astype(np.float32)),
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    got = label_centroids(str(tmp_path), round_to=9).to_pandas() \
        .sort_values(["label", "i"]).reset_index(drop=True)
    assert len(got) == 3 * 4
    xf = x.astype(np.float32).astype(np.float64)
    for lab in range(3):
        ref = xf[labels == lab].mean(axis=0)
        sub = got[got["label"] == lab]
        np.testing.assert_allclose(sub["centroid"].to_numpy(), ref,
                                   rtol=0, atol=2e-9)
        assert list(sub["i"]) == [1, 2, 3, 4]


def test_mahalanobis_outliers_find_planted(ray_session, tmp_path):
    """A planted far-away vector ranks #1; scores match a direct numpy
    Mahalanobis computation on the same (float32-quantized) data."""
    from nise_ray.ops.linalg import embedding_outliers
    rng = np.random.Generator(np.random.PCG64(9))
    x = rng.standard_normal((200, 5))
    x[123] = 40.0  # the contamination vector
    got = embedding_outliers(_write_embeddings(tmp_path, x),
                             k=5, round_to=9).to_pandas()
    assert got["vec_id"].iloc[0] == 123
    assert list(got["rank"]) == [1, 2, 3, 4, 5]
    xf = x.astype(np.float32).astype(np.float64)
    mean = xf.mean(axis=0)
    cov = np.cov(xf, rowvar=False, bias=True) + 1e-6 * np.eye(5)
    prec = np.linalg.inv(cov)
    c = xf - mean
    ref = np.einsum("ij,jk,ik->i", c, prec, c)
    top = got.iloc[0]
    np.testing.assert_allclose(top["mahalanobis_sq"], ref[123],
                               rtol=1e-6)
    assert (got["mahalanobis_sq"].to_numpy()[:-1] >=
            got["mahalanobis_sq"].to_numpy()[1:]).all()
