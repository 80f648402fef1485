"""Distributed dense linear algebra over the embeddings table.

The Gram/covariance combiner is the workhorse behind embedding
whitening, PCA compression and Mahalanobis outlier scoring in a
training-data pipeline (and the preprocessing step SemDeDup-style
semantic dedup wants before clustering).

Scale contracts:
- ``embedding_covariance``: each block emits ONE partial row
  (n, Σx, Σxxᵀ) — the classic mergeable second-moment combiner; the
  driver touches block-count × d² doubles (d=64 → 32 KB per partial),
  never a corpus-sized object, and no shuffle happens at all (the
  partial stream IS the reduction input);
- ``embedding_pca``: eigendecomposition of the d×d covariance on the
  driver — d is a model constant, so the eigh cost is independent of
  corpus size; the spectrum/effective-rank report is the diagnostic a
  100-TB embedding table needs before committing to an IVF/whitening
  config. Projecting the corpus onto the top components would be one
  stateless ``map_batches`` with the (d×k) eigvector matrix broadcast
  via ``ray.put`` — the same shape as ``ops/ann.brute_force_topk``.

Cancellation caveat (same as ops/analytics.lang_char_moments): the
direct Σxxᵀ/n − μμᵀ form loses precision when variances are tiny
relative to means at huge n; embeddings are zero-centered by
construction in practice, and the oracle gate pins agreement with
DuckDB's streaming covar_pop after round(,6) at the tested scales.
For adversarial inputs shift each block by its first row before
accumulating (mergeable with the same algebra).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from nise_ray.ops.ann import _embedding_matrix
from nise_ray.util import collect_table


def _gram_partials(sf_dir: str) -> pa.Table:
    """Block-count-sized table of mergeable moment partials
    (n, s=Σx as list<double>, g=Σxxᵀ row-major flattened)."""

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.list_(pa.float64())),
                             "g": pa.array([], pa.list_(pa.float64()))})
        x = _embedding_matrix(b)
        s = x.sum(axis=0)
        g = x.T @ x
        return pa.table({"n": pa.array([b.num_rows], pa.int64()),
                         "s": pa.array([s.tolist()],
                                       pa.list_(pa.float64())),
                         "g": pa.array([g.ravel().tolist()],
                                       pa.list_(pa.float64()))})

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["embedding"])
    return collect_table(ds.map_batches(partial, batch_format="pyarrow",
                                        zero_copy_batch=True))


def _covariance_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray, int]:
    """(d×d population covariance, d mean vector, n) from the merged
    partials."""
    t = _gram_partials(sf_dir)
    if t.num_rows == 0:
        return np.zeros((0, 0)), np.zeros(0), 0
    n = int(np.sum(t.column("n").to_numpy(zero_copy_only=False)))
    s_col = t.column("s").combine_chunks()
    g_col = t.column("g").combine_chunks()
    d = len(s_col[0])
    s = s_col.flatten().to_numpy(zero_copy_only=False) \
        .reshape(-1, d).sum(axis=0)
    g = g_col.flatten().to_numpy(zero_copy_only=False) \
        .reshape(-1, d * d).sum(axis=0).reshape(d, d)
    mean = s / n
    return g / n - np.outer(mean, mean), mean, n


def embedding_covariance(sf_dir: str, round_to: int = 6) -> pa.Table:
    """Population covariance matrix of the embedding dimensions as the
    upper triangle (i, j, cov) with 1-based dims (matching SQL list
    indexing). Output is d(d+1)/2 rows — model-constant, never
    corpus-sized. One map pass, no shuffle."""
    cov, _mean, _n = _covariance_matrix(sf_dir)
    d = cov.shape[0]
    if d == 0:
        return pa.table({"i": pa.array([], pa.int64()),
                         "j": pa.array([], pa.int64()),
                         "cov": pa.array([], pa.float64())})
    iu, ju = np.triu_indices(d)
    return pa.table({
        "i": pa.array(iu + 1, pa.int64()),
        "j": pa.array(ju + 1, pa.int64()),
        "cov": pa.array(np.round(cov[iu, ju], round_to), pa.float64())})


def embedding_pca(sf_dir: str, top_k: int = 16,
                  round_to: int = 6) -> pa.Table:
    """PCA eigen-spectrum of the embedding covariance: the top-k
    (component, eigenvalue, explained_var, cum_explained_var) rows,
    components 1-based in descending-eigenvalue order. Deterministic
    (eigenvalues are sign/rotation-free, unlike eigvectors — which is
    why the spectrum, not the loadings, is the reported surface).
    Driver cost is the d×d eigh only."""
    cov, _mean, _n = _covariance_matrix(sf_dir)
    d = cov.shape[0]
    empty = pa.table({"component": pa.array([], pa.int64()),
                      "eigenvalue": pa.array([], pa.float64()),
                      "explained_var": pa.array([], pa.float64()),
                      "cum_explained_var": pa.array([], pa.float64())})
    if d == 0:
        return empty
    ev = np.linalg.eigvalsh(cov)[::-1]          # descending
    total = ev.sum()
    k = min(top_k, d)
    ratio = ev / total if total > 0 else np.zeros_like(ev)
    return pa.table({
        "component": pa.array(np.arange(1, k + 1), pa.int64()),
        "eigenvalue": pa.array(np.round(ev[:k], round_to), pa.float64()),
        "explained_var": pa.array(np.round(ratio[:k], round_to),
                                  pa.float64()),
        "cum_explained_var": pa.array(
            np.round(np.cumsum(ratio)[:k], round_to), pa.float64())})


def label_centroids(sf_dir: str, round_to: int = 6) -> pa.Table:
    """Per-label mean embedding as (label, i, centroid) rows with
    1-based dims — the grouped version of the Gram combiner's first
    moment. Each block emits one (label, n, Σx) partial per label it
    saw; ONE label-keyed exchange of label-count-sized partials merges
    them (never corpus-sized). The output is labels × d rows — a model
    constant. This is the k-means/IVF seeding and per-class drift
    diagnostic over a labeled embedding table."""
    from nise_ray.ops.groupapply import hash_group_apply, segments

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"label": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64()),
                          "s": pa.array([], pa.list_(pa.float64()))})
        if b.num_rows == 0:
            return empty
        x = _embedding_matrix(b)
        lab = b.column("label").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.argsort(lab, kind="stable")
        starts, counts = segments(lab[order])
        sums = np.add.reduceat(x[order], starts, axis=0)
        return pa.table({
            "label": pa.array(lab[order][starts], pa.int64()),
            "n": pa.array(counts, pa.int64()),
            "s": pa.array(list(sums), pa.list_(pa.float64()))})

    def merge(b: pa.Table) -> pa.Table:
        empty = pa.table({"label": pa.array([], pa.int64()),
                          "i": pa.array([], pa.int64()),
                          "centroid": pa.array([], pa.float64())})
        if b.num_rows == 0:
            return empty
        lab = b.column("label").to_numpy(zero_copy_only=False)
        n = b.column("n").to_numpy(zero_copy_only=False)
        s_col = b.column("s").combine_chunks()
        d = len(s_col[0])
        s = s_col.flatten().to_numpy(zero_copy_only=False).reshape(-1, d)
        order = np.argsort(lab, kind="stable")
        starts, _counts = segments(lab[order])
        tot_n = np.add.reduceat(n[order], starts)
        tot_s = np.add.reduceat(s[order], starts, axis=0)
        cent = tot_s / tot_n[:, None]
        g = len(starts)
        return pa.table({
            "label": pa.array(np.repeat(lab[order][starts], d), pa.int64()),
            "i": pa.array(np.tile(np.arange(1, d + 1), g), pa.int64()),
            "centroid": pa.array(np.round(cent.ravel(), round_to),
                                 pa.float64())})

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["label", "embedding"])
    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return collect_table(hash_group_apply(partials, ["label"], merge,
                                          0, sort=False))


def embedding_outliers(sf_dir: str, k: int = 20, ridge: float = 1e-6,
                       round_to: int = 6) -> pa.Table:
    """Top-k Mahalanobis outliers: the vectors farthest from the corpus
    distribution under the fitted (mean, covariance) — the standard
    embedding-space contamination/garbage detector for training data.

    Two passes, both shuffle-free: (1) the Gram combiner fits
    (mean, Σ) — block-count-sized reduction; (2) the driver inverts the
    ridge-regularized d×d once, broadcasts (mean, Σ⁻¹) via ray.put, and
    a stateless map scores each batch with one einsum, keeping only its
    LOCAL top-k — the driver merges block-count × k candidate rows,
    never the corpus. Ties broken by vec_id for determinism.
    Returns (rank, vec_id, mahalanobis_sq) descending."""
    cov, mean, n = _covariance_matrix(sf_dir)
    empty = pa.table({"rank": pa.array([], pa.int64()),
                      "vec_id": pa.array([], pa.int64()),
                      "mahalanobis_sq": pa.array([], pa.float64())})
    d = cov.shape[0]
    if d == 0 or n == 0:
        return empty
    prec = np.linalg.inv(cov + ridge * np.eye(d))
    ref = ray.put((mean, prec))

    class Scorer:
        def __init__(self) -> None:
            self.mean, self.prec = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"vec_id": pa.array([], pa.int64()),
                                 "md2": pa.array([], pa.float64())})
            x = _embedding_matrix(b) - self.mean
            md2 = np.einsum("ij,jk,ik->i", x, self.prec, x)
            vid = b.column("vec_id").to_numpy(zero_copy_only=False)
            top = np.argsort(-md2, kind="stable")[:k]
            return pa.table({"vec_id": pa.array(vid[top], pa.int64()),
                             "md2": pa.array(md2[top], pa.float64())})

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    from nise_ray.ops.groupapply import default_concurrency
    cand = collect_table(ds.map_batches(
        Scorer, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=default_concurrency()))
    if cand.num_rows == 0:
        return empty
    md2 = cand.column("md2").to_numpy(zero_copy_only=False)
    vid = cand.column("vec_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((vid, -md2))[:k]
    return pa.table({
        "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
        "vec_id": pa.array(vid[order], pa.int64()),
        "mahalanobis_sq": pa.array(np.round(md2[order], round_to),
                                   pa.float64())})
