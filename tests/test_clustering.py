"""Distributed k-means + SemDeDup (stages/clustering.py): blob recovery,
assignment purity, planted near-dup detection, oversize-cluster guard."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from opentelemetry_collector_ray.stages.clustering import (
    kmeans_assign, kmeans_fit, semantic_dedup)


def _blobs(n_per=60, d=12, k=3, seed=11, jitter=0.05):
    """k well-separated unit-norm blob centers + jittered members."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows, labels = [], []
    for c in range(k):
        pts = centers[c] + jitter * rng.normal(size=(n_per, d))
        rows.append(pts)
        labels.extend([c] * n_per)
    x = np.concatenate(rows).astype(np.float32)
    return pa.table({
        "vec_id": pa.array(np.arange(len(x)), pa.int64()),
        "embedding": pa.array(list(x), pa.list_(pa.float32())),
    }), np.array(labels), centers


def test_kmeans_recovers_blobs(ray_session):
    tbl, truth, _ = _blobs()
    make = lambda: ray.data.from_arrow(tbl).repartition(4)  # noqa: E731
    cent = kmeans_fit(make, k=3, iters=5, sample_size=64)
    assert cent.shape == (3, 12)
    assert np.allclose(np.linalg.norm(cent, axis=1), 1.0, atol=1e-9)
    out = kmeans_assign(make(), cent).to_pandas().sort_values("vec_id")
    got = out["cluster"].to_numpy()
    # purity: every true blob maps to ONE distinct kmeans cluster
    mapping = {}
    for c in range(3):
        ids, cnt = np.unique(got[truth == c], return_counts=True)
        assert cnt.max() / cnt.sum() > 0.95
        mapping[c] = ids[cnt.argmax()]
    assert len(set(mapping.values())) == 3


def test_semantic_dedup_planted_pairs(ray_session):
    tbl, _, _ = _blobs(n_per=40, seed=7)
    x = np.stack(tbl.column("embedding").to_pylist()).astype(np.float32)
    # plant near-dups: rows 200..203 are tiny perturbations of rows 0..3
    dups = x[:4] + 1e-4 * np.random.default_rng(1).normal(size=(4, 12))
    x2 = np.concatenate([x, dups.astype(np.float32)])
    n = len(x2)
    tbl2 = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(x2), pa.list_(pa.float32()))})
    make = lambda: ray.data.from_arrow(tbl2).repartition(3)  # noqa: E731
    out = semantic_dedup(make, k=3, threshold=0.9999, iters=3)
    pdf = out.to_pandas() if hasattr(out, "to_pandas") else out
    pairs = {tuple(sorted((int(a), int(b))))
             for a, b in zip(pdf["vec_id"], pdf["rep_id"]) if a != b}
    assert pairs == {(0, 120), (1, 121), (2, 122), (3, 123)}


def test_semantic_dedup_no_dups_empty(ray_session):
    tbl, _, _ = _blobs(n_per=20, seed=3)
    make = lambda: ray.data.from_arrow(tbl)  # noqa: E731
    out = semantic_dedup(make, k=3, threshold=0.999999, iters=2)
    pdf = out if not hasattr(out, "to_pandas") else out.to_pandas()
    assert len(pdf) == 0
    assert list(pdf.columns) == ["vec_id", "rep_id"]


def test_semantic_dedup_oversize_cluster_guard(ray_session):
    tbl, _, _ = _blobs(n_per=30, k=1, seed=5)
    make = lambda: ray.data.from_arrow(tbl)  # noqa: E731
    with pytest.raises(Exception, match="max_cluster_rows"):
        semantic_dedup(make, k=1, threshold=0.99, iters=1,
                       max_cluster_rows=10).to_pandas()


def test_pca_recovers_low_rank_structure(ray_session):
    """Synthetic rank-2 data + small noise: 2 components capture nearly
    all variance; components orthonormal; matches numpy PCA projection
    up to the deterministic sign convention."""
    from opentelemetry_collector_ray.stages.clustering import (
        pca_fit, pca_transform)

    rng = np.random.default_rng(13)
    basis = np.linalg.qr(rng.normal(size=(8, 2)))[0].T      # (2, 8)
    coef = rng.normal(size=(300, 2)) * np.array([5.0, 2.0])
    x = (coef @ basis + 0.01 * rng.normal(size=(300, 8))
         + np.array([3.0] * 8)).astype(np.float32)
    tbl = pa.table({"vec_id": pa.array(np.arange(300), pa.int64()),
                    "embedding": pa.array(list(x), pa.list_(pa.float32()))})
    make = lambda: ray.data.from_arrow(tbl).repartition(4)  # noqa: E731

    mean, comp = pca_fit(make, n_components=2)
    assert comp.shape == (2, 8)
    assert np.allclose(comp @ comp.T, np.eye(2), atol=1e-8)
    assert np.allclose(mean, x.mean(axis=0), atol=1e-4)

    # projected variance ≈ total variance (rank-2 + tiny noise)
    out = pca_transform(make(), mean, comp).to_pandas()
    y = np.stack(out.sort_values("vec_id")["pca"].to_numpy())
    total_var = ((x - x.mean(0)) ** 2).sum() / (len(x) - 1)
    kept_var = (y.astype(np.float64) ** 2).sum() / (len(x) - 1)
    assert kept_var / total_var > 0.999

    # parity with driver-side numpy PCA (eigh on the same covariance)
    cov = np.cov(x.astype(np.float64).T)
    w, v = np.linalg.eigh(cov)
    ref = v[:, ::-1][:, :2].T
    for r in range(2):
        assert min(np.abs(ref[r] - comp[r]).max(),
                   np.abs(ref[r] + comp[r]).max()) < 1e-6


def test_pca_validation(ray_session):
    from opentelemetry_collector_ray.stages.clustering import pca_fit

    tbl = pa.table({"embedding": pa.array([[1.0, 2.0]] * 3,
                                          pa.list_(pa.float32()))})
    make = lambda: ray.data.from_arrow(tbl)  # noqa: E731
    with pytest.raises(ValueError, match="n_components"):
        pca_fit(make, n_components=5)


def test_pca_empty_blocks_and_tiny_input(ray_session):
    """repartition(8) of a 4-row table yields empty blocks — the partial
    pass must emit typed empties, not crash."""
    from opentelemetry_collector_ray.stages.clustering import pca_fit

    x = np.eye(4, 3, dtype=np.float32)
    tbl = pa.table({"embedding": pa.array(list(x), pa.list_(pa.float32()))})
    make = lambda: ray.data.from_arrow(tbl).repartition(8)  # noqa: E731
    mean, comp = pca_fit(make, n_components=2)
    assert comp.shape == (2, 3)
