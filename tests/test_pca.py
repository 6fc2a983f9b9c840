"""PCA operators: covariance correctness vs numpy, lane agreement,
power-iteration eigenvector quality, projection semantics."""

from __future__ import annotations

import numpy as np
import pytest

from etl_finance_pipeline_spark.operators.pca import (
    embedding_covariance,
    pca_fit,
    pca_project,
)


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.RandomState(7)
    # planted dominant direction: x = t*u + noise
    u = rng.randn(8)
    u /= np.linalg.norm(u)
    x = np.outer(rng.randn(200) * 3.0, u) + 0.1 * rng.randn(200, 8)
    rows = [(i, [float(v) for v in x[i]]) for i in range(200)]
    return x, u, spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_covariance_matches_numpy(spark, vecs):
    x, _, df = vecs
    got = {(r["i"], r["j"]): r["cov"] for r in embedding_covariance(df).collect()}
    want = np.cov(x, rowvar=False, bias=True)
    for (i, j), v in got.items():
        assert v == pytest.approx(want[i - 1, j - 1], abs=1e-9)


def test_covariance_lanes_agree(spark, vecs):
    _, _, df = vecs
    jvm = {(r["i"], r["j"]): r["cov"] for r in embedding_covariance(df).collect()}
    npy = {
        (r["i"], r["j"]): r["cov"]
        for r in embedding_covariance(df, engine="numpy").collect()
    }
    assert set(jvm) == set(npy)
    for k in jvm:
        assert jvm[k] == pytest.approx(npy[k], rel=1e-12, abs=1e-12)


def test_power_iteration_recovers_planted_direction(spark, vecs):
    x, u, df = vecs
    loadings, eig, means = pca_fit(df, iters=12)
    v = np.array(loadings)
    # aligned up to sign with the planted direction
    assert abs(float(np.dot(v, u))) > 0.99
    # eigenvalue ~ variance along u (t has std 3)
    assert eig == pytest.approx(
        float(np.linalg.eigvalsh(np.cov(x, rowvar=False, bias=True))[-1]),
        rel=1e-3,
    )
    assert v[0] >= 0  # deterministic sign contract
    assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-5)


def test_projection_centered_dot(spark, vecs):
    x, _, df = vecs
    loadings, _, means = pca_fit(df, iters=12)
    out = {r["vec_id"]: r["score"] for r in pca_project(df, loadings, means=means).collect()}
    v = np.array(loadings)
    want = (x - x.mean(axis=0)) @ v
    for i, s in out.items():
        assert s == pytest.approx(want[i], abs=1e-6)
    # projections onto the top component are zero-mean
    assert np.mean(list(out.values())) == pytest.approx(0.0, abs=1e-6)


def test_fit2_components_orthogonal_and_ranked(spark, vecs):
    from etl_finance_pipeline_spark.operators.pca import pca_fit2

    x, u, df = vecs
    comps, eigs, means = pca_fit2(df, iters=12)
    v1, v2 = np.array(comps[0]), np.array(comps[1])
    assert eigs[0] > eigs[1] > 0
    # deflation orthogonality, limited by the 6-dp lockstep rounding
    # of each component's entries
    assert abs(float(v1 @ v2)) < 1e-3
    assert np.linalg.norm(v2) == pytest.approx(1.0, abs=1e-5)
    # eigenvalues match numpy's top-2 spectrum
    spec = np.linalg.eigvalsh(np.cov(x, rowvar=False, bias=True))
    assert eigs[0] == pytest.approx(float(spec[-1]), rel=1e-3)
    assert eigs[1] == pytest.approx(float(spec[-2]), rel=1e-2)


def test_project_multi_matches_single(spark, vecs):
    from etl_finance_pipeline_spark.operators.pca import (
        pca_fit2,
        pca_project,
        pca_project_multi,
    )

    _, _, df = vecs
    comps, _, means = pca_fit2(df, iters=12)
    multi = {
        r["vec_id"]: (r["pc1"], r["pc2"])
        for r in pca_project_multi(df, comps, means=means).collect()
    }
    one = {
        r["vec_id"]: r["score"]
        for r in pca_project(df, comps[0], means=means).collect()
    }
    for k, (p1, _) in multi.items():
        assert p1 == pytest.approx(one[k], abs=1e-12)


def test_pca_outliers_ranks_off_subspace_vectors(spark):
    """Vectors inside the span of the top components have ~zero
    residual; a vector pointing off the subspace ranks first."""
    from etl_finance_pipeline_spark.operators.pca import pca_outliers

    rows = [
        (1, [2.0, 0.0, 0.0, 0.0]),
        (2, [-2.0, 0.0, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, -1.0, 0.0, 0.0]),
        (5, [0.0, 0.0, 3.0, 0.0]),  # off the top-2 subspace
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    comps = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    means = [0.0, 0.0, 0.6, 0.0]
    out = pca_outliers(df, comps, means, k=3).collect()
    assert out[0]["vec_id"] == 5
    assert out[0]["residual"] == pytest.approx((3.0 - 0.6) ** 2, abs=1e-6)
    # in-subspace vectors: residual is exactly the centered e3 energy
    assert all(r["residual"] == pytest.approx(0.36, abs=1e-6) for r in out[1:])
