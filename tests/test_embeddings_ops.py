"""operators/embeddings.py: distributed Gram matrix + PCA fit/project.

The hash-exact Gram query is oracle-checked in test_queries_vs_oracle;
here we verify the NUMERICS against driver-side numpy ground truth —
the BLAS partial path, the eigendecomposition, and the JVM projection."""

from __future__ import annotations

import numpy as np
import pytest

from end_to_end_data_engineering_project_with_databricks_spark.operators.embeddings import (
    gram_matrix_exact,
    gram_partials,
    pca_components,
    project,
)
from end_to_end_data_engineering_project_with_databricks_spark.sources.readers import (
    load_table,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def X(emb):
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    return np.array([r["embedding"] for r in rows], dtype=np.float64)


def test_gram_exact_matches_numpy(emb, X):
    got = {
        (r["i"], r["j"]): r["gram"]
        for r in gram_matrix_exact(emb, "embedding").collect()
    }
    G = X.T @ X
    d = X.shape[1]
    assert len(got) == d * (d + 1) // 2
    for (i, j), v in got.items():
        # dsum quantizes each product at 1e-6: error <= 5e-7 * n_rows
        assert v == pytest.approx(G[i, j], abs=5e-7 * X.shape[0] + 1e-9)


def test_gram_partials_reduce_to_full_moments(emb, X):
    parts = gram_partials(emb, "embedding").collect()
    n = sum(r["n"] for r in parts)
    s = np.sum([r["s"] for r in parts], axis=0)
    g = np.sum([np.array(r["g"]).reshape(64, 64) for r in parts], axis=0)
    assert n == X.shape[0]
    np.testing.assert_allclose(s, X.sum(axis=0), rtol=1e-9)
    np.testing.assert_allclose(g, X.T @ X, rtol=1e-9)


def test_pca_components_match_numpy(emb, X):
    comps, vals = pca_components(emb, "embedding", k=4)
    assert comps.shape == (4, 64)
    # orthonormal rows
    np.testing.assert_allclose(comps @ comps.T, np.eye(4), atol=1e-8)
    # descending explained variance
    assert all(vals[i] >= vals[i + 1] - 1e-12 for i in range(3))
    # agreement with driver-side numpy PCA up to sign
    C = np.cov(X, rowvar=False, bias=True)
    ev, evec = np.linalg.eigh(C)
    top = evec[:, np.argsort(ev)[::-1][:4]].T
    for i in range(4):
        cos = abs(float(comps[i] @ top[i]))
        assert cos == pytest.approx(1.0, abs=1e-6)
    np.testing.assert_allclose(vals, np.sort(ev)[::-1][:4], rtol=1e-9)


def test_project_matches_numpy(emb, X):
    comps, _ = pca_components(emb, "embedding", k=2)
    out = (
        project(emb.select("vec_id", "embedding"), comps)
        .orderBy("vec_id")
        .collect()
    )
    want = X @ comps.T
    got = np.array([[r["pc0"], r["pc1"]] for r in out])
    # JVM fold is sequential double math; numpy pairwise — tiny drift only
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_pca_quality_checks_are_not_vacuous(spark, sf_dir):
    """A broken basis must flip the booleans: scaling one component
    breaks orthonormality (pythagoras), and projecting onto the 4
    LOWEST-variance coordinate axes must under-explain (rayleigh)."""
    import numpy as np

    from end_to_end_data_engineering_project_with_databricks_spark.operators.embeddings import (
        pca_fit,
        pca_quality_checks,
    )
    from end_to_end_data_engineering_project_with_databricks_spark.sources.readers import (
        load_table,
    )

    e = load_table(spark, sf_dir, "embeddings")
    comps, _vals, mean, dim_vars = pca_fit(e, "embedding", k=4)
    top_dim_var = float(np.sort(dim_vars)[::-1][:4].sum())

    # correct fit: both green
    row = pca_quality_checks(e, comps, mean, top_dim_var).collect()[0]
    assert row.pythagoras_ok and row.rayleigh_ok

    # scaled component -> non-orthonormal basis -> pythagoras red
    bad = comps.copy()
    bad[0] = bad[0] * 1.01
    row = pca_quality_checks(e, bad, mean, top_dim_var).collect()[0]
    assert not row.pythagoras_ok

    # worst coordinate projection -> orthonormal (pythagoras green) but
    # must fail the variance bound
    worst = np.argsort(dim_vars)[:4]
    axes = np.zeros_like(comps)
    for i, j in enumerate(worst):
        axes[i, j] = 1.0
    row = pca_quality_checks(e, axes, mean, top_dim_var).collect()[0]
    assert row.pythagoras_ok and not row.rayleigh_ok
