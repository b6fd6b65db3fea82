"""PCA over embedding columns: Gram-identity exactness, orthonormal
components, variance ordering, reconstruction monotonicity, whitening."""

import numpy as np
from pyspark.sql import functions as F

from moc_indexer_spark.operators.ml import _gram_and_mean, pca_model, pca_project
from moc_indexer_spark.tables import table


def _local(emb):
    rows = emb.orderBy("vec_id").collect()
    ids = [r.vec_id for r in rows]
    return ids, np.array([list(r.embedding) for r in rows], dtype=np.float64)


def test_gram_and_mean_match_numpy(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings").limit(150)
    _, X = _local(emb)
    n, mu, G = _gram_and_mean(emb, "vec_id", "embedding")
    assert n == len(X)
    assert np.allclose(mu, X.mean(axis=0), atol=1e-9)
    assert np.allclose(G, X.T @ X, rtol=1e-12)


def test_pca_model_properties(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    mu, W, eigvals, ratios = pca_model(emb, n_components=8)
    # orthonormal rows
    assert np.allclose(W @ W.T, np.eye(8), atol=1e-9)
    # eigenvalues sorted descending and ratios consistent
    assert all(eigvals[i] >= eigvals[i + 1] for i in range(7))
    assert all(ratios[i] >= ratios[i + 1] for i in range(7))
    assert 0 < ratios.sum() <= 1.0 + 1e-12
    # determinism (sign convention): a second fit is identical
    mu2, W2, e2, r2 = pca_model(emb, n_components=8)
    assert np.array_equal(W, W2) and np.array_equal(mu, mu2)


def test_pca_projection_and_reconstruction(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings").limit(200)
    ids, X = _local(emb)
    Xc = X - X.mean(axis=0)
    total = (Xc ** 2).sum()

    prev_err = None
    for k in (4, 16, 64):
        mu, W, _, _ = pca_model(emb, n_components=k)
        proj = {r.vec_id: np.array(r.pca)
                for r in pca_project(emb, n_components=k).collect()}
        P = np.array([proj[i] for i in ids])
        # projection equals the local computation
        assert np.allclose(P, (X - mu) @ W.T, atol=1e-9)
        # reconstruction error shrinks monotonically with k
        err = ((Xc - P @ W) ** 2).sum()
        if prev_err is not None:
            assert err <= prev_err + 1e-9
        prev_err = err
    # k = full dim reconstructs (near-)exactly
    assert prev_err <= total * 1e-9


def test_pca_whitening_unit_variance(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    out = pca_project(emb, n_components=8, whiten=True).collect()
    P = np.array([list(r.pca) for r in out])
    var = P.var(axis=0, ddof=1)
    assert np.allclose(var, 1.0, atol=1e-6)


def test_pca_projection_is_map_only(spark, sf_dir):
    """The projection stage must be a pure scan — zero exchanges (the
    model is broadcast driver state)."""
    emb = table(spark, sf_dir, "embeddings")
    plan = (
        pca_project(emb, n_components=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_certified_gram_leg_bridges_to_production_partial(spark, sf_dir):
    """pca_gram_check (the oracle-certified O(n*d^2) explode leg) and
    _gram_and_mean (the production d^2-bounded BLAS partial) must agree
    on the same corpus: same count, same column sums, same Gram cells.
    The certified leg rounds each product at 9dp before the exact
    decimal sum, so agreement is to ~n*5e-10 absolute."""
    from moc_indexer_spark.plans.registry import registry

    by = {s.name: s for s in registry()}
    rows = by["pca_gram_check"].build(spark, sf_dir).collect()
    emb = table(spark, sf_dir, "embeddings")
    n, mu, G = _gram_and_mean(emb, "vec_id", "embedding")
    tol = n * 5e-10 + 1e-9
    for r in rows:
        if r.i == -1 and r.j == -1:
            assert r.val == n
        elif r.j == -1:
            assert abs(r.val - mu[r.i] * n) < max(tol, 1e-5)
        else:
            assert abs(r.val - G[r.i, r.j]) < max(tol, 1e-5)
