"""K-means clustering (`operators/cluster.py`)."""

import numpy as np
from pyspark.sql import functions as F

from graph4code_spark.operators.cluster import kmeans_fit
from graph4code_spark.operators.similarity import ivf_centroids


def _py_kmeans(X, k, iters, seed, dim):
    cents = np.round(ivf_centroids(dim, k, seed), 6)

    def assign(C):
        # same key as the engines: round(||c||^2 - 2 x.c, 6), tie -> low id
        keys = np.round(
            (C * C).sum(axis=1)[None, :] - 2 * X @ C.T, 6
        )
        return keys.argmin(axis=1), keys.min(axis=1)

    a, d = assign(cents)
    for _ in range(iters - 1):
        C = cents.copy()
        for c in range(k):
            if (a == c).any():
                C[c] = np.round(X[a == c].mean(axis=0), 6)
        cents = C
        a, d = assign(cents)
    return a, d


def test_kmeans_matches_numpy_reference(spark):
    rng = np.random.RandomState(3)
    X = rng.randn(120, 8)
    df = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(120)], "id long, v array<double>"
    )
    assigned, cents = kmeans_fit(df, "id", "v", k=3, iters=3, seed=5, dim=8)
    got = {r["id"]: (r["cluster"], r["dist"]) for r in assigned.collect()}
    a, d = _py_kmeans(X, 3, 3, 5, 8)
    for i in range(120):
        assert got[i][0] == a[i], i
        assert abs(got[i][1] - d[i]) < 1e-9
    assert len(cents) == 3 and all(len(c) == 8 for c in cents)


def test_kmeans_iterations_do_not_increase_inertia(spark):
    rng = np.random.RandomState(4)
    X = rng.randn(200, 8)
    df = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(200)], "id long, v array<double>"
    )
    inertias = []
    for iters in (1, 2, 3):
        assigned, _ = kmeans_fit(df, "id", "v", k=4, iters=iters, seed=5, dim=8)
        # dist = ||c||^2 - 2 x.c differs from true inertia by sum ||x||^2,
        # a constant — monotonicity is preserved
        inertias.append(assigned.agg(F.sum("dist")).first()[0])
    assert inertias[1] <= inertias[0] + 1e-6
    assert inertias[2] <= inertias[1] + 1e-6


def test_kmeans_assignment_is_map_side(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "id long, v array<double>"
    )
    assigned, _ = kmeans_fit(df, "id", "v", k=2, iters=1, seed=5, dim=2)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
