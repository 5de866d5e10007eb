"""K-means operator semantics vs a sequential numpy reference."""

from __future__ import annotations

import numpy as np
import pytest

from substreams_sink_graph_load_spark.operators.cluster import (
    kmeans_assign,
    kmeans_fit,
    kmeans_sse,
)


def _ref_lloyd(vecs: np.ndarray, k: int, iters: int) -> np.ndarray:
    v64 = vecs.astype(np.float64)
    cents = v64[:k].copy()
    for _ in range(iters):
        d2 = ((v64[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        for c in range(k):
            if (a == c).any():
                cents[c] = v64[a == c].mean(axis=0)
    return cents


@pytest.fixture(scope="module")
def vecs():
    rng = np.random.RandomState(7)
    centers = rng.randn(3, 4) * 5
    pts = np.vstack([centers[i % 3] + rng.randn(4) * 0.1 for i in range(60)])
    return pts.astype(np.float32)


@pytest.fixture(scope="module")
def df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    ).repartition(5)


def test_fit_matches_sequential_reference(spark, df, vecs):
    """Distributed partial-sum Lloyd's == the sequential fold, exactly:
    per-cluster sums are float64 adds of the same values, and the
    deterministic lowest-id seed removes RNG from the equation."""
    got = kmeans_fit(df, 3, iters=4)
    want = _ref_lloyd(vecs, 3, 4)
    assert np.allclose(got, want, rtol=0, atol=1e-9)


def test_assign_nearest_and_tiebreak(spark):
    d = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 1.0]), (2, [0.5, 0.5]), (3, [0.9, 0.9])],
        "vec_id long, embedding array<float>",
    )
    cents = np.array([[0.0, 0.0], [1.0, 1.0]])
    got = {r["vec_id"]: r["cluster"] for r in kmeans_assign(d, cents).collect()}
    # vec 2 is EXACTLY equidistant -> lowest cluster id wins (argmin-first)
    assert got == {0: 0, 1: 1, 2: 0, 3: 1}


def test_fit_empty_cluster_keeps_centroid(spark):
    d = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [0.1, 0.0]), (2, [100.0, 100.0])],
        "vec_id long, embedding array<float>",
    )
    # seed 3 centroids from the 3 points; all mass collapses toward two of
    # them after one step, the never-assigned centroid must stay put
    cents = kmeans_fit(d, 3, iters=2)
    assert cents.shape == (3, 2)
    assert np.isfinite(cents).all()

def test_sse_matches_numpy_and_lloyd_contract(spark, df, vecs):
    """kmeans_sse == the sequential objective, and the two fit-contract
    theorems the registry oracle pins (monotonicity vs the seed; bounded
    by the k=1 SSE about the global mean) hold on real data."""
    v64 = vecs.astype(np.float64)

    def ref_sse(cents):
        d2 = ((v64[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return d2.min(axis=1).sum()

    seed = v64[:3].copy()
    fit = kmeans_fit(df, 3, iters=4)
    got_fit, got_seed = kmeans_sse(df, fit), kmeans_sse(df, seed)
    assert got_fit == pytest.approx(ref_sse(fit), rel=1e-12)
    assert got_seed == pytest.approx(ref_sse(seed), rel=1e-12)
    # Lloyd monotonicity: final SSE <= init SSE
    assert got_fit <= got_seed
    # partition-refinement bound: final SSE <= k=1 SSE about the mean
    sse_one = ((v64 - v64.mean(axis=0)) ** 2).sum()
    assert got_fit <= sse_one
