"""K-means over embedding columns (training-data pipeline surface).

The 100 TB shape: centroids are a K x dim float block that BROADCASTS
(kilobytes); assignment is embarrassingly parallel per Arrow batch (one
numpy distance matrix per batch, no shuffle); a fit iteration reduces
per-partition partial sums — K x dim per task — to the driver, which is the
classic Lloyd's-on-a-cluster decomposition (mergeable partials, same
monoid trick as the POI fold).  No reference counterpart (the reference
has no ML surface); this extends SURVEY §2.12.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dist2(block: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Squared L2 distances, (n, K), computed in float64 as the explicit
    sum over (x_i - c_i)^2 — the same association an element-wise SQL
    oracle uses, so argmin agrees across engines to the last ulp for any
    non-degenerate centroid separation."""
    return (
        (block[:, None, :].astype(np.float64) - centroids[None, :, :]) ** 2
    ).sum(axis=2)


def kmeans_assign(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (squared L2, ties to the
    lowest cluster id — np.argmin picks the first minimum).

    Returns (id_col, cluster int).  Centroids ride the closure (broadcast
    by value — K x dim floats are kilobytes); each Arrow batch computes one
    vectorized distance matrix, so the scan is the only data movement.
    """
    cents = np.asarray(centroids, dtype=np.float64)

    def assign(batches):
        import pyarrow as pa

        from .ann import vec_block

        for batch in batches:
            if not batch.num_rows:
                continue
            block = vec_block(batch.column(1))
            cluster = np.argmin(_dist2(block, cents), axis=1).astype(np.int32)
            yield pa.record_batch(
                [batch.column(0).cast(pa.int64()), pa.array(cluster)],
                names=[id_col, "cluster"],
            )

    return df.select(id_col, vec_col).mapInArrow(
        assign, f"{id_col} long, cluster int"
    )


def kmeans_fit(
    df: DataFrame,
    k: int,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Lloyd's iterations: centroids seeded from the k lowest ``id_col``
    vectors (deterministic — no RNG, reproducible across runs/engines),
    then ``iters`` rounds of assign + mean.

    Each round is ONE Spark job: mapInPandas emits per-partition partial
    (cluster, count, sum-vector) rows — at most K rows x dim doubles per
    task — and the driver folds the partials and recomputes means.  Data
    never shuffles; only K x dim aggregates cross the wire (the same
    partial-aggregation shape a built-in avg uses).  Empty clusters keep
    their previous centroid (the standard convention).
    """
    seed_rows = (
        df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    )
    cents = np.array([r[vec_col] for r in seed_rows], dtype=np.float64)

    # every Lloyd round re-reads this frame; persist once so iterations
    # hit cached partitions instead of re-scanning parquet each time.
    # Fan out a narrower-than-cluster scan first (r12): a one-row-group
    # parquet otherwise runs every round's partials on a single task.
    from .ann import fan_out_narrow

    # size-gated like pq_fit (r12, measured post-Arrow-conversion: with
    # the row-wise pandas cost gone, the exchange no longer pays for
    # sub-MB inputs)
    data = fan_out_narrow(
        df.select(id_col, vec_col), min_bytes=2 << 20
    ).persist()
    try:
        cents = _lloyd_rounds(data, cents, iters, vec_col)
    finally:
        data.unpersist()
    return cents


def _lloyd_rounds(
    data: DataFrame, cents: np.ndarray, iters: int, vec_col: str
) -> np.ndarray:
    for _ in range(iters):
        cur = cents

        def partials(batches):
            import pyarrow as pa

            from .ann import list_array, vec_block

            acc_n = np.zeros(len(cur), dtype=np.int64)
            acc_s = np.zeros_like(cur)
            seen = False
            for batch in batches:
                if not batch.num_rows:
                    continue
                seen = True
                block = vec_block(batch.column(1)).astype(
                    np.float64, copy=False
                )
                a = np.argmin(_dist2(block, cur), axis=1)
                acc_n += np.bincount(a, minlength=len(cur))
                for c in np.unique(a):
                    acc_s[c] += block[a == c].sum(axis=0)
            if seen:
                yield pa.record_batch(
                    [
                        pa.array(np.arange(len(cur), dtype=np.int32)),
                        pa.array(acc_n),
                        list_array(acc_s),
                    ],
                    names=["cluster", "n", "vsum"],
                )

        rows = data.mapInArrow(
            partials, "cluster int, n long, vsum array<double>"
        ).collect()
        n = np.zeros(len(cents), dtype=np.int64)
        s = np.zeros_like(cents)
        for r in rows:
            n[r["cluster"]] += r["n"]
            s[r["cluster"]] += np.asarray(r["vsum"])
        nz = n > 0
        cents = cents.copy()
        cents[nz] = s[nz] / n[nz, None]
    return cents


def kmeans_sse(
    df: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> float:
    """Total within-assignment SSE against a FIXED centroid set: every
    point contributes its squared L2 distance to the nearest centroid.

    Same decomposition as a fit round — one scan, per-partition scalar
    partials (a single double per task), folded by a built-in sum.  This
    is the k-means objective; used by the registry's fit-contract oracle
    (Lloyd monotonicity: fitted SSE <= init SSE and <= the k=1 SSE about
    the global mean, both theorems independent of the data vintage)."""
    cents = np.asarray(centroids, dtype=np.float64)

    def partials(batches):
        import pyarrow as pa

        from .ann import vec_block

        s = 0.0
        seen = False
        for batch in batches:
            if not batch.num_rows:
                continue
            seen = True
            block = vec_block(batch.column(0)).astype(np.float64, copy=False)
            s += float(_dist2(block, cents).min(axis=1).sum())
        if seen:
            yield pa.record_batch([pa.array([s])], names=["sse"])

    # no fan-out here (r12): a SINGLE streaming pass over a narrow scan
    # loses more to the round-robin exchange + extra Arrow workers than
    # the parallelism returns — fan_out_narrow pays only where the
    # fanned frame is persisted and re-read per Lloyd round (kmeans_fit)
    part = df.select(vec_col).mapInArrow(partials, "sse double")
    row = part.agg(F.sum("sse").alias("sse")).collect()[0]
    return float(row["sse"] or 0.0)
