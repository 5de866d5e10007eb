"""Exact fixed-point second-moment (Gram / covariance) aggregation.

The covariance of an embedding column is the canonical "tiny result,
huge input" statistic a training pipeline needs before whitening, PCA,
or drift monitoring.  The distributed shape that survives 100 TB is the
classic mergeable partial aggregate: each partition computes its own
(d+1)x(d+1) Gram matrix of the quantized vectors (one BLAS-style
``X^T @ X`` per Arrow batch, with a constant 1-column appended so the
first moments and the row count fall out of the same product), emits the
upper triangle as (i, j, partial_sum) cells, and one tiny shuffle of
``d*(d+1)/2 * n_partitions`` cells reduces them.  No data-scaled shuffle
ever happens: the corpus is read once, partition-locally.

Determinism (the registry's hash-oracle contract) comes from fixed-point
quantization: every float32 coordinate is mapped to
``floor(x * 2^20 + 0.5)`` as int64 — exact in IEEE double for |x| < 2^31
— and all sums are int64, so the result is independent of partitioning,
batch order, and merge order.  With |x| < 1 (the embedding fixtures are
L2-bounded) a product is < 2^40 and the cell sum stays inside int64 up
to ~2^23 rows per cell — and the final cells are exact integers the
driver can hash.  Covariance in doubles is then derived from those exact
integers by a fixed expression (one cast each + divide/multiply/
subtract), which IEEE-754 evaluates identically on the JVM and in the
DuckDB oracle.

Reference parity note: the reference sink (streamingfast
substreams-sink-graph-load) has no analytics surface; this operator
belongs to the engine-contract family (SURVEY §2.12) alongside the ANN
and clustering tiers that consume it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point scale: floor(x * 2^20 + 0.5); exact for float32 inputs.
FIXED_POINT_SCALE = 1 << 20


def quantize_fixed_point(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Project ``vec_col`` (array<float>) to an exact int64 fixed-point
    array — a pure JVM codegen projection (no Python)."""
    return df.select(
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * float(FIXED_POINT_SCALE) + 0.5).cast(
                "long"
            ),
        ).alias("q")
    )


def _gram_batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    """Per-partition partial Gram cells.

    For each Arrow batch of quantized vectors, compute the int64
    ``X1^T @ X1`` where X1 is the batch matrix with a constant 1 column
    appended (so cell (i, d) is the first moment of coordinate i and
    cell (d, d) is the row count), and emit the upper triangle as
    (i, j, s) rows.  numpy int64 matmul is exact; overflow cannot occur
    for |q| < 2^20 and batch sizes < 2^23.
    """
    import numpy as np

    for batch in it:
        if batch.num_rows == 0:
            continue
        col = batch.column(0)
        if isinstance(col, pa.ChunkedArray):  # pragma: no cover - defensive
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch.num_rows
        d = flat.size // n
        x = flat.reshape(n, d)
        x1 = np.concatenate([x, np.ones((n, 1), dtype=np.int64)], axis=1)
        g = x1.T @ x1
        iu, ju = np.triu_indices(d + 1)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(iu.astype(np.int32)),
                pa.array(ju.astype(np.int32)),
                pa.array(g[iu, ju]),
            ],
            names=["i", "j", "s"],
        )


def gram_cells(quantized: DataFrame) -> DataFrame:
    """Reduce the partial Gram cells: one shuffle of
    ``(d+1)(d+2)/2 * n_partitions`` rows, partial-aggregated map-side.

    Returns (i, j, s_ij) with i <= j over the AUGMENTED index range
    [0, d]: cell (i, d) is the first moment of coordinate i, cell
    (d, d) the row count.
    """
    partials = quantized.mapInArrow(_gram_batches, schema="i int, j int, s bigint")
    return partials.groupBy("i", "j").agg(F.sum("s").cast("long").alias("s_ij"))


def covariance(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Exact-integer upper-triangle covariance of an embedding column.

    Output: (i, j, s_ij, cov) for 0 <= i <= j < d, where s_ij is the
    exact int64 fixed-point second moment and cov the double covariance
    of the QUANTIZED coordinates, derived from exact integers by a fixed
    IEEE expression (deterministic across engines).

    The two broadcast joins attach the 1-row count and the d-row moment
    table to the d(d+1)/2 cells — constant-size at any corpus scale.
    """
    from pyspark import StorageLevel

    cells = gram_cells(quantize_fixed_point(df, vec_col))
    # d(d+1)/2 + d + 1 rows total — persist so the four consumers below
    # (aug, moments, count, final triangle) cannot re-run the corpus
    # scan + Gram fold per consumer (the dsir_importance lesson, caught
    # by plan_audit in r7).
    cells = cells.persist(StorageLevel.MEMORY_AND_DISK)
    # The augmented index d is the max index present (d = dim of the
    # vectors); derive it in-plan so no collect is needed.
    aug = cells.agg(F.max("j").alias("aug"))
    cells = cells.crossJoin(F.broadcast(aug))
    mom = cells.where(F.col("j") == F.col("aug")).select(
        F.col("i").alias("k"), F.col("s_ij").alias("s_k")
    )
    n_row = cells.where(
        (F.col("i") == F.col("aug")) & (F.col("j") == F.col("aug"))
    ).select(F.col("s_ij").alias("n"))
    mi = mom.withColumnRenamed("k", "mi_k").withColumnRenamed("s_k", "s_i")
    mj = mom.withColumnRenamed("k", "mj_k").withColumnRenamed("s_k", "s_j")
    out = (
        cells.where((F.col("i") < F.col("aug")) & (F.col("j") < F.col("aug")))
        .join(F.broadcast(mi), F.col("i") == F.col("mi_k"))
        .join(F.broadcast(mj), F.col("j") == F.col("mj_k"))
        .crossJoin(F.broadcast(n_row))
    )
    n_d = F.col("n").cast("double")
    cov = (
        F.col("s_ij").cast("double")
        - F.col("s_i").cast("double") * F.col("s_j").cast("double") / n_d
    ) / n_d
    return out.select("i", "j", "s_ij", cov.alias("cov"))
