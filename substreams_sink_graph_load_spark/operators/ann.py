"""Approximate/exact nearest-neighbor search over embedding columns.

Three tiers (SURVEY §2.12):

1. ``similarity_topk`` (plans/queries.py) — brute force as broadcast
   crossJoin + JVM fold dot product.  Exact, oracle-checkable, but the
   per-pair lambda fold is the scan bottleneck at scale.
2. ``ann_ivf_topk`` (plans/queries.py) — IVF cells, nprobe=1; prunes the
   scored set, still JVM-fold scoring.
3. ``topk_matmul`` (here) — the 100 TB shape: Arrow batches → numpy
   ``corpus_batch @ queries.T`` (one BLAS call per batch) → per-batch
   partial top-k (k rows per query per batch) → one small global
   window top-k.  Shuffle volume is O(#batches · k · #queries), never
   O(|corpus| · #queries).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_PARTIAL_SCHEMA = StructType(
    [
        StructField("q_id", LongType()),
        StructField("neighbor_id", LongType()),
        StructField("dot", DoubleType()),
    ]
)


def topk_matmul(
    corpus: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact dot-product top-k via batched matmul + partial top-k merge.

    ``queries`` is a driver-side list (the query set is small by contract —
    it broadcasts inside the Arrow batches closure).  Returns
    (q_id, neighbor_id, rank) with rank 1..k by (dot desc, neighbor_id).
    """
    if not queries:
        raise ValueError("queries must be non-empty")
    q_ids = np.array([q[0] for q in queries], dtype=np.int64)
    q_mat = np.array([q[1] for q in queries], dtype=np.float64)  # Q x D

    def partial(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.stack(pdf[emb_col].to_numpy()).astype(np.float64)  # B x D
            scores = mat @ q_mat.T  # B x Q, one BLAS call
            # self-matches excluded like the brute-force baseline
            for qi in range(len(q_ids)):
                col = scores[:, qi]
                mask = ids != q_ids[qi]
                cand_ids, cand = ids[mask], col[mask]
                if len(cand) > k:
                    # argpartition: O(B) partial select, then exact order
                    top = np.argpartition(-cand, k)[:k]
                else:
                    top = np.arange(len(cand))
                yield pd.DataFrame(
                    {
                        "q_id": q_ids[qi],
                        "neighbor_id": cand_ids[top],
                        "dot": cand[top],
                    }
                )

    partials = corpus.select(id_col, emb_col).mapInPandas(partial, _PARTIAL_SCHEMA)
    w = Window.partitionBy("q_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "rank")
    )


def sample_queries(
    df: DataFrame,
    modulus: int = 100,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """The deterministic query sample used by the top-k queries
    (vec_id % modulus == 0), collected driver-side (tiny by contract)."""
    rows = (
        df.where(F.col(id_col) % modulus == 0)
        .select(id_col, F.col(emb_col).cast("array<double>"))
        .collect()
    )
    return [(r[0], list(r[1])) for r in rows]
