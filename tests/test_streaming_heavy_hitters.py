"""Streaming heavy-hitter twin vs the batch answer: the emitted term set
after draining equals {term: total count >= T} on the same rows, for any
micro-batch chunking."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from substreams_sink_graph_load_spark.streaming.heavy_hitters import (
    streaming_heavy_hitters,
)

SF_DIR = "/root/testdata/sf0.001"


def _grams(spark):
    # the heavy_hitters_phrases fixture: boilerplate planted on every
    # 20th doc, exploded to word-3-gram occurrences
    from substreams_sink_graph_load_spark.functions.text import (
        exploded_shingles,
    )
    from substreams_sink_graph_load_spark.plans.queries import _BOILER_SQL

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.when(
            F.col("doc_id") % 20 == 0,
            F.concat(F.col("text"), F.lit(" " + _BOILER_SQL)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
        "doc_id",
    )
    return exploded_shingles(
        d, "doc_id", "text", k=3, short_doc_fallback=False
    ).select(F.col("gram").alias("term"))


@pytest.mark.parametrize(
    "n_files",
    [1, 3, pytest.param(5, marks=pytest.mark.slow)],
)
def test_streaming_equals_batch(spark, tmp_path, n_files):
    grams = _grams(spark)
    threshold = 20
    truth = {
        r["term"]
        for r in grams.groupBy("term")
        .count()
        .where(F.col("count") >= threshold)
        .collect()
    }
    assert len(truth) >= 7  # the 7 boilerplate grams + any natural ones

    src = tmp_path / "src"
    grams.repartition(n_files).write.parquet(str(src))
    stream = (
        spark.readStream.schema("term string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = tmp_path / "out"
    q = (
        streaming_heavy_hitters(stream, "term", threshold)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(str(out)).toPandas()
    # emit-once: no term appears twice
    assert got["term"].is_unique
    assert set(got["term"]) == truth
    # the stamped count is trigger-resolution: >= T, <= final total
    totals = {
        r["term"]: r["count"]
        for r in grams.groupBy("term").count().collect()
    }
    for _, row in got.iterrows():
        assert threshold <= row["cum_count"] <= totals[row["term"]]


@pytest.mark.slow
def test_ttl_mode_matches_exact_within_horizon(spark, tmp_path):
    # TTL far beyond the run: burst mode must equal the plain mode (no
    # premature eviction) while exercising the ProcessingTimeTimeout
    # state path — the streaming-dedup TTL test discipline
    grams = _grams(spark)
    threshold = 20
    truth = {
        r["term"]
        for r in grams.groupBy("term")
        .count()
        .where(F.col("count") >= threshold)
        .collect()
    }
    src = tmp_path / "src"
    grams.repartition(3).write.parquet(str(src))
    stream = (
        spark.readStream.schema("term string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = tmp_path / "out"
    q = (
        streaming_heavy_hitters(stream, "term", threshold, idle_ttl_minutes=60)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(str(out)).toPandas()
    assert got["term"].is_unique
    assert set(got["term"]) == truth


def test_threshold_guard(spark):
    with pytest.raises(ValueError, match="threshold"):
        streaming_heavy_hitters(_grams(spark), "term", 0)
