"""Streaming first-seen exact dedup vs its batch twin."""

import json
import os
import time

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from substreams_sink_graph_load_spark.streaming.dedup import (
    streaming_exact_dedup,
)

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

BATCH1 = [(1, "alpha text"), (2, "alpha text"), (3, "beta text")]
BATCH2 = [(4, "alpha text"), (5, "gamma text"), (6, "beta text")]


@pytest.fixture()
def doc_files(tmp_path):
    d = tmp_path / "docs"
    d.mkdir()
    now = time.time()
    for i, chunk in enumerate([BATCH1, BATCH2]):
        p = d / f"part-{i}.jsonl"
        with open(p, "w") as fh:
            for doc_id, text in chunk:
                fh.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        os.utime(p, (now + i, now + i))
    return str(d)


def test_streaming_dedup_first_seen(spark, doc_files, tmp_path):
    stream = (
        spark.readStream.format("json")
        .schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(doc_files)
    )
    q = (
        streaming_exact_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["content_hash"])
        for r in spark.sql("select * from dedup_out").collect()
    }
    # keepers: 1 (alpha, min of trigger 1), 3 (beta); 5 (gamma, new in
    # trigger 2); 4 and 6 are cross-trigger duplicates and never emit
    assert {d for d, _ in got} == {1, 3, 5}

    # batch twin on the full data agrees (min doc_id per content hash)
    all_docs = spark.createDataFrame(BATCH1 + BATCH2, DOCS_SCHEMA)
    want = {
        (r["doc_id"], r["content_hash"])
        for r in all_docs.groupBy(F.md5("text").alias("content_hash"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "content_hash")
        .collect()
    }
    assert got == want


@pytest.mark.slow
def test_streaming_dedup_with_ttl_same_within_horizon(spark, doc_files, tmp_path):
    """With a TTL far beyond the run, output matches the exact mode (no
    premature eviction); the state store runs the ProcessingTimeTimeout
    path end-to-end."""
    stream = (
        spark.readStream.format("json")
        .schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(doc_files)
    )
    q = (
        streaming_exact_dedup(stream, state_ttl_minutes=60)
        .writeStream.format("memory")
        .queryName("dedup_ttl_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_ttl"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]
        for r in spark.sql("select * from dedup_ttl_out").collect()
    }
    assert got == {1, 3, 5}
