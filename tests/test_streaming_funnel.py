"""Streaming funnel state machine vs the batch events_funnel fold."""

import json
import os
import time

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from substreams_sink_graph_load_spark.streaming.funnel import (
    funnel_counts,
    streaming_funnel,
)

EV_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _ts(s: str):
    import datetime

    return datetime.datetime.fromisoformat(s)


# u1 full funnel; u2 clicks before viewing (click must NOT count);
# u3 view+click, purchase exactly AT click ts (strict > rejects);
# u4 purchase without click; u5 two views (second ignored) then click
EVENTS = [
    (1, "view", "2024-01-01T00:00"),
    (1, "click", "2024-01-01T01:00"),
    (1, "purchase", "2024-01-01T02:00"),
    (2, "click", "2024-01-01T00:30"),
    (2, "view", "2024-01-01T01:30"),
    (3, "view", "2024-01-01T00:00"),
    (3, "click", "2024-01-01T00:10"),
    (3, "purchase", "2024-01-01T00:10"),
    (4, "view", "2024-01-01T00:00"),
    (4, "purchase", "2024-01-01T03:00"),
    (5, "view", "2024-01-01T00:00"),
    (5, "view", "2024-01-01T00:05"),
    (5, "click", "2024-01-01T00:20"),
]


def batch_stage_sets(spark):
    """The batch events_funnel fold (plans/queries.py) on the same rows:
    per-stage user sets instead of counts, for a sharper comparison."""
    e = spark.createDataFrame(
        [(u, t, _ts(ts)) for u, t, ts in EVENTS], EV_SCHEMA
    )
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tv"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("tv"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tc"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("tc"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    return (
        {r["user_id"] for r in v.collect()},
        {r["user_id"] for r in c.collect()},
        {r["user_id"] for r in p.collect()},
    )


@pytest.fixture()
def event_files(tmp_path):
    """Events split into 3 micro-batch files, each user's events in
    event-time order across files (the ordered-source contract)."""
    ordered = sorted(EVENTS, key=lambda e: e[2])
    chunks = [ordered[:5], ordered[5:9], ordered[9:]]
    d = tmp_path / "events"
    d.mkdir()
    now = time.time()
    for i, chunk in enumerate(chunks):
        p = d / f"part-{i}.jsonl"
        with open(p, "w") as fh:
            for u, t, ts in chunk:
                fh.write(
                    json.dumps({"user_id": u, "event_type": t, "ts": ts})
                    + "\n"
                )
        os.utime(p, (now + i, now + i))
    return str(d)


def test_streaming_funnel_matches_batch(spark, event_files, tmp_path):
    stream = (
        spark.readStream.format("json")
        .schema(
            T.StructType(
                [
                    T.StructField("user_id", T.LongType()),
                    T.StructField("event_type", T.StringType()),
                    T.StructField("ts", T.StringType()),
                ]
            )
        )
        .option("maxFilesPerTrigger", 1)
        .load(event_files)
    )
    q = (
        streaming_funnel(stream.withColumn("ts", F.to_timestamp("ts")))
        .writeStream.format("memory")
        .queryName("funnel_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from funnel_out").collect()

    got = {
        stage: {r["user_id"] for r in rows if r["stage"] == stage}
        for stage in ("view", "click", "purchase")
    }
    bv, bc, bp = batch_stage_sets(spark)
    assert got["view"] == bv == {1, 2, 3, 4, 5}
    assert got["click"] == bc == {1, 3, 5}  # u2's early click rejected
    assert got["purchase"] == bp == {1}  # u3 tie rejected, u4 no click

    # each user emits each stage at most once across all triggers
    assert len(rows) == sum(len(s) for s in got.values())

    counts = {
        r["stage"]: r["users"]
        for r in funnel_counts(
            spark.sql("select * from funnel_out")
        ).collect()
    }
    assert counts == {"view": 5, "click": 3, "purchase": 1}


def test_streaming_funnel_state_survives_restart(spark, tmp_path):
    """Stop after the first file, add the rest, restart on the SAME
    checkpoint: per-user state resumes (no stage re-emission, no lost
    transitions) — the T5 resume contract for the funnel operator."""
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("ts", T.StringType()),
        ]
    )
    d = tmp_path / "events"
    d.mkdir()
    ordered = sorted(EVENTS, key=lambda e: e[2])
    now = time.time()

    def write_chunk(i, chunk):
        p = d / f"part-{i}.jsonl"
        with open(p, "w") as fh:
            for u, t, ts in chunk:
                fh.write(
                    json.dumps({"user_id": u, "event_type": t, "ts": ts}) + "\n"
                )
        os.utime(p, (now + i, now + i))

    out = str(tmp_path / "transitions")

    def run_once():
        stream = (
            spark.readStream.format("json")
            .schema(schema)
            .option("maxFilesPerTrigger", 1)
            .load(str(d))
        )
        q = (
            streaming_funnel(stream.withColumn("ts", F.to_timestamp("ts")))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write_chunk(0, ordered[:5])
    run_once()
    write_chunk(1, ordered[5:])
    run_once()

    all_rows = spark.read.parquet(out).collect()
    # no (user, stage) pair may appear twice across the two runs
    pairs = [(r["user_id"], r["stage"]) for r in all_rows]
    assert len(pairs) == len(set(pairs))
    got = {
        stage: {u for u, s in pairs if s == stage}
        for stage in ("view", "click", "purchase")
    }
    bv, bc, bp = batch_stage_sets(spark)
    assert (got["view"], got["click"], got["purchase"]) == (bv, bc, bp)
