"""Streaming first-touch attribution vs the batch sessions_attribution
registry query: same rows, same fold, batch == streaming."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from substreams_sink_graph_load_spark.plans.queries import (
    sessions_attribution,
)
from substreams_sink_graph_load_spark.streaming.attribution import (
    attribution_table,
    streaming_attribution,
)

SF_DIR = "/root/testdata/sf0.001"

EV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


@pytest.fixture()
def event_chunks(spark, tmp_path):
    """The sf0.001 events table split into 4 micro-batch parquet files in
    global (ts, event_id) order — per-user order across triggers, the
    ordered-source contract."""
    import os
    import time

    rows = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy("ts", "event_id")
        .collect()
    )
    d = tmp_path / "events"
    d.mkdir()
    n = len(rows)
    cuts = [0, n // 4, n // 2, 3 * n // 4, n]
    now = time.time()
    for i in range(4):
        chunk = rows[cuts[i] : cuts[i + 1]]
        p = str(d / f"part-{i}.parquet")
        spark.createDataFrame(chunk, EV_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(p)
        for root, _dirs, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (now + i, now + i))
    return str(d)


def test_streaming_attribution_matches_batch(spark, event_chunks, tmp_path):
    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(event_chunks)
    )
    out = tmp_path / "out"
    q = (
        streaming_attribution(stream)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    purchases = spark.read.schema(
        "user_id long, first_touch string, value double, ts_us long, event_id long"
    ).parquet(str(out))
    got = {
        r["first_touch"]: (r["n_purchases"], r["revenue_cents"])
        for r in attribution_table(purchases).collect()
    }
    want = {
        r["first_touch"]: (r["n_purchases"], r["revenue_cents"])
        for r in sessions_attribution(spark, SF_DIR).collect()
    }
    assert got == want and sum(n for n, _ in want.values()) > 0


def test_streaming_attribution_session_boundaries(spark, tmp_path):
    """Hand-built edge cases in ONE trigger: purchase opening a session
    credits itself; a 30-min gap is NOT a new session but 30min+1us is;
    equal timestamps order by event_id."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    us = datetime.timedelta(microseconds=1)
    mins = lambda m: datetime.timedelta(minutes=m)
    rows = [
        # u1: view opens, purchase 29min later -> credited to view;
        # second purchase exactly 30min after that -> SAME session
        (1, t0, 1, "view", 0.0),
        (2, t0 + mins(29), 1, "purchase", 10.0),
        (3, t0 + mins(59), 1, "purchase", 5.0),
        # u2: purchase opens its own session (gap = 30min + 1us)
        (4, t0, 2, "click", 0.0),
        (5, t0 + mins(30) + us, 2, "purchase", 7.0),
        # u3: two events at the SAME microsecond — event_id orders them,
        # so the view (lower id) opens and the purchase credits it
        (6, t0, 3, "view", 0.0),
        (7, t0, 3, "purchase", 3.0),
    ]
    src = tmp_path / "ev"
    src.mkdir()
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "part-0.parquet"))
    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    out = tmp_path / "out"
    q = (
        streaming_attribution(stream)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    purchases = spark.read.schema(
        "user_id long, first_touch string, value double, ts_us long, event_id long"
    ).parquet(str(out))
    got = {
        r["first_touch"]: (r["n_purchases"], r["revenue_cents"])
        for r in attribution_table(purchases).collect()
    }
    assert got == {"view": (3, 1800), "purchase": (1, 700)}
