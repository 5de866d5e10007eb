"""transformWithStateInPandas twins beyond SCD-2: first-seen dedup on
ValueState (exact + native-TTL config), per-user event-type counts on
MapState, and per-user last-K recent items on ListState — each checked
against its batch twin.  Together they widen the protoshim's live JVM
differential to the TTLConfig, MapStateCall, and ListStateCall
encodings (ValueState-only SCD-2 never sends them)."""

from __future__ import annotations

import json
import os
import time

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from substreams_sink_graph_load_spark.streaming.counts import (
    streaming_event_counts_tws,
)
from substreams_sink_graph_load_spark.streaming.dedup import (
    streaming_exact_dedup_tws,
)
from substreams_sink_graph_load_spark.streaming.stateful import (
    ROCKSDB_PROVIDER,
    tws_available,
)

pytestmark = pytest.mark.skipif(
    "not __import__('substreams_sink_graph_load_spark.streaming.stateful', fromlist=['x']).tws_available()",
    reason="transformWithStateInPandas needs a google.protobuf runtime",
)

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

BATCH1 = [(1, "alpha text"), (2, "alpha text"), (3, "beta text")]
BATCH2 = [(4, "alpha text"), (5, "gamma text"), (6, "beta text")]

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
    ]
)

EV_BATCH1 = [(1, "view"), (1, "view"), (1, "click"), (2, "view")]
EV_BATCH2 = [(1, "view"), (2, "buy"), (2, "view"), (3, "click")]


def _write_jsonl(tmp_path, name, batches, cols):
    d = tmp_path / name
    d.mkdir()
    now = time.time()
    for i, chunk in enumerate(batches):
        p = d / f"part-{i}.jsonl"
        with open(p, "w") as fh:
            for row in chunk:
                fh.write(json.dumps(dict(zip(cols, row))) + "\n")
        os.utime(p, (now + i, now + i))
    return str(d)


def _run(spark, df, ckpt, name):
    key = "spark.sql.streaming.stateStore.providerClass"
    prior = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)
    return spark.sql(f"select * from {name}").collect()


@pytest.mark.parametrize(
    "ttl_minutes",
    [None, pytest.param(60, marks=pytest.mark.slow)],
)
def test_tws_dedup_matches_batch(spark, tmp_path, ttl_minutes):
    src = _write_jsonl(tmp_path, "docs", [BATCH1, BATCH2],
                       ["doc_id", "text"])
    stream = (
        spark.readStream.format("json")
        .schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    rows = _run(
        spark,
        streaming_exact_dedup_tws(stream, state_ttl_minutes=ttl_minutes),
        str(tmp_path / f"ckpt_{ttl_minutes}"),
        f"tws_dedup_{ttl_minutes}",
    )
    got = {(r["doc_id"], r["content_hash"]) for r in rows}
    all_docs = spark.createDataFrame(BATCH1 + BATCH2, DOCS_SCHEMA)
    want = {
        (r["doc_id"], r["content_hash"])
        for r in all_docs.groupBy(F.md5("text").alias("content_hash"))
        .agg(F.min("doc_id").alias("doc_id"))
        .collect()
    }
    # a 60-minute TTL cannot expire inside the run: identical output —
    # but the query DID ship the TTLConfig encoding to the JVM
    assert got == want
    assert {d for d, _ in got} == {1, 3, 5}


@pytest.mark.slow
def test_tws_map_counts_match_batch_groupby(spark, tmp_path):
    src = _write_jsonl(tmp_path, "events", [EV_BATCH1, EV_BATCH2],
                       ["user_id", "event_type"])
    stream = (
        spark.readStream.format("json")
        .schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    rows = _run(
        spark,
        streaming_event_counts_tws(stream),
        str(tmp_path / "ckpt_counts"),
        "tws_counts",
    )
    # counts are monotone: the max emitted per key is the final total
    final: dict[tuple, int] = {}
    for r in rows:
        k = (r["user_id"], r["event_type"])
        final[k] = max(final.get(k, 0), r["count"])
    batch = spark.createDataFrame(EV_BATCH1 + EV_BATCH2, EVENTS_SCHEMA)
    want = {
        (r["user_id"], r["event_type"]): r["n"]
        for r in batch.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert final == want
    # cross-batch accumulation actually happened: user 1's "view" count
    # passed through 2 (trigger 1) before finishing at 3
    views = sorted(
        r["count"] for r in rows
        if r["user_id"] == 1 and r["event_type"] == "view"
    )
    assert views == [2, 3]


RECENT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("seq", T.LongType()),
    ]
)

# user 1 sees 7 docs across two triggers (window must slide: K=3);
# user 2 stays under K (append-only path); user 3 appears late
R_BATCH1 = [(1, 10, 0), (1, 11, 1), (2, 50, 2), (1, 12, 3)]
R_BATCH2 = [(1, 13, 0), (1, 14, 1), (3, 90, 2), (2, 51, 3), (1, 15, 4)]


@pytest.mark.slow
def test_tws_list_recent_items_window(spark, tmp_path):
    from substreams_sink_graph_load_spark.streaming.recent import (
        streaming_recent_items_tws,
    )

    src = _write_jsonl(tmp_path, "recent", [R_BATCH1, R_BATCH2],
                       ["user_id", "doc_id", "seq"])
    stream = (
        spark.readStream.format("json")
        .schema(RECENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    rows = _run(
        spark,
        streaming_recent_items_tws(stream, k=3),
        str(tmp_path / "ckpt_recent"),
        "tws_recent",
    )
    # one row per (trigger, user-with-events); keep each user's LAST
    per_user: dict[int, list] = {}
    emitted: dict[int, int] = {}
    for r in rows:
        per_user[r["user_id"]] = list(r["recent"])
        emitted[r["user_id"]] = emitted.get(r["user_id"], 0) + 1
    # stream order for user 1: 10,11,12 | 13,14,15 -> last 3 = 13,14,15
    assert per_user == {1: [13, 14, 15], 2: [50, 51], 3: [90]}
    assert emitted == {1: 2, 2: 2, 3: 1}

    # batch twin: slice(collect_list ordered by arrival, -K)
    both = R_BATCH1 + [(u, d, s + 10) for u, d, s in R_BATCH2]
    batch = spark.createDataFrame(both, RECENT_SCHEMA)
    want = {
        r["user_id"]: r["recent"][-3:]
        for r in batch.groupBy("user_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(seq, doc_id))),"
                " x -> x.doc_id)"
            ).alias("recent")
        )
        .collect()
    }
    assert per_user == want


# user 1 active in both triggers (timer deleted + re-armed, flushes only
# after the SECOND); user 2 only in trigger 1 (flushes during trigger 2)
T_BATCH1 = [(1,), (1,), (2,)]
T_BATCH2 = [(1,)]


@pytest.mark.slow
def test_tws_timers_idle_flush(spark, tmp_path):
    from substreams_sink_graph_load_spark.streaming.timers import (
        streaming_idle_flush_tws,
    )

    src = _write_jsonl(tmp_path, "tev", [T_BATCH1, T_BATCH2], ["user_id"])
    stream = (
        spark.readStream.format("json")
        .schema(T.StructType([T.StructField("user_id", T.LongType())]))
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    rows = _run(
        spark,
        streaming_idle_flush_tws(stream, idle_grace_ms=1),
        str(tmp_path / "ckpt_timers"),
        "tws_timers",
    )
    got = {(r["user_id"], r["n_events"]) for r in rows}
    # user 2's trigger-1 timer fires in trigger 2 -> flush with count 1.
    # user 1 re-arms in trigger 2 (its trigger-1 timer was DELETED, not
    # fired: a fired timer would have evicted the count and split 2+1);
    # whether its final timer gets a closing microbatch is up to
    # availableNow, so accept the flush either way — but the count MUST
    # be the full 3 if it flushed.
    assert (2, 1) in got
    assert not any(u == 1 and n != 3 for u, n in got)
    assert all(r["flushed_at_ms"] > 0 for r in rows)


# gap 30s. u10: one 2-event session then a later singleton; u20: singleton;
# u30: TWO sessions inside one batch (in-data close). u98/u99: watermark
# sentinels that push event time forward so every real timer fires.
# epoch base keeps every event past the initial (0) watermark
_B = 1_000_000
S_BATCH1 = [(10, _B + 0), (10, _B + 10), (20, _B + 5), (30, _B + 0), (30, _B + 50)]
S_BATCH2 = [(10, _B + 100)]
S_BATCH3 = [(99, _B + 10_000)]
S_BATCH4 = [(98, _B + 20_000)]


@pytest.mark.slow
def test_tws_eventtime_sessionize_matches_session_window(spark, tmp_path):
    from substreams_sink_graph_load_spark.streaming.timers import (
        streaming_sessionize_tws,
    )

    src = _write_jsonl(
        tmp_path,
        "sess_ev",
        [S_BATCH1, S_BATCH2, S_BATCH3, S_BATCH4],
        ["user_id", "ts_s"],
    )
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts_s", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.format("json")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
        .withColumn("ts", F.col("ts_s").cast("timestamp"))
    )
    rows = _run(
        spark,
        streaming_sessionize_tws(stream, gap_ms=30_000),
        str(tmp_path / "ckpt_sess"),
        "tws_sessions",
    )
    got = {
        (r["user_id"], r["session_start_ms"], r["session_end_ms"], r["n_events"])
        for r in rows
        if r["user_id"] < 90  # sentinels' own sessions are out of scope
    }

    # the batch truth: Spark's built-in session_window over the same
    # events; its window is [start, last+gap), so end-gap == our last_ts
    batch = spark.createDataFrame(
        [r for r in S_BATCH1 + S_BATCH2], "user_id long, ts_s long"
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    want = {
        (
            r["user_id"],
            r["win"]["start"].timestamp() * 1000,
            r["win"]["end"].timestamp() * 1000 - 30_000,
            r["n"],
        )
        for r in batch.groupBy(
            F.session_window("ts", "30 seconds").alias("win"), "user_id"
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want, (got, want)
    assert len(got) == 5


@pytest.mark.slow
def test_tws_eventtime_sessionize_late_events_merge_backward(spark, tmp_path):
    """With watermark_delay > 0, admissible late events merge by INTERVAL
    semantics: a late event within gap of the open session's start extends
    session_start BACKWARD, and a late event older than start - gap forms
    its own earlier session (closed in-data).  Pins the r9 interval-merge
    rewrite — the old fold absorbed ANY ts <= last into the session and
    never moved start."""
    from substreams_sink_graph_load_spark.streaming.timers import (
        streaming_sessionize_tws,
    )

    # gap 30s, delay 50s.  Batch 1 opens u1 at B+200 (watermark B+150).
    # Batch 2 delivers two admissible late events: B+185 merges (and
    # extends start 200 -> 185), B+151 is > gap older than 185 so it is
    # its own earlier singleton session.  Sentinels push the watermark
    # past B+230 so the open session's timer fires.
    b1 = [(1, _B + 200)]
    b2 = [(1, _B + 185), (1, _B + 151)]
    b3 = [(99, _B + 400)]
    b4 = [(98, _B + 500)]
    src = _write_jsonl(
        tmp_path, "sess_late", [b1, b2, b3, b4], ["user_id", "ts_s"]
    )
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts_s", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.format("json")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src)
        .withColumn("ts", F.col("ts_s").cast("timestamp"))
    )
    rows = _run(
        spark,
        streaming_sessionize_tws(
            stream, gap_ms=30_000, watermark_delay="50 seconds"
        ),
        str(tmp_path / "ckpt_sess_late"),
        "tws_sessions_late",
    )
    got = {
        (r["user_id"], r["session_start_ms"], r["session_end_ms"], r["n_events"])
        for r in rows
        if r["user_id"] < 90
    }
    want = {
        (1, (_B + 151) * 1000, (_B + 151) * 1000, 1),
        (1, (_B + 185) * 1000, (_B + 200) * 1000, 2),
    }
    assert got == want, (got, want)


@pytest.mark.slow
def test_tws_listtimers_twin_matches_statecolumn_variant(spark, tmp_path):
    """The ListTimers variant recovers the armed deadline from the timer
    service instead of a state column — identical behavior on the same
    input as the state-column processor (and the only live exercise of
    the ListTimers encoding)."""
    from substreams_sink_graph_load_spark.streaming.timers import (
        streaming_idle_flush_tws,
        streaming_idle_flush_tws_listtimers,
    )

    outs = []
    for name, fn in [
        ("lt_a", streaming_idle_flush_tws),
        ("lt_b", streaming_idle_flush_tws_listtimers),
    ]:
        src = _write_jsonl(
            tmp_path, f"tev_{name}", [T_BATCH1, T_BATCH2], ["user_id"]
        )
        stream = (
            spark.readStream.format("json")
            .schema(T.StructType([T.StructField("user_id", T.LongType())]))
            .option("maxFilesPerTrigger", 1)
            .load(src)
        )
        rows = _run(
            spark,
            fn(stream, idle_grace_ms=1),
            str(tmp_path / f"ckpt_{name}"),
            name,
        )
        outs.append({(r["user_id"], r["n_events"]) for r in rows})
    assert outs[0] == outs[1]
    assert (2, 1) in outs[1]  # user 2 flushed by its fired timer
