"""Streaming first-touch attribution: the continuous twin of the batch
``sessions_attribution`` query (plans/queries.py).

Batch semantics being mirrored: events gap-sessionize per user (a new
session opens when the inactivity gap exceeds 30 minutes, ties broken by
event_id), and every purchase credits the event type that OPENED its
session.  The streaming twin keeps a 2-slot state per user — the last
event's microsecond timestamp and the current session's first touch — and
emits one row per purchase as it happens, so a downstream
``groupBy(first_touch)`` fold IS the live attribution table, no history
re-scan.

Ordering contract: micro-batches must deliver each user's events in
(event-time, event_id) order ACROSS triggers (the ordered-source contract
the ingest path already guarantees — streaming/ingest.py T1); within a
trigger the fold sorts the group's rows itself on the same key, matching
the batch query's window tiebreak exactly.  Under that contract the
emitted purchase rows equal the batch query's qualifying rows for every
prefix of the stream — verified by test_streaming_attribution against the
registry query at sf0.001.

Scale: state is one timestamp + one short string per user (RocksDB-backed
on a cluster), sharded by the user_id group key; a hot user costs one
sorted pandas group per trigger, never a cross-trigger buffer.  The
purchase value travels as the raw double and is converted to exact
integer cents by the SAME Spark expression the batch query uses
(``F.round(value*100).cast("long")``), so the two paths cannot diverge on
rounding.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SESSION_GAP_US = 1_800_000_000  # 30 minutes, matches the batch query

# state: microsecond epoch of the user's last event (-1 = none yet) and
# the event type that opened the current session
STATE_SCHEMA = StructType(
    [
        StructField("last_ts_us", LongType()),
        StructField("first_touch", StringType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("first_touch", StringType()),
        StructField("value", DoubleType()),
        StructField("ts_us", LongType()),
        StructField("event_id", LongType()),
    ]
)


def _advance(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    last_ts, first_touch = state.get if state.exists else (-1, "")
    rows: list[tuple[int, str, float, int, int]] = []
    batch = pd.concat(list(pdfs), ignore_index=True)
    batch = batch.sort_values(["ts_us", "event_id"], kind="stable")
    for etype, value, ts, eid in zip(
        batch["event_type"], batch["value"], batch["ts_us"], batch["event_id"]
    ):
        ts, eid = int(ts), int(eid)
        if last_ts < 0 or ts - last_ts > SESSION_GAP_US:
            first_touch = str(etype)
        if etype == "purchase":
            rows.append((user_id, first_touch, float(value), ts, eid))
        last_ts = ts
    state.update((last_ts, first_touch))
    if rows:
        yield pd.DataFrame(
            rows, columns=["user_id", "first_touch", "value", "ts_us", "event_id"]
        )


def streaming_attribution(events: DataFrame) -> DataFrame:
    """Streaming events ``(user_id, event_id, event_type, value, ts)`` ->
    append stream of attributed purchases ``(user_id, first_touch, value,
    ts_us, event_id)``."""
    keyed = events.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        F.col("event_type").cast("string").alias("event_type"),
        F.col("value").cast("double").alias("value"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _advance,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def attribution_table(purchases: DataFrame) -> DataFrame:
    """Fold the attributed-purchase stream/table to the batch
    ``sessions_attribution`` output shape: (first_touch, n_purchases,
    revenue_cents), cents via the same Spark expression as the batch."""
    return purchases.groupBy("first_touch").agg(
        F.count("*").cast("long").alias("n_purchases"),
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("revenue_cents"),
    )
