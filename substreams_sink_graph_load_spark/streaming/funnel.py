"""Streaming ordered-funnel tracking: the continuous twin of the batch
``events_funnel`` query (plans/queries.py).

Batch semantics being mirrored: a user converts through
view -> click -> purchase where the first view's timestamp bounds the
qualifying clicks (``ts > tv``) and the first qualifying click bounds the
qualifying purchases (``ts > tc``).  The streaming twin keeps a 3-slot
state machine per user and emits one row per newly-reached stage, so a
downstream count per stage IS the live funnel — no re-scan of history.

Ordering contract: micro-batches must deliver each user's events in
event-time order ACROSS triggers (the ordered-source contract the ingest
path already guarantees — streaming/ingest.py T1); within a trigger the
fold sorts the group's rows itself.  Under that contract the final state
equals the batch fold for every prefix of the stream — verified by
test_streaming_funnel against the batch query's per-stage user sets.

Scale: state is 3 timestamps per user (RocksDB-backed on a cluster),
sharded by the user_id group key; a hot user costs one sorted pandas
group per trigger, never a cross-trigger buffer.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

# state: microsecond epochs of first view / first qualifying click /
# first qualifying purchase; -1 = not reached
STATE_SCHEMA = StructType(
    [
        StructField("tv", LongType()),
        StructField("tc", LongType()),
        StructField("tp", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("stage", StringType()),
        StructField("ts_us", LongType()),
    ]
)


def _advance(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    tv, tc, tp = state.get if state.exists else (-1, -1, -1)
    rows: list[tuple[int, str, int]] = []
    batch = pd.concat(list(pdfs), ignore_index=True)
    batch = batch.sort_values("ts_us", kind="stable")
    for etype, ts in zip(batch["event_type"], batch["ts_us"]):
        ts = int(ts)
        if etype == "view":
            if tv < 0:
                tv = ts
                rows.append((user_id, "view", ts))
        elif etype == "click":
            if tv >= 0 and tc < 0 and ts > tv:
                tc = ts
                rows.append((user_id, "click", ts))
        elif etype == "purchase":
            if tc >= 0 and tp < 0 and ts > tc:
                tp = ts
                rows.append((user_id, "purchase", ts))
    state.update((tv, tc, tp))
    if rows:
        yield pd.DataFrame(rows, columns=["user_id", "stage", "ts_us"])


def streaming_funnel(events: DataFrame) -> DataFrame:
    """Streaming events ``(user_id, event_type, ts)`` -> append stream of
    ``(user_id, stage, ts_us)`` transition rows; each user emits each
    stage at most once across the whole stream."""
    keyed = events.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_type").cast("string").alias("event_type"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _advance,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def funnel_counts(transitions: DataFrame) -> DataFrame:
    """Fold the transition stream/table to per-stage user counts — the
    shape of the batch ``events_funnel`` output."""
    return transitions.groupBy("stage").agg(
        F.count("*").cast("long").alias("users")
    )
