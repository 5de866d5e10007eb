"""Idle-key flush on transformWithStateInPandas processing-time timers.

The session-boundary primitive event pipelines need: a key that stops
arriving gets ONE summary row emitted and its state evicted, driven by
the state store's own timer service instead of data arrival (an idle
user, by definition, sends nothing to trigger the flush).  Per batch a
key (1) deletes its previously registered timer — timers are addressed
BY expiry timestamp, so the old deadline is kept in the value state —
(2) folds the new rows into its running count, (3) re-arms a fresh
timer one idle-grace past the batch's processing time.  When a timer
fires (``handleExpiredTimer``), the key's summary emits and state
clears; a later arrival starts a fresh life.

Also the live differential for the protoshim timer encodings
(RegisterTimer / DeleteTimer / ExpiryTimerRequest / TimerInfo with its
proto3-``optional`` key / GetProcessingTime), which no ValueState /
ListState / MapState twin sends.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

try:
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor
except ImportError:  # pragma: no cover
    StatefulProcessor = object  # type: ignore[misc,assignment]

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("armed_expiry_ms", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("flushed_at_ms", LongType()),
    ]
)


class IdleFlushProcessor(StatefulProcessor):
    """Flush a key's event count after ``idle_grace_ms`` without input."""

    def __init__(self, idle_grace_ms: int = 1):
        if idle_grace_ms < 0:
            raise ValueError("idle_grace_ms must be >= 0")
        self._grace = idle_grace_ms

    def init(self, handle) -> None:
        self._handle = handle
        self._acc = handle.getValueState("acc", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        n = sum(len(pdf) for pdf in rows)
        if n == 0:
            return
        prev_n = 0
        if self._acc.exists():
            prev_n, armed = self._acc.get()
            # timers are addressed by expiry: disarm the stale deadline
            self._handle.deleteTimer(armed)
        expiry = timerValues.getCurrentProcessingTimeInMs() + self._grace
        self._handle.registerTimer(expiry)
        self._acc.update((prev_n + n, expiry))
        return
        yield  # pragma: no cover - generator contract, no batch output

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        (user_id,) = key
        if not self._acc.exists():
            return
        n_events, _ = self._acc.get()
        self._acc.clear()
        yield pd.DataFrame(
            {
                "user_id": [int(user_id)],
                "n_events": [int(n_events)],
                "flushed_at_ms": [expiredTimerInfo.getExpiryTimeInMs()],
            }
        )

    def close(self) -> None:
        pass


def streaming_idle_flush_tws(
    events: DataFrame, idle_grace_ms: int = 1
) -> DataFrame:
    """Append stream of ``(user_id, n_events, flushed_at_ms)`` summaries
    for keys idle past the grace.  Requires the RocksDB state store and
    ``timeMode="processingTime"`` (set by this wrapper)."""
    keyed = events.select(F.col("user_id").cast("long").alias("user_id"))
    return keyed.groupBy("user_id").transformWithStateInPandas(
        IdleFlushProcessor(idle_grace_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="processingTime",
    )
