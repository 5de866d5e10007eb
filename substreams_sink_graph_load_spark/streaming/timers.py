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


COUNT_SCHEMA = StructType([StructField("n_events", LongType())])


class IdleFlushListTimersProcessor(StatefulProcessor):
    """:class:`IdleFlushProcessor` with the armed deadline recovered
    from the timer service itself (``handle.listTimers()``) instead of
    a state column — timers ARE addressable per-key state, so the
    ``armed_expiry_ms`` column is redundant; the twin test pins that
    both variants emit identical output.  Also the only live exercise
    of the ListTimers protoshim encoding (Register/Delete/Expiry are
    covered by the other timer processors)."""

    def __init__(self, idle_grace_ms: int = 1):
        if idle_grace_ms < 0:
            raise ValueError("idle_grace_ms must be >= 0")
        self._grace = idle_grace_ms

    def init(self, handle) -> None:
        self._handle = handle
        self._acc = handle.getValueState("n", COUNT_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        n = sum(len(pdf) for pdf in rows)
        if n == 0:
            return
        for expiry in list(self._handle.listTimers()):
            self._handle.deleteTimer(expiry)
        prev = self._acc.get()[0] if self._acc.exists() else 0
        self._handle.registerTimer(
            timerValues.getCurrentProcessingTimeInMs() + self._grace
        )
        self._acc.update((prev + n,))
        return
        yield  # pragma: no cover - generator contract, no batch output

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        (user_id,) = key
        if not self._acc.exists():
            return
        (n_events,) = self._acc.get()
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


def streaming_idle_flush_tws_listtimers(
    events: DataFrame, idle_grace_ms: int = 1
) -> DataFrame:
    """:func:`streaming_idle_flush_tws` on the ListTimers variant."""
    keyed = events.select(F.col("user_id").cast("long").alias("user_id"))
    return keyed.groupBy("user_id").transformWithStateInPandas(
        IdleFlushListTimersProcessor(idle_grace_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="processingTime",
    )


SESSION_STATE_SCHEMA = StructType(
    [
        StructField("session_start_ms", LongType()),
        StructField("last_ts_ms", LongType()),
        StructField("n_events", LongType()),
        StructField("armed_expiry_ms", LongType()),
    ]
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_ms", LongType()),
        StructField("session_end_ms", LongType()),
        StructField("n_events", LongType()),
    ]
)


class EventTimeSessionProcessor(StatefulProcessor):
    """Gap-based sessionization on EVENT-TIME timers: a session closes
    either in-data (the next event of the key arrives past the gap) or
    by watermark (the registered event-time timer at ``last_ts + gap``
    fires once the watermark passes it — the only correct close for a
    key that stops sending).  The streaming twin of
    ``F.session_window``: at ``watermark_delay='0 seconds'`` the emitted
    ``(start, last)`` pairs equal the built-in's ``(window.start,
    window.end - gap)`` exactly, which the test pins as a differential.

    Late data (``watermark_delay > 0``): admissible late events merge by
    INTERVAL semantics — the state's ``[start, last]`` interval and the
    batch's events merge wherever they sit within one gap of each other,
    so a late event in ``[start - gap, start)`` extends ``session_start``
    backward, and an event older than ``start - gap`` forms its own
    earlier session (emitted closed in-data, since a later session
    already exists).  Exact ``F.session_window`` equality is only
    guaranteed at delay 0: the built-in holds every window open until
    the watermark passes it, so with a large delay it can merge a
    future late event into a session this processor already emitted —
    an inherent difference between watermark-held and eager in-data
    emission, not a state-merge bug."""

    def __init__(self, gap_ms: int):
        if gap_ms <= 0:
            raise ValueError("gap_ms must be positive")
        self._gap = gap_ms

    def init(self, handle) -> None:
        self._handle = handle
        self._sess = handle.getValueState("sess", SESSION_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        ts_list: list[int] = []
        for pdf in rows:
            ts_list.extend(int(t) for t in pdf["ts_ms"])
        if not ts_list:
            return
        ts_list.sort()

        # [start, end, count] intervals: one per event, plus the state's
        # open session — sorted, then gap-merged (classic interval merge,
        # so backward extension and splits fall out of one rule)
        intervals = [[ts, ts, 1] for ts in ts_list]
        if self._sess.exists():
            start, last, n, armed = self._sess.get()
            self._handle.deleteTimer(armed)
            intervals.append([start, last, n])
            intervals.sort(key=lambda iv: (iv[0], iv[1]))

        merged = [intervals[0]]
        for iv in intervals[1:]:
            cur = merged[-1]
            if iv[0] - cur[1] <= self._gap:
                cur[1] = max(cur[1], iv[1])
                cur[2] += iv[2]
            else:
                merged.append(iv)

        # every session but the latest is provably closed in-data
        *closed, (start, last, n) = merged
        expiry = last + self._gap
        self._handle.registerTimer(expiry)
        self._sess.update((start, last, n, expiry))
        if closed:
            yield pd.DataFrame(
                [(int(user_id), s, e, c) for s, e, c in closed],
                columns=["user_id", "session_start_ms", "session_end_ms", "n_events"],
            )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        (user_id,) = key
        if not self._sess.exists():
            return
        start, last, n, _ = self._sess.get()
        self._sess.clear()
        yield pd.DataFrame(
            {
                "user_id": [int(user_id)],
                "session_start_ms": [start],
                "session_end_ms": [last],
                "n_events": [n],
            }
        )

    def close(self) -> None:
        pass


def streaming_sessionize_tws(
    events: DataFrame,
    gap_ms: int,
    ts_col: str = "ts",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Append stream of closed sessions ``(user_id, session_start_ms,
    session_end_ms, n_events)``; ``ts_col`` must be a timestamp column.
    Watermark-driven: a session only emits once it is provably closed —
    in-data, or when the watermark passes ``last_ts + gap``.  Requires
    the RocksDB state store.

    ``watermark_delay`` admits late events, which merge by interval
    semantics (including backward ``session_start`` extension and
    splits — see :class:`EventTimeSessionProcessor`); exact
    ``F.session_window`` output equality is guaranteed only at the
    default ``'0 seconds'`` delay, where no admissible event can
    precede an already-emitted session."""
    keyed = events.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col(ts_col).alias("ts"),
    ).withWatermark("ts", watermark_delay)
    keyed = keyed.select(
        "user_id",
        (F.unix_millis(F.col("ts"))).alias("ts_ms"),
        "ts",
    )
    return keyed.groupBy("user_id").transformWithStateInPandas(
        EventTimeSessionProcessor(gap_ms),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="eventTime",
    )
