"""Streaming MAD anomaly screen: the continuous twin of the batch
``events_anomaly_mad`` query (plans/queries.py).

Batch semantics being mirrored: hourly counts per event_type, then a
per-type median and MAD over ALL hours, flagging cells with
``|cnt - med| > 3 * max(mad, 0.5)``.  The median/MAD baseline is a
function of the type's whole hourly history, so the streaming twin keeps
that history as state — which is BOUNDED by construction: the state is
the (hour, count) matrix, |hours| x 8 bytes per type regardless of event
volume (a year is 8,760 slots; a decade 87,600 — kilobytes), the same
calendar x |types| bound the batch plan's shuffle relies on.

Each trigger merges the micro-batch's hourly increments into the state
and re-emits the type's CURRENT flagged set (update-style semantics: a
new hour can both add and retract anomalies by moving the median, so
consumers read the newest snapshot per type — each emission carries a
monotonic per-type ``seq`` for exactly that).  Median/MAD are recomputed
from exact integer counts per trigger, interpolating the middle pair
exactly like Spark's/DuckDB's continuous percentile, so the final
snapshot equals the batch query on the same prefix — verified by
test_streaming_anomaly at sf0.001 plus hand-built retraction cases.

Scale: state is sharded by event_type (RocksDB-backed on a cluster);
the per-trigger recompute is a sort over the type's bounded hour vector.
Contrast with attribution/dedup twins where state is O(users): here the
interesting property is that a FULL-HISTORY statistic still streams
because the sufficient statistic (the hourly matrix) is calendar-bounded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

HOUR_US = 3_600_000_000

# state: parallel arrays of hour index -> accumulated count, plus the
# per-type trigger sequence number stamped onto emissions
STATE_SCHEMA = StructType(
    [
        StructField("ks", ArrayType(LongType())),
        StructField("cnts", ArrayType(LongType())),
        StructField("seq", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("hour_us", LongType()),
        StructField("cnt", LongType()),
        StructField("med", DoubleType()),
        StructField("mad", DoubleType()),
        StructField("seq", LongType()),
    ]
)


def _median_exact(sorted_vals: list[float]) -> float:
    """Continuous median of a sorted list: exact mean of the middle pair —
    the same interpolation Spark's percentile(0.5) and DuckDB's
    quantile_cont apply, bit-equal on integer-valued doubles."""
    n = len(sorted_vals)
    mid = n // 2
    if n % 2:
        return float(sorted_vals[mid])
    return (sorted_vals[mid - 1] + sorted_vals[mid]) / 2.0


def _advance(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (event_type,) = key
    if state.exists:
        ks, cnts, seq = state.get
        hours = dict(zip(ks, cnts))
    else:
        hours, seq = {}, 0
    batch = pd.concat(list(pdfs), ignore_index=True)
    inc = batch.groupby("k").size()
    for k, c in inc.items():
        k = int(k)
        hours[k] = hours.get(k, 0) + int(c)
    seq += 1
    state.update((list(hours), [hours[k] for k in hours], seq))
    med = _median_exact(sorted(float(c) for c in hours.values()))
    adevs = {k: abs(float(c) - med) for k, c in hours.items()}
    mad = _median_exact(sorted(adevs.values()))
    thresh = 3 * max(mad, 0.5)
    rows = [
        (event_type, k * HOUR_US, hours[k], med, mad, seq)
        for k in sorted(hours)
        if adevs[k] > thresh
    ]
    if not rows:
        # explicit empty snapshot: a new hour can RETRACT every anomaly
        # by moving the median, and an append sink can't emit "no rows" —
        # the hour_us = -1 sentinel keeps newest-seq-per-type reads from
        # resurrecting the previous snapshot (filtered by consumers)
        rows = [(event_type, -1, 0, med, mad, seq)]
    yield pd.DataFrame(
        rows, columns=["event_type", "hour_us", "cnt", "med", "mad", "seq"]
    )


def streaming_anomaly_mad(events: DataFrame) -> DataFrame:
    """Streaming events ``(event_type, ts)`` -> per-trigger snapshots of
    each type's currently-flagged (hour, count) anomalies, stamped with a
    monotonic per-type ``seq`` (newest snapshot per type = live table)."""
    keyed = events.select(
        F.col("event_type").cast("string").alias("event_type"),
        F.expr(f"unix_micros(cast(ts as timestamp)) div {HOUR_US}").alias("k"),
    )
    return keyed.groupBy("event_type").applyInPandasWithState(
        _advance,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
