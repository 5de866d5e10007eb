"""Streaming heavy-hitter detection: the continuous twin of the batch
``heavy_hitters_phrases`` query (plans/queries.py, operators/sketch.py).

Batch semantics being mirrored: flag every term whose cumulative
frequency reaches an absolute threshold ``T``.  The batch query's
RELATIVE threshold (freq > n/k) needs the corpus total n, which is only
meaningful for a closed corpus; the deployment alarm a continuously
ingesting pipeline runs is the FIXED-threshold variant — "tell me the
first time any phrase has been seen T times" — and with a fixed T the
flagged set is monotone (counts only grow), so emission is append-style:
each term is emitted exactly once, in the trigger where its cumulative
count first reaches T.

State is one counter per distinct term, keyed and sharded by term
(RocksDB-backed on a cluster) — the same O(distinct) contract as the
streaming dedup twin's seen-set.  The Misra-Gries candidate trick the
batch pass uses does NOT map onto keyed state (summary eviction is a
cross-key operation; per-key state can't see its neighbors), and it
isn't needed: the batch MG pass exists to bound a SHUFFLE, while here
the term is the stream partitioning key and the per-key state is already
minimal (one long).  An emitted term early-returns on every later
trigger — one state read, no write.

The emitted TERM SET equals the batch answer on the same prefix
(monotonicity makes it chunking-invariant — test_streaming_heavy_hitters
drains the same rows in 1/3/5 files); the cumulative count STAMPED on
the emission is trigger-resolution (the count as of the crossing
micro-batch, >= T, <= final total), documented as such.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

STATE_SCHEMA = StructType(
    [
        StructField("cum", LongType()),
        StructField("emitted", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("term", StringType()),
        StructField("cum_count", LongType()),
    ]
)


def _cross_fn(threshold: int, ttl_ms: int | None):
    def _cross(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (term,) = key
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()  # idle horizon passed: the burst is over
            return
        cum, emitted = state.get if state.exists else (0, 0)
        if emitted:
            # already alarmed for this burst; in TTL mode keep refreshing
            # the horizon so the emitted marker dies only when idle
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            return
        for pdf in pdfs:
            cum += len(pdf)
        if cum >= threshold:
            state.update((cum, 1))
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            yield pd.DataFrame({"term": [term], "cum_count": [cum]})
        else:
            state.update((cum, 0))
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)

    return _cross


def streaming_heavy_hitters(
    occurrences: DataFrame,
    col: str = "term",
    threshold: int = 1000,
    idle_ttl_minutes: int | None = None,
) -> DataFrame:
    """One row per term the trigger its cumulative count first reaches
    ``threshold``.  ``occurrences`` is a streaming DataFrame with one row
    per term occurrence.

    ``idle_ttl_minutes`` switches to BURST semantics: a term's counter
    (and its already-alarmed marker) evicts after that long with no new
    occurrences, so the alarm means "``threshold`` occurrences within one
    burst" and a term can re-alarm in a later burst — and, like the
    streaming-dedup TTL mode, state is bounded by the active horizon
    instead of all-time distinct terms.  With no TTL the flagged set is
    monotone and each term emits exactly once (== the batch answer)."""
    if threshold < 1:
        raise ValueError("threshold must be >= 1")
    ttl_ms = (
        None if idle_ttl_minutes is None else int(idle_ttl_minutes) * 60_000
    )
    return (
        occurrences.select(occurrences[col].alias("term"))
        .groupBy("term")
        .applyInPandasWithState(
            _cross_fn(threshold, ttl_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.NoTimeout
                if ttl_ms is None
                else GroupStateTimeout.ProcessingTimeTimeout
            ),
        )
    )
