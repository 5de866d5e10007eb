"""Streaming exact deduplication: first-seen-wins across micro-batches.

The continuous twin of the batch ``dedup_exact`` plan: content identity is
``md5(text)``, the keeper for each hash is the first arrival in stream
order (min id inside a single trigger — micro-batches carry no intra-batch
order), and every later duplicate is dropped.  The seen-set lives in
Spark's state store keyed by content hash (RocksDB-backed on a real
cluster), so the dedup scales with DISTINCT content, shards with the
group partitioning, and survives restarts with the checkpoint — exactly
what a continuously-ingesting training-data pipeline needs ahead of its
batch dedup sweeps.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

STATE_SCHEMA = StructType([StructField("keeper_id", LongType())])

OUTPUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("content_hash", StringType()),
    ]
)


def _first_seen_fn(ttl_ms: int | None):
    def _first_seen(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (content_hash,) = key
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()  # horizon passed: forget this content hash
            return
        if state.exists:
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)  # refresh on every sight
            return  # keeper already emitted in an earlier trigger: drop all
        keeper: int | None = None
        for pdf in pdfs:
            if len(pdf):
                m = int(pdf["doc_id"].min())
                keeper = m if keeper is None else min(keeper, m)
        if keeper is not None:
            state.update((keeper,))
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            yield pd.DataFrame(
                {"doc_id": [keeper], "content_hash": [content_hash]}
            )

    return _first_seen


def streaming_exact_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    state_ttl_minutes: int | None = None,
) -> DataFrame:
    """Streaming (id, text) -> append stream of first-seen keeper rows
    ``(doc_id, content_hash)``; duplicates across and within micro-batches
    never emit.  Feed any streaming source; state is per content hash.

    ``state_ttl_minutes`` bounds the seen-set: a content hash unseen for
    the TTL is evicted (processing-time timeout, refreshed on every
    sighting), so state size tracks the RECENTLY-distinct content instead
    of all content ever — the trade is an explicit dedup horizon (a dup
    arriving after the TTL re-emits; the batch dedup sweep catches those).
    With ``None`` the seen-set is exact and grows with distinct content.
    """
    keyed = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.md5(F.col(text_col)).alias("content_hash"),
    )
    ttl_ms = (
        None if state_ttl_minutes is None else state_ttl_minutes * 60_000
    )
    return keyed.groupBy("content_hash").applyInPandasWithState(
        _first_seen_fn(ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if ttl_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas twin
# ---------------------------------------------------------------------------

try:  # Spark 4 TWS API; the import is cheap and always present in 4.x
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor
except ImportError:  # pragma: no cover
    StatefulProcessor = object  # type: ignore[misc,assignment]


class FirstSeenProcessor(StatefulProcessor):
    """``transformWithStateInPandas`` twin of :func:`_first_seen_fn` —
    identical first-seen-wins semantics on the successor API's typed
    ValueState.  ``ttl_ms`` maps to the NATIVE per-state TTL
    (``getValueState(..., ttlDurationMs=...)``): eviction happens inside
    the state store instead of via processor-managed timeouts, so the
    processor body stays timeout-free.  With a TTL the query must run
    ``timeMode="processingTime"``; exact mode runs ``"none"``."""

    def __init__(self, ttl_ms: int | None = None):
        self._ttl_ms = ttl_ms

    def init(self, handle) -> None:
        self._seen = handle.getValueState(
            "keeper", STATE_SCHEMA, ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(self, key, rows, timerValues):
        (content_hash,) = key
        if self._seen.exists():
            return  # keeper already emitted: drop every arrival
        keeper: int | None = None
        for pdf in rows:
            if len(pdf):
                m = int(pdf["doc_id"].min())
                keeper = m if keeper is None else min(keeper, m)
        if keeper is not None:
            self._seen.update((keeper,))
            yield pd.DataFrame(
                {"doc_id": [keeper], "content_hash": [content_hash]}
            )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def close(self) -> None:
        pass


def streaming_exact_dedup_tws(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    state_ttl_minutes: int | None = None,
) -> DataFrame:
    """:func:`streaming_exact_dedup` on transformWithStateInPandas —
    same contract, native state-store TTL instead of group timeouts.
    Requires the RocksDB state store provider (TWS is RocksDB-only)."""
    keyed = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.md5(F.col(text_col)).alias("content_hash"),
    )
    ttl_ms = (
        None if state_ttl_minutes is None else state_ttl_minutes * 60_000
    )
    return keyed.groupBy("content_hash").transformWithStateInPandas(
        FirstSeenProcessor(ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none" if ttl_ms is None else "processingTime",
    )
