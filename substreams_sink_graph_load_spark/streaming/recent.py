"""Streaming per-user last-K recent items on typed ListState.

The feed/recommendation primitive: for every user, keep the K most
recent doc interactions in stream order and emit the refreshed window
whenever it changes.  ListState is the right store — the buffer is an
ORDERED multiset the JVM state store persists element-wise
(``appendList`` when the buffer is still filling, ``put`` when the
window slides), so a slide writes K small rows, never a serialized
blob of the whole history the way a single ValueState cell would.

Intra-batch order is pinned by an explicit ``seq`` column (micro-batches
carry no row order); cross-batch order is trigger order.  Each trigger
emits one ``(user_id, recent)`` row per user that saw events, with
``recent`` the post-batch window oldest-first — so the LAST row per
user equals the batch twin's ``slice(collect_list, -K)``, the parity
tests/test_tws_ops.py pins.

Completes the typed-state triple (ValueState: dedup/SCD-2, MapState:
event counters, ListState: here) exercised through the live JVM
protobuf differential — ListStateGet/AppendList/ListStatePut encodings
included.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

try:
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor
except ImportError:  # pragma: no cover
    StatefulProcessor = object  # type: ignore[misc,assignment]

ITEM_SCHEMA = StructType([StructField("doc_id", LongType())])

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("recent", ArrayType(LongType())),
    ]
)


class RecentItemsProcessor(StatefulProcessor):
    """ListState-backed sliding window of the K most recent doc_ids."""

    def __init__(self, k: int = 5):
        if k < 1:
            raise ValueError("k must be >= 1")
        self._k = k

    def init(self, handle) -> None:
        self._recent = handle.getListState("recent", ITEM_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        fresh: list[tuple[int, int]] = []
        for pdf in rows:
            fresh.extend(
                (int(r.seq), int(r.doc_id))
                for r in pdf.itertuples(index=False)
            )
        if not fresh:
            return
        fresh.sort()  # explicit seq pins intra-batch order
        new_ids = [d for _, d in fresh]
        prev = [t[0] for t in self._recent.get()]
        window = (prev + new_ids)[-self._k:]
        if len(prev) + len(new_ids) <= self._k:
            # still filling: element-wise append, no rewrite
            self._recent.appendList([(d,) for d in new_ids])
        else:
            self._recent.put([(d,) for d in window])
        yield pd.DataFrame(
            {"user_id": [int(user_id)], "recent": [window]}
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def close(self) -> None:
        pass


def streaming_recent_items_tws(
    events: DataFrame, k: int = 5
) -> DataFrame:
    """Append stream of per-user refreshed last-``k`` windows.  Input
    needs (user_id, doc_id, seq); requires the RocksDB state store
    provider (TWS is RocksDB-only)."""
    keyed = events.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("seq").cast("long").alias("seq"),
    )
    return keyed.groupBy("user_id").transformWithStateInPandas(
        RecentItemsProcessor(k),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
