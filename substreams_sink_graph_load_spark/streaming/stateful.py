"""Record-at-a-time stateful SCD-2: ``applyInPandasWithState`` keyed by id.

This is the continuous-mode twin of the foreachBatch replay in run.py
(SURVEY §2.10 T4): per-id open-version state lives in Spark's state store
(RocksDB-backed on a real cluster), closed/finalized versions emit as their
closing events arrive — the literal Spark translation of the reference's
in-memory ``map[id]Entity`` fold (ref csvprocessor/processor.go:235-307),
with the state store replacing the map and group partitioning replacing
the single process.

Use run.py's batch-replay when the source is bundle files (simpler, one
code path with batch); use this when events arrive per-record (gRPC-shaped
source) and emission latency matters.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import StatefulProcessor
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators.scd2 import OP_CREATE, OP_DELETE, OP_FINAL, OP_UPDATE

# state: one open version -> (start_block, fields as canonical JSON)
STATE_SCHEMA = StructType(
    [
        StructField("start_block", LongType()),
        StructField("fields_json", StringType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("block_range_start", LongType()),
        StructField("block_range_end", LongType()),  # NULL == open (FINAL)
        StructField("fields_json", StringType()),
    ]
)

# OUTPUT_SCHEMA plus the emitting event's block — what bundle routing
# (streaming/run.py) keys CSV file assignment on: the closing event's
# block for superseded rows, the FINAL block for finalized rows (exactly
# scd2_versions' emit_block column).
OUTPUT_SCHEMA_EMIT = StructType(
    list(OUTPUT_SCHEMA) + [StructField("emit_block", LongType())]
)

# within-batch event order: (block_num, seq) always; a chain that cannot
# number lines with a window (fully-streaming sources) appends the split
# tiebreaker column instead
SORT_COLS = ("block_num", "seq", "sub_seq")


def _fold_events(entity_id, start_block, live, pdf):
    """The per-id SCD-2 fold core (ref csvprocessor/processor.go:235-307),
    shared verbatim by the applyInPandasWithState and both TWS twins.
    Returns (rows, start_block, live) where each row carries emit_block
    as its last element — callers that expose the 4-column contract strip
    it."""
    out: list[tuple] = []
    cols = [c for c in SORT_COLS if c in pdf.columns]
    pdf = pdf.sort_values(cols)
    for row in pdf.itertuples(index=False):
        op, block = int(row.operation), int(row.block_num)
        ev_fields = json.loads(row.fields_json) if row.fields_json else {}
        if op in (OP_CREATE, OP_UPDATE):
            if live is not None:
                out.append(
                    (entity_id, start_block, block, _canon(live), block)
                )
                live = {**live, **ev_fields}  # UPDATE overlay
            else:
                live = ev_fields
            start_block = block
        elif op == OP_DELETE and live is not None:
            out.append((entity_id, start_block, block, _canon(live), block))
            live = None
        elif op == OP_FINAL and live is not None:
            # FINAL fields are ignored (processor.go:298-306)
            out.append((entity_id, start_block, None, _canon(live), block))
            live = None
    return out, start_block, live


def _fold_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-id fold.  Events must arrive block-ordered across triggers (the
    source contract, T1); within a trigger we sort by (block_num, seq)."""
    (entity_id,) = key
    if state.exists:
        start_block, fields_json = state.get
        live: dict[str, Any] | None = json.loads(fields_json)
    else:
        start_block, live = 0, None

    out: list[tuple] = []
    for pdf in pdfs:
        rows, start_block, live = _fold_events(entity_id, start_block, live, pdf)
        out.extend(r[:4] for r in rows)

    if live is None:
        state.remove()
    else:
        state.update((start_block, _canon(live)))
    if out:
        yield pd.DataFrame(
            out,
            columns=["id", "block_range_start", "block_range_end", "fields_json"],
        )


def _canon(fields: dict) -> str:
    return json.dumps(fields, sort_keys=True, separators=(",", ":"))


def stateful_versions(changes: DataFrame) -> DataFrame:
    """Streaming DataFrame of (id, block_num, seq, operation, fields_json)
    -> append stream of closed/finalized version rows; open versions stay
    in the state store until their closing event arrives."""
    return changes.groupBy("id").applyInPandasWithState(
        _fold_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def tws_available() -> bool:
    """True when transformWithStateInPandas can actually run here: its
    streaming Python runner speaks protobuf to the state server and needs
    a google.protobuf runtime.  When the real package is absent (this
    sandbox) the clean-room mini-runtime in
    :mod:`substreams_sink_graph_load_spark.protoshim` is activated
    instead — it implements the public proto3 wire format for exactly
    the StateMessage surface the worker's state clients use, and the JVM
    parsing our bytes with the real Java protobuf makes the TWS
    integration tests a cross-implementation differential for it.
    Activation must precede SparkSession creation so workers inherit the
    PYTHONPATH entry (get_spark does the same activation)."""
    from .. import protoshim

    if not protoshim.activate():
        return False
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class Scd2Processor(StatefulProcessor):
    """Spark 4 ``transformWithStateInPandas`` port of the per-id SCD-2
    fold — the successor API to ``applyInPandasWithState`` (typed state
    variables, timers, per-state TTL, composite state).

    Semantics are identical to :func:`_fold_group`; the reference's
    FINAL handling (processor.go:298-306 — emit the open version, ignore
    FINAL's own fields) here explicitly EVICTS the key's state
    (``clear()``), so a finalized entity costs zero state-store bytes
    from that point on — at 100 TB of mostly-finalized history the
    live-state working set stays proportional to the OPEN entities only.
    DELETE evicts identically.  Requires the RocksDB state store
    (``spark.sql.streaming.stateStore.providerClass`` =
    ``ROCKSDB_PROVIDER``) — transformWithState is RocksDB-only."""

    # subclasses flip this to expose emit_block as a 5th output column
    _with_emit_block = False

    def init(self, handle) -> None:
        self._state = handle.getValueState("open_version", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        (entity_id,) = key
        if self._state.exists():
            start_block, fields_json = self._state.get()
            live: dict[str, Any] | None = json.loads(fields_json)
        else:
            start_block, live = 0, None

        out: list[tuple] = []
        for pdf in rows:
            emitted, start_block, live = _fold_events(
                entity_id, start_block, live, pdf
            )
            out.extend(
                emitted if self._with_emit_block else (r[:4] for r in emitted)
            )

        if live is None:
            self._state.clear()
        else:
            self._state.update((start_block, _canon(live)))
        if out:
            cols = [
                "id",
                "block_range_start",
                "block_range_end",
                "fields_json",
            ]
            if self._with_emit_block:
                cols.append("emit_block")
            yield pd.DataFrame(out, columns=cols)

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def close(self) -> None:
        pass


def stateful_versions_tws(changes: DataFrame) -> DataFrame:
    """:func:`stateful_versions` on the transformWithStateInPandas API —
    same input/output contract, same emission semantics (the test matrix
    runs both twins against the batch fold).  The session must run the
    RocksDB state store provider before the query starts."""
    return changes.groupBy("id").transformWithStateInPandas(
        Scd2Processor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


class Scd2EmitProcessor(Scd2Processor):
    """:class:`Scd2Processor` with ``emit_block`` exposed (OUTPUT_SCHEMA_
    EMIT) — the form the streaming PRODUCTION path (run.py) consumes:
    bundle routing needs the block whose processing emitted each row,
    exactly scd2_versions' emit_block."""

    _with_emit_block = True


def stateful_versions_tws_emit(changes: DataFrame) -> DataFrame:
    """:func:`stateful_versions_tws` with the 5-column emit_block output
    contract (see :class:`Scd2EmitProcessor`).  Accepts an optional
    ``sub_seq`` tiebreaker column for chains that cannot window a line
    number streaming-side (order: block_num, seq, sub_seq)."""
    return changes.groupBy("id").transformWithStateInPandas(
        Scd2EmitProcessor(),
        outputStructType=OUTPUT_SCHEMA_EMIT,
        outputMode="append",
        timeMode="none",
    )


class Scd2SeededProcessor(Scd2Processor):
    """:class:`Scd2Processor` plus snapshot seeding via
    ``handleInitialState`` — the TWS form of the reference's start-POI
    resume (cmd run.go:101-117; the ingest-level seed lives at
    streaming/run.py): each key's OPEN version at the seed block becomes
    its initial state before the first batch, so a stream picks up
    mid-history exactly where a prior run (or the batch
    ``scd2_state_at_block`` snapshot) stopped.  Decomposition contract,
    pinned by test: ``fold(full) == fold(prefix).closed ∪
    seeded_tws(suffix, snapshot=fold(prefix).open)``."""

    def handleInitialState(self, key, initialState, timerValues) -> None:
        if len(initialState) == 0:
            return
        row = initialState.iloc[0]
        self._state.update(
            (int(row["start_block"]), _canon(json.loads(row["fields_json"])))
        )


def stateful_versions_tws_seeded(
    changes: DataFrame, snapshot: DataFrame
) -> DataFrame:
    """Seeded SCD-2 stream: ``snapshot`` holds one OPEN version per id
    (columns ``id, start_block, fields_json`` — the open rows of
    ``scd2_state_at_block``); versions that close after the seed point
    emit with their original pre-seed start block."""
    return changes.groupBy("id").transformWithStateInPandas(
        Scd2SeededProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
        initialState=snapshot.groupBy("id"),
    )
