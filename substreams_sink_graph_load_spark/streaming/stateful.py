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
        pdf = pdf.sort_values(["block_num", "seq"])
        for row in pdf.itertuples(index=False):
            op, block = int(row.operation), int(row.block_num)
            ev_fields = json.loads(row.fields_json) if row.fields_json else {}
            if op in (OP_CREATE, OP_UPDATE):
                if live is not None:
                    out.append(
                        (entity_id, start_block, block, _canon(live))
                    )
                    live = {**live, **ev_fields}  # UPDATE overlay
                else:
                    live = ev_fields
                start_block = block
            elif op == OP_DELETE and live is not None:
                out.append((entity_id, start_block, block, _canon(live)))
                live = None
            elif op == OP_FINAL and live is not None:
                # FINAL fields are ignored (processor.go:298-306)
                out.append((entity_id, start_block, None, _canon(live)))
                live = None

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
