"""Distributed proof-of-indexing (ref sinker/sinker.go:232-269 + poi/).

Spark decomposition: the POI digest is a 32-byte state in a commutative
monoid (24-byte fld mixer + event count).  Per-block states are independent
— each block folds its own events at addresses derived from
``(block_num, event_index)`` — so they compute in parallel with
``applyInPandas`` over block groups (one shuffle on block_num).  The
cross-block chain ``digest_b = state_b (+) digest_{b-1}`` is a prefix fold
over one tiny row per block, done driver-side (a million blocks is ~32 MB).

Events feed per operation exactly like the reference sinker
(sinker.go:279-291): CREATE/UPDATE/FINAL -> SetEntity, DELETE ->
RemoveEntity; entity and field names stay UN-normalized for hashing.
A ``poi2$`` row is emitted only when the digest changes
(sinker.go:260-269); empty blocks keep the digest fixed because the mixer
constant I is the monoid identity.
"""

from __future__ import annotations

import json

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..stablehash.poi import ProofOfIndexing, chain_block_states

OP_DELETE = 3

_STATE_SCHEMA = "block_num long, state binary, n_events long"


def _fold_events(block: int, events: list[tuple[int, str]]) -> bytes:
    """Per-event reference fold (one ProofOfIndexing, sequential writes).

    The hot path is the batched fold (stablehash.poi.fold_blocks_batched,
    numpy XXH3 kernels); this scalar twin is the semantic reference the
    batched path is differentially tested against (test_poi_spark)."""
    events.sort()
    poi = ProofOfIndexing(block)
    for _, line in events:
        ch = json.loads(line)["entity_change"]
        op = ch.get("operation")
        if op == OP_DELETE or op == "OPERATION_DELETE":
            poi.remove_entity(ch["entity"], ch["id"])
        else:
            poi.set_entity(ch["entity"], ch["id"], ch.get("fields") or [])
    return poi.pause(None)


def poi_block_states(raw: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Per-block paused POI states from raw change rows.

    ``raw`` needs columns ``block_num`` (long), ``seq`` (long) and ``value``
    (the raw JSONL line).  Returns (block_num, state binary, n_events).

    Physical shape: EXPLICIT ``repartition(n, block_num)`` + mapInPandas
    accumulating blocks per partition.  A groupBy().applyInPandas here gets
    its shuffle AQE-coalesced to ~1 partition (the stream is few MBs, and
    AQE's bytes-based model can't see the Python hashing cost) — measured
    10x wall difference; the explicit partition count is honored by AQE,
    and folding whole partitions also removes the per-group pandas
    overhead of ten thousand tiny block groups.
    """
    spark = raw.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism

    def fold(it) -> pd.DataFrame:
        from ..stablehash.poi import fold_blocks_batched

        # accumulate RAW lines (parsed just-in-time inside the fold:
        # holding a partition's parsed dicts is ~10x the memory and was
        # measured 4x slower from worker GC churn)
        acc: dict[int, list[tuple[int, str]]] = {}
        for pdf in it:
            for b, s, v in zip(pdf["block_num"], pdf["seq"], pdf["value"]):
                acc.setdefault(int(b), []).append((int(s), v))
        # whole-partition batched fold: the fixed-length event-addressed
        # writes hash through the numpy kernels in two vectorized calls
        # (bit-identical to the per-event fold; see fold_blocks_batched)
        states = fold_blocks_batched(acc)
        rows = [
            {"block_num": b, "state": st, "n_events": n}
            for b, (st, n) in states.items()
        ]
        if rows:
            yield pd.DataFrame(rows)

    return (
        raw.select("block_num", "seq", "value")
        .repartition(n, "block_num")
        .mapInPandas(fold, _STATE_SCHEMA)
    )


def poi_chain(
    spark: SparkSession,
    raw: DataFrame,
    chain_id: str,
    start_poi: bytes | None = None,
) -> DataFrame:
    """Full digest chain with change-suppression: one row per block whose
    digest differs from the previous block's (the ``poi2$`` stream).

    Returns (block_num long, id string, digest string hex).
    """
    states = [
        (r["block_num"], bytes(r["state"]))
        for r in poi_block_states(raw).collect()
    ]
    chained = chain_block_states(states, start=start_poi)
    rows = []
    prev = start_poi
    for block, digest in chained:
        if digest != prev:
            rows.append((block, chain_id, digest.hex()))
        prev = digest
    return spark.createDataFrame(
        rows or [], "block_num long, id string, digest string"
    )


def poi_entity_versions(chain: DataFrame) -> DataFrame:
    """``poi2$`` entity rows from the digest chain: each digest change is an
    UPDATE at its block, so version i spans ``[block_i, block_{i+1})`` and
    the newest digest stays open (the reference routes poi2$ through the
    same bundler/tocsv pipeline as any mutable entity; sinker.go:255-269 +
    schema/entities.go:108-124 poi2$ = {id: chain-id, digest: Bytes}).
    """
    w = Window.partitionBy("id").orderBy("block_num")
    return chain.select(
        "id",
        F.col("block_num").alias("block_range_start"),
        F.lead("block_num").over(w).alias("block_range_end"),
        "digest",
    )


def render_poi_csv(versions: DataFrame, bundle_size: int) -> DataFrame:
    """CSV rows for the poi2$ table: ``id,block_range,digest`` with the
    digest as a Postgres hex bytea literal (the chain already carries hex).
    Rows route to the bundle of their *closing* block, open rows to their
    start block — same rule as every mutable entity."""
    from .bundles import bundle_start_col
    from .pg_csv import csv_quote, pg_block_range

    rng = pg_block_range(F.col("block_range_start"), F.col("block_range_end"))
    line = F.concat_ws(
        ",",
        csv_quote(F.col("id")),
        csv_quote(rng),
        csv_quote(F.concat(F.lit("\\x"), F.col("digest"))),
    )
    emit = F.coalesce(F.col("block_range_end"), F.col("block_range_start"))
    return versions.select(
        line.alias("line"),
        bundle_start_col(emit, bundle_size).alias("bundle_start"),
        emit.alias("_order_block"),
        F.col("block_range_start").alias("_order_seq"),
    )


def poi_tocsv(
    spark: SparkSession,
    raw: DataFrame,
    dest_dir: str,
    chain_id: str,
    stop_block: int,
    bundle_size: int = 1000,
    start_poi: bytes | None = None,
    first_block: int = 0,
) -> list[str]:
    """End-to-end poi2$ pipeline: interleaved change stream -> digest chain
    -> SCD-2 versions -> bundled ``poi2$`` CSV files (header
    ``id,block_range,digest``).  ``raw`` must be the PRE-demux stream
    (block_num, seq, value): the per-block event index that addresses the
    hash is global across entities (sinker.go:232-253).  ``first_block`` is
    the sinker start block: bundle enumeration begins at its aligned bundle
    like the reference's bundlers."""
    import os

    from .bundles import write_bundled_csv

    chain = poi_chain(spark, raw, chain_id, start_poi=start_poi)
    versions = poi_entity_versions(chain)
    rendered = render_poi_csv(versions, bundle_size)
    dest = os.path.join(dest_dir, "poi2$")
    os.makedirs(dest, exist_ok=True)
    return write_bundled_csv(
        spark,
        rendered,
        dest,
        header="id,block_range,digest",
        first_block=first_block,
        stop_block=stop_block,
        bundle_size=bundle_size,
        order_cols=["_order_block", "_order_seq"],
    )
