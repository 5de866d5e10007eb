"""Wire-stream ingest: the reference's ``graphload run`` JSONL stage
(SURVEY §3.1) — demultiplex an interleaved entity-change stream into
per-entity bundled JSONL files, compute the POI chain over the SAME
interleaved order, and write ``last_block.txt``.

Shape: the wire stream (custom DataSource or any (block_num, seq, value)
stream) stages to a parquet log per microbatch (cheap append, cursor
checkpointed by Spark); finalize() then cuts the bundle files in one batch
job — entity routing is a ``partitionBy``-style repartition on
(entity, bundle_start), POI is the §2.5 parallel fold.  The reference
materializes bundles as the stream crosses boundaries; the observable
contract (file set, names, contents, order, empty bundles, poi2$ rows,
last_block marker) is identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bundles import bundle_start_col, write_bundled_lines
from ..schema.normalize import normalize_field


class WireIngest:
    """foreachBatch stager + finalizer for the wire stream."""

    def __init__(self, spark: SparkSession, workdir: str, stop_block: int):
        self.spark = spark
        self.workdir = workdir
        self.stop_block = stop_block
        self.staged = os.path.join(workdir, "wire_log")
        os.makedirs(workdir, exist_ok=True)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.where(F.col("block_num") < self.stop_block)
            .write.mode("append")
            .parquet(self.staged)
        )

    def staged_df(self) -> DataFrame:
        return self.spark.read.parquet(self.staged)


def demux_jsonl(
    spark: SparkSession,
    raw: DataFrame,
    dest_dir: str,
    entities: list[str],
    stop_block: int,
    bundle_size: int = 1000,
) -> dict[str, list[str]]:
    """Route raw change lines to ``<dest>/<entity>/NNN-NNN.jsonl`` bundles.

    Entity names normalize to snake_case for the directory (sinker.go:243);
    unknown entities raise, like the reference's router (sinker.go:242-248).
    One repartition on (entity, bundle) carries the routing; every entity
    materializes every bundle in [0, stop), empty ones as empty files.
    """
    ent = F.get_json_object("value", "$.entity_change.entity")
    routed = raw.select(
        ent.alias("entity_raw"),
        bundle_start_col(F.col("block_num"), bundle_size).alias("bundle_start"),
        F.col("block_num"),
        F.col("seq"),
        F.col("value").alias("line"),
    )
    known = {e: normalize_field(e) for e in set(routed.select("entity_raw").distinct().toPandas()["entity_raw"])}
    norm_map = {}
    for raw_name, snake in known.items():
        if snake not in entities:
            raise ValueError(
                f"cannot find bundler for entity {raw_name!r} (normalized {snake!r})"
            )
        norm_map[raw_name] = snake

    out: dict[str, list[str]] = {}
    for raw_name, snake in sorted(norm_map.items()):
        dest = os.path.join(dest_dir, snake)
        os.makedirs(dest, exist_ok=True)
        lines = routed.where(F.col("entity_raw") == raw_name).select(
            "bundle_start",
            F.col("block_num").alias("_order_block"),
            F.col("seq").alias("_order_seq"),
            "line",
        )
        out[snake] = write_bundled_lines(
            spark,
            lines,
            dest,
            header=None,
            first_block=0,
            stop_block=stop_block,
            bundle_size=bundle_size,
            order_cols=["_order_block", "_order_seq"],
            ext="jsonl",
        )
    return out


def run_ingest(
    spark: SparkSession,
    dest_dir: str,
    entities: list[str],
    stop_block: int,
    wire_path: str | None = None,
    stream_df: DataFrame | None = None,
    bundle_size: int = 1000,
    chain_id: str | None = None,
    start_poi: bytes | None = None,
    workdir: str | None = None,
    enforce_order: bool = True,
) -> dict[str, list[str]]:
    """Full ``run`` parity: wire stream -> per-entity JSONL bundles
    (+ optional poi2$ CSV chain over the interleaved order) +
    ``last_block.txt``.

    Source: either ``wire_path`` (consumed via the custom
    ``entity_changes`` DataSource, cursor-checkpointed) or a prepared
    ``stream_df`` with (block_num, seq, value).

    ``enforce_order`` reproduces the reference's source contract: block
    numbers must be non-decreasing in cursor order — an undo/reorg signal
    (a block below the high-water mark) is fatal (ref sinker.go:291-293
    errors on any undo; the sink demands final-blocks-only).
    """
    from ..sources.stream_source import EntityChangesDataSource

    workdir = workdir or os.path.join(dest_dir, "_work_ingest")
    ingest = WireIngest(spark, workdir, stop_block)

    if stream_df is None:
        if wire_path is None:
            raise ValueError("need wire_path or stream_df")
        spark.dataSource.register(EntityChangesDataSource)
        stream_df = (
            spark.readStream.format("entity_changes")
            .option("path", wire_path)
            .load()
        )
    query = (
        stream_df.writeStream.foreachBatch(ingest.process_batch)
        .option("checkpointLocation", os.path.join(workdir, "checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()

    staged = ingest.staged_df()
    if enforce_order:
        from pyspark.sql import Window

        w = (
            Window.orderBy("seq")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        undo = (
            staged.withColumn("_hwm", F.max("block_num").over(w))
            .where(F.col("block_num") < F.col("_hwm"))
            .select("seq", "block_num", "_hwm")
            .limit(1)
            .collect()
        )
        if undo:
            r = undo[0]
            raise ValueError(
                f"received undo signal / out-of-order block at cursor "
                f"{r['seq']}: block {r['block_num']} below high-water mark "
                f"{r['_hwm']} — the sink requires final blocks only"
            )
    files = demux_jsonl(spark, staged, dest_dir, entities, stop_block, bundle_size)

    if chain_id is not None:
        from ..operators.poi import poi_tocsv

        files["poi2$"] = poi_tocsv(
            spark, staged, dest_dir, chain_id, stop_block,
            bundle_size=bundle_size, start_poi=start_poi,
        )

    last = staged.agg(F.max("block_num")).collect()[0][0] or 0
    with open(os.path.join(dest_dir, "last_block.txt"), "w") as fh:
        fh.write(f"{last}:\n")
    return files
