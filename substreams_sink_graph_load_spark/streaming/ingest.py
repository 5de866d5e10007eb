"""Wire-stream ingest: the reference's ``graphload run`` JSONL stage
(SURVEY §3.1) — demultiplex an interleaved entity-change stream into
per-entity bundled JSONL files, compute the POI chain over the SAME
interleaved order, and write ``last_block.txt``.

Shape: the wire stream (custom DataSource or any (block_num, seq, value)
stream) stages to a parquet log per microbatch (cheap append, cursor
checkpointed by Spark); finalize() then cuts the bundle files in one batch
job — entity routing is ONE repartition on (entity, bundle_start) feeding a
single two-level ``partitionBy`` text write (every entity x bundle lands in
its own directory in one pass; no per-entity rescans), POI is the §2.5
parallel fold.  The reference materializes bundles as the stream crosses
boundaries; the observable contract (file set, names, contents, order,
empty bundles, poi2$ rows, last_block marker) is identical.
"""

from __future__ import annotations

import glob
import os
import shutil
import urllib.parse

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.bundles import boundaries, bundle_filename, bundle_start_col
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
        # extract the routing key ONCE here, overlapped with the stage
        # write (JVM get_json_object in the same task that writes the
        # row) — every downstream pass (router validation, demux write)
        # then reads a pruned parquet column instead of re-parsing 100%
        # of the line bytes per pass
        (
            batch_df.where(F.col("block_num") < self.stop_block)
            .withColumn(
                "entity_raw",
                F.get_json_object("value", "$.entity_change.entity"),
            )
            .write.mode("append")
            .parquet(self.staged)
        )

    def staged_df(self) -> DataFrame:
        return self.spark.read.parquet(self.staged)


def check_final_blocks_only(
    staged: DataFrame, chunk_width: int = 1_000_000
) -> int | None:
    """Reject any block below the running high-water mark in cursor order
    (ref sinker.go:291-293 — an undo/reorg signal is fatal; the sink
    demands final blocks only).  Returns the global max block (the final
    high-water mark, None on empty input) so callers that need it — the
    ``last_block.txt`` marker — don't re-scan the log for a number this
    check already computed.

    Distributed: the cursor space splits into seq-range chunks so the
    non-decreasing property decomposes into (a) a running-max window check
    WITHIN each chunk — chunks run in parallel, no global single-partition
    window — and (b) per-chunk (min, max) block extremes merged driver-side
    across chunk boundaries (O(#chunks) rows).  Accept/reject set is exactly
    the global scan's: a violating row either sees its witness inside its
    own chunk (a) or in some earlier chunk's max (b).
    """
    ch = staged.select(
        "seq",
        "block_num",
        (F.col("seq") / F.lit(chunk_width)).cast("long").alias("_chunk"),
    )
    w = Window.partitionBy("_chunk").orderBy("seq").rowsBetween(
        Window.unboundedPreceding, -1
    )
    intra = (
        ch.withColumn("_hwm", F.max("block_num").over(w))
        .where(F.col("block_num") < F.col("_hwm"))
        .orderBy("seq")
        .limit(1)
        .collect()
    )
    if intra:
        r = intra[0]
        raise ValueError(
            f"received undo signal / out-of-order block at cursor "
            f"{r['seq']}: block {r['block_num']} below high-water mark "
            f"{r['_hwm']} — the sink requires final blocks only"
        )
    extremes = (
        ch.groupBy("_chunk")
        .agg(F.min("block_num").alias("_min"), F.max("block_num").alias("_max"))
        .orderBy("_chunk")
        .collect()
    )
    hwm = None
    for row in extremes:
        if hwm is not None and row["_min"] < hwm:
            lo, hi = row["_chunk"] * chunk_width, (row["_chunk"] + 1) * chunk_width
            bad = (
                ch.where(
                    (F.col("seq") >= lo)
                    & (F.col("seq") < hi)
                    & (F.col("block_num") < F.lit(hwm))
                )
                .orderBy("seq")
                .limit(1)
                .collect()[0]
            )
            raise ValueError(
                f"received undo signal / out-of-order block at cursor "
                f"{bad['seq']}: block {bad['block_num']} below high-water "
                f"mark {hwm} — the sink requires final blocks only"
            )
        hwm = row["_max"] if hwm is None else max(hwm, row["_max"])
    return hwm


def check_final_blocks_from_runs(
    runs: list[tuple[int, int, int, int]],
) -> tuple[bool, int | None]:
    """Order check derived from :func:`operators.poi.discover_runs`
    output — zero extra scans when the caller computes runs for the POI
    fold anyway.

    Returns ``(ok, high_water)``.  ``ok=False`` means the run structure
    cannot PROVE the global cursor order (some runs' seq intervals
    overlap — physically interleaved staging), and the caller must fall
    back to :func:`check_final_blocks_only`'s windowed scan; it never
    means "order violated".  A proven violation raises the same
    ValueError as the windowed check: runs sorted by min_seq with
    pairwise-disjoint intervals ARE the global seq order, each run holds
    exactly one block, so a run whose block sits below the running
    high-water mark starts (at its min_seq) the same first-violation
    cursor the windowed check reports.
    """
    if not runs:
        return True, None
    rs = sorted(runs, key=lambda r: (r[1], r[2]))
    prev_max: int | None = None
    hwm: int | None = None
    for blk, mn, mx, _n in rs:
        if prev_max is not None and mn <= prev_max:
            return False, None
        prev_max = mx
        if hwm is not None and blk < hwm:
            raise ValueError(
                f"received undo signal / out-of-order block at cursor "
                f"{mn}: block {blk} below high-water mark {hwm} — the "
                f"sink requires final blocks only"
            )
        hwm = blk if hwm is None else max(hwm, blk)
    return True, hwm


def demux_jsonl(
    spark: SparkSession,
    raw: DataFrame,
    dest_dir: str,
    entities: list[str],
    stop_block: int,
    bundle_size: int = 1000,
    first_block: int = 0,
) -> dict[str, list[str]]:
    """Route raw change lines to ``<dest>/<entity>/NNN-NNN.jsonl`` bundles.

    Entity names normalize to snake_case for the directory (sinker.go:243);
    unknown entities raise, like the reference's router (sinker.go:242-248).
    One routing pass over the data: a column-pruned distinct builds the
    raw-spelling -> snake router map (validated against the schema), then
    ONE repartition on (entity, bundle_start) feeds ONE two-level
    ``partitionBy`` text write — per-bundle files come out of the partition
    directories with driver-side renames (metadata ops).

    EVERY schema entity materializes every bundle in
    [first_block, stop_block) — never-emitted entities included — as the
    reference creates a bundler per schema entity up front (sinker.go:82-88)
    and rolls them all, so unseen entities still produce (empty) files.

    Strict about its input: any row outside [first_block, stop_block)
    raises — out-of-envelope bundles via the metadata-only staged-tree
    audit, unaligned-edge slivers via a pushed-down pre-pass that scans
    only the edge bundles (and is skipped entirely when both boundaries
    are bundle-aligned).  Any entity dir the mover would not glob raises,
    and the staged tree is deleted only once provably empty.  Callers
    that legitimately resume mid-chain (run_ingest) filter the pre-start
    blocks themselves first.
    """
    # The router key: staged logs carry it as a parquet column (extracted
    # once at staging time, WireIngest.process_batch); a raw frame without
    # it falls back to JSON extraction here.
    ent = (
        F.col("entity_raw")
        if "entity_raw" in raw.columns
        else F.get_json_object("value", "$.entity_change.entity")
    )
    # Validation pre-pass: distinct raw spellings from a column-pruned scan
    # (map-side-combined agg over a schema-bounded-cardinality column).
    # Deliberately NOT persist()ed: caching the full line column costs more
    # than the re-extraction it saves (measured 25s persist+distinct vs
    # ~5s re-scan at 1.8M events — deserialized Java strings of the whole
    # log thrash the heap), and at 100 TB pinning the log in executor
    # memory is a non-starter while a second column-pruned pass is one
    # cheap map stage.
    seen = [r["e"] for r in raw.select(ent.alias("e")).distinct().collect()]
    norm_map: dict[str, str] = {}
    for raw_name in seen:
        snake = normalize_field(raw_name) if raw_name is not None else None
        if snake not in entities:
            raise ValueError(
                f"cannot find bundler for entity {raw_name!r} "
                f"(normalized {snake!r})"
            )
        norm_map[raw_name] = snake

    # Row-exact range guard, folded to the aligned-envelope edges.  The
    # staged-tree audit below is bundle-granular: any row whose ALIGNED
    # bundle falls outside [first_aligned, stop_block) surfaces there as
    # an unexpected bundle_start dir, at metadata cost.  The only rows it
    # cannot see are the two slivers inside legitimate edge bundles — a
    # row below an unaligned first_block but inside the first aligned
    # bundle, or at/after an unaligned stop_block but inside the last.
    # Guard exactly those slivers with a pushed-down range filter
    # (parquet row-group stats prune the scan to the edge bundles for
    # staged logs) and skip the pass entirely for aligned boundaries —
    # the previous full min/max aggregation re-scanned the whole log on
    # every call, a real cost at the 100 TB target.
    slivers = []
    if first_block % bundle_size:
        first_aligned = first_block - first_block % bundle_size
        slivers.append(
            (F.col("block_num") >= first_aligned)
            & (F.col("block_num") < first_block)
        )
    if stop_block % bundle_size:
        last_start = stop_block - stop_block % bundle_size
        slivers.append(
            (F.col("block_num") >= stop_block)
            & (F.col("block_num") < last_start + bundle_size)
        )
    if slivers:
        cond = slivers[0]
        for s in slivers[1:]:
            cond = cond | s
        bad = raw.where(cond).select("block_num").limit(1).collect()
        if bad:
            raise ValueError(
                f"demux input carries block {bad[0]['block_num']} outside "
                f"[{first_block}, {stop_block}); truncate or filter upstream"
            )

    mapping = F.create_map(
        *[F.lit(x) for kv in sorted(norm_map.items()) for x in kv]
    )
    staged = os.path.join(dest_dir, "_staged_demux")
    (
        raw.select(
            mapping[ent].alias("entity"),
            bundle_start_col(F.col("block_num"), bundle_size).alias("bundle_start"),
            F.col("block_num"),
            F.col("seq"),
            F.col("value").alias("line"),
        )
        .repartition("entity", "bundle_start")
        .sortWithinPartitions("entity", "bundle_start", "block_num", "seq")
        .select("entity", "bundle_start", "line")
        .write.mode("overwrite")
        .partitionBy("entity", "bundle_start")
        .text(staged, lineSep="\n")
    )

    bounds = boundaries(first_block, stop_block, bundle_size)
    # Fail-fast audit of the staged partition tree (metadata-only, no data
    # pass): every entity dir must be one we will glob for, and every
    # bundle_start must fall inside [first_block, stop_block) — otherwise
    # the move loop below would never visit those rows and the final
    # rmtree would silently drop them (data loss, not a degraded run).
    expected_dirs = {
        f"entity={urllib.parse.quote(s, safe='')}" for s in entities
    }
    valid_starts = {s for s, _ in bounds}
    for ent_dir_path in glob.glob(os.path.join(staged, "entity=*")):
        ent_d = os.path.basename(ent_dir_path)
        if ent_d not in expected_dirs:
            raise ValueError(
                f"demux staged unexpected entity dir {ent_d!r} (escaping "
                f"mismatch vs {sorted(expected_dirs)}); rows would be "
                "dropped with the staged tree"
            )
        for bs_path in glob.glob(os.path.join(ent_dir_path, "bundle_start=*")):
            bs = int(os.path.basename(bs_path).split("=", 1)[1])
            if bs not in valid_starts:
                raise ValueError(
                    f"demux staged rows at {bs_path!r} outside block range "
                    f"[{first_block}, {stop_block}); refusing to drop them"
                )
    out: dict[str, list[str]] = {}
    for snake in sorted(entities):
        dest = os.path.join(dest_dir, snake)
        os.makedirs(dest, exist_ok=True)
        ent_dir = os.path.join(staged, f"entity={urllib.parse.quote(snake, safe='')}")
        files: list[str] = []
        for s, e in bounds:
            parts = sorted(
                glob.glob(os.path.join(ent_dir, f"bundle_start={s}", "part-*"))
            )
            target = os.path.join(dest, bundle_filename(s, e, "jsonl"))
            if len(parts) == 1:
                shutil.move(parts[0], target)
            elif not parts:  # empty (or never-emitted entity): empty file
                open(target, "wb").close()
            else:  # defensive: concatenate (shouldn't happen post-repartition)
                with open(target, "wb") as outfh:
                    for p in parts:
                        with open(p, "rb") as fh:
                            shutil.copyfileobj(fh, outfh)
                        # consumed: the leftover audit below must not see it
                        os.remove(p)
            files.append(target)
        out[snake] = files
    # Belt-and-braces: nothing with bytes in it may remain before teardown
    # (the audit above should make this unreachable; keep it so any future
    # staging-layout drift fails loudly instead of deleting rows).
    leftover = [
        p
        for p in glob.glob(
            os.path.join(staged, "**", "part-*"), recursive=True
        )
        if os.path.getsize(p) > 0
    ]
    if leftover:
        raise RuntimeError(
            f"demux staged files unclaimed by any bundle: {leftover[:5]}"
        )
    shutil.rmtree(staged, ignore_errors=True)
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
    first_block: int = 0,
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

    ``first_block`` is the sinker start block: bundle enumeration starts at
    its aligned bundle (the reference's bundlers boot at the start block,
    not 0).
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
    last: int | None = None
    # One narrow (block_num, seq) pass serves BOTH the order check and
    # the POI fold's run offsets — at cluster scale that deletes a full
    # log-key shuffle+window (the former standalone order check)
    runs = None
    if enforce_order or chain_id is not None:
        from ..operators.poi import discover_runs

        runs = discover_runs(staged)
    if enforce_order:
        ok = False
        if runs is not None:
            ok, last = check_final_blocks_from_runs(runs)
        if not ok:
            last = check_final_blocks_only(staged)
    # The sinker start block: blocks below first_block belong to an
    # earlier run's bundles, so drop them HERE, deliberately and
    # documented — demux_jsonl itself treats any out-of-range row as a
    # hard error rather than silently discarding it with its staging dir.
    files = demux_jsonl(
        spark,
        staged.where(F.col("block_num") >= first_block),
        dest_dir, entities, stop_block, bundle_size,
        first_block=first_block,
    )

    if chain_id is not None:
        from ..operators.poi import RUNS_UNAVAILABLE, poi_tocsv

        # The staged log is written in cursor order (micro-batch appends),
        # so the shuffle-free POI fold applies; it validates the
        # assumption and falls back to the shuffle path on any mismatch.
        # Discovery ALWAYS ran above when chain_id is set, so runs=None
        # here means it exceeded its bound — tell the fold so it goes
        # straight to the shuffle path instead of re-scanning to rediscover
        # the same overflow.
        files["poi2$"] = poi_tocsv(
            spark, staged, dest_dir, chain_id, stop_block,
            bundle_size=bundle_size, start_poi=start_poi,
            first_block=first_block, assume_sorted=True,
            runs=runs if runs is not None else RUNS_UNAVAILABLE,
        )

    # the order check already computed the global max; only re-scan when
    # it was skipped (enforce_order=False)
    if last is None:
        last = staged.agg(F.max("block_num")).collect()[0][0]
    with open(os.path.join(dest_dir, "last_block.txt"), "w") as fh:
        fh.write(f"{last or 0}:\n")
    return files
