"""Change-log -> interval-versioned table (SCD Type 2).

This is the reference's core "query" (ref csvprocessor/processor.go:237-307):
an ordered fold over ``(block_num, op, fields)`` events keyed by ``id`` with
an in-memory state map.  Semantics reproduced here:

- CREATE (1): starts a version at its block.
- UPDATE (2): closes the previous version at its block (``[prev_start, b)``)
  and starts a new one with new fields overlaid on old ("last non-null value
  per field"); an UPDATE on an unseen id is tolerated as a CREATE
  (processor.go:267-275).
- DELETE (3): closes the previous version at its block, emits nothing of its
  own; the id may later be re-created (a new "lifetime").
- FINAL (4): emits the current state with an **open** range ``[start,)`` and
  evicts the id — the FINAL event's own fields are ignored (processor.go:
  298-306 writes ``prev`` without merging).
- End-of-log: every still-live id flushes with an open range
  (processor.go:168-177).

Zero-width ranges ``[n,n)`` from same-block CREATE->UPDATE are kept
(graph-node compatible, ref csvprocessor/entity.go:23-29).

Spark-first design — ONE shuffle (hash by ``id``), no Python in the hot
path.  The naive formulation needs a second window partitioned by
``(id, lifetime)`` (and hence a second exchange) for the field overlay after
delete/re-create; we avoid it with a struct-max trick over the single
id-window:

    m_f = max( struct(lifetime, row_idx, value) if value set else NULL )
          over (partition by id order by block_num, seq rows unbounded
                preceding .. current)
    overlay_f = m_f.value if m_f.lifetime == lifetime else NULL

``max`` ignores NULLs and struct comparison is lexicographic, so ``m_f`` is
the most recent set value for the field — and carrying ``lifetime`` in the
struct lets us reject values that leaked from a previous lifetime of a
re-created id.  At 100 TB this matters: the plan is Scan -> Exchange(id) ->
Sort -> Window -> Filter, fully whole-stage-codegen'd.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

OP_CREATE = 1
OP_UPDATE = 2
OP_DELETE = 3
OP_FINAL = 4

META_COLS = ("id", "block_num", "seq", "operation")


def scd2_versions(
    changes: DataFrame,
    field_cols: Sequence[str] | None = None,
    id_col: str = "id",
    block_col: str = "block_num",
    seq_col: str = "seq",
    op_col: str = "operation",
    keep_lifetime: bool = False,
) -> DataFrame:
    """Fold a change-log DataFrame into versioned rows.

    ``changes`` columns: id, block_num, seq (arrival order within/across
    blocks), operation (1..4), plus one column per entity field where NULL
    means "field absent from this event".

    Returns one row per emitted version with ``block_range_start`` /
    ``block_range_end`` (NULL end == open range ``[start,)``) and the
    overlaid field values.
    """
    if field_cols is None:
        field_cols = [c for c in changes.columns if c not in META_COLS]

    op = F.col(op_col)
    w = Window.partitionBy(id_col).orderBy(block_col, seq_col)
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_prev = w.rowsBetween(Window.unboundedPreceding, -1)

    is_starter = op.isin(OP_CREATE, OP_UPDATE)
    # lifetime = number of terminators (DELETE/FINAL) strictly before this
    # event; partitions each id's history into independent re-creations.
    lifetime = F.coalesce(
        F.sum(F.when(op.isin(OP_DELETE, OP_FINAL), F.lit(1))).over(w_prev),
        F.lit(0),
    )

    df = (
        changes.withColumn("_lifetime", lifetime)
        .withColumn("_idx", F.row_number().over(w))
        .withColumn("_next_op", F.lead(op_col).over(w))
        .withColumn("_next_block", F.lead(block_col).over(w))
    )

    # Field overlay: most recent set value within the same lifetime.  FINAL
    # events never contribute values (the reference ignores their fields).
    overlays = []
    for f in field_cols:
        tagged = F.when(
            is_starter & F.col(f).isNotNull(),
            F.struct(
                F.col("_lifetime").alias("lt"),
                F.col("_idx").alias("idx"),
                F.col(f).alias("v"),
            ),
        )
        m = F.max(tagged).over(w_run)
        overlays.append(
            F.when(m["lt"] == F.col("_lifetime"), m["v"]).alias(f)
        )

    next_op = F.col("_next_op")
    out = df.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("block_range_start"),
        # next starter or DELETE closes the version; next FINAL (or
        # nothing) leaves it open.  A next CREATE here is the tolerated
        # create-on-live path (the reference treats it as FATAL,
        # processor.go:238-241 — validate_ops reports it): it must close
        # the previous version at its block exactly like UPDATE, matching
        # the sequential reference_fold and the streaming state folds
        # (found by the r9 cross-engine CSV differential: duplicate ids
        # in a synthesized log made the window emit open-range rows the
        # fold closed).
        F.when(
            next_op.isin(OP_CREATE, OP_UPDATE, OP_DELETE),
            F.col("_next_block"),
        ).alias("block_range_end"),
        # block whose processing emits this row (bundle routing): the closing
        # event's block for superseded rows, the FINAL block for finalized
        # rows, NULL for end-of-log flush rows.
        F.col("_next_block").alias("emit_block"),
        *( [F.col("_lifetime").alias("lifetime")] if keep_lifetime else [] ),
        *overlays,
        op.alias("_op"),
    ).where(F.col("_op").isin(OP_CREATE, OP_UPDATE)).drop("_op")

    return out


def immutable_rows(
    changes: DataFrame,
    field_cols: Sequence[str] | None = None,
    id_col: str = "id",
    block_col: str = "block_num",
    op_col: str = "operation",
) -> DataFrame:
    """Immutable-entity layout: every CREATE (and tolerated UPDATE) emits
    immediately with ``block$ = block_num``; FINAL is ignored, DELETE is
    invalid (ref processor.go:247-252, 256-266, 285-287, 299-301).

    Pure projection + filter — no shuffle at all.
    """
    if field_cols is None:
        field_cols = [c for c in changes.columns if c not in META_COLS]
    return changes.where(F.col(op_col).isin(OP_CREATE, OP_UPDATE)).select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("block$"),
        *[F.col(f) for f in field_cols],
    )


def validate_ops(
    changes: DataFrame,
    id_col: str = "id",
    block_col: str = "block_num",
    seq_col: str = "seq",
    op_col: str = "operation",
) -> DataFrame:
    """Operation-sequence violations the reference treats as fatal
    (processor.go:238-241 CREATE on a live id; :288-293 DELETE on an unseen
    id; :285-287 DELETE on an immutable entity is the caller's check).
    Returns (id, block_num, operation, issue) — empty means clean; strict
    callers raise when non-empty, tolerant callers proceed exactly like
    scd2_versions does (which mirrors the reference's tolerated paths).

    Same single id-window as scd2_versions — no extra shuffle shape.
    """
    op = F.col(op_col)
    w_prev = (
        Window.partitionBy(id_col)
        .orderBy(block_col, seq_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lifetime = F.coalesce(
        F.sum(F.when(op.isin(OP_DELETE, OP_FINAL), F.lit(1))).over(w_prev),
        F.lit(0),
    )
    staged = changes.withColumn("_lt", lifetime)
    # latest lifetime that has a starter before this row; the id is live
    # iff that equals the current lifetime (no terminator in between)
    started = F.max(
        F.when(op.isin(OP_CREATE, OP_UPDATE), F.col("_lt"))
    ).over(w_prev)
    live = F.coalesce(started == F.col("_lt"), F.lit(False))
    issue = (
        F.when((op == OP_CREATE) & live, F.lit("create_on_live"))
        .when((op == OP_DELETE) & ~live, F.lit("delete_unseen"))
    )
    return (
        staged.withColumn("_issue", issue)
        .where(F.col("_issue").isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.col(block_col).alias("block_num"),
            op.alias("operation"),
            F.col("_issue").alias("issue"),
        )
    )


def state_at_block(
    versions: DataFrame,
    block: int,
    start_col: str = "block_range_start",
    end_col: str = "block_range_end",
) -> DataFrame:
    """graph-node's primary read: entity state as-of a block —
    ``block_range @> B`` i.e. ``start <= B < end`` with NULL end open.
    On bundle-partitioned storage the start predicate prunes files; at most
    one version per id matches (the ranges partition each lifetime)."""
    return versions.where(
        (F.col(start_col) <= F.lit(block))
        & (F.col(end_col).isNull() | (F.col(end_col) > F.lit(block)))
    )


def validate_changes(
    changes: DataFrame,
    not_null_fields: Sequence[str],
    id_col: str = "id",
    block_col: str = "block_num",
    seq_col: str = "seq",
    op_col: str = "operation",
) -> DataFrame:
    """Validation report: lifetime-STARTING events (CREATE, or UPDATE on an
    unseen id — the tolerated-create path) missing a non-nullable field.

    Matches the reference exactly: CREATE validates the event
    (processor.go:243-245), UPDATE-on-unseen validates the event
    (:267-271), but UPDATE on a live id validates only the accumulated
    previous state (:276-278) — partial update events are legal.
    """
    op = F.col(op_col)
    w_prev = (
        Window.partitionBy(id_col)
        .orderBy(block_col, seq_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lifetime = F.coalesce(
        F.sum(F.when(op.isin(OP_DELETE, OP_FINAL), F.lit(1))).over(w_prev),
        F.lit(0),
    )
    staged = changes.withColumn("_lt", lifetime)
    started = F.max(
        F.when(op.isin(OP_CREATE, OP_UPDATE), F.col("_lt"))
    ).over(w_prev)
    live = F.coalesce(started == F.col("_lt"), F.lit(False))
    is_starter = (op == OP_CREATE) | ((op == OP_UPDATE) & ~live)
    checks = F.array_compact(
        F.array(*[F.when(F.col(f).isNull(), F.lit(f)) for f in not_null_fields])
    )
    return (
        staged.withColumn("_starter", is_starter)  # window expr: not in WHERE
        .withColumn("missing_fields", checks)
        .where(F.col("_starter") & (F.size("missing_fields") > 0))
        .select(id_col, block_col, op_col, "missing_fields")
    )
