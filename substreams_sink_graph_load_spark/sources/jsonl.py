"""JSONL change-log scan + typed extraction.

The intermediate wire format (ref bundler/encoder.go:16-25, layout per
csvprocessor/entity.go:126-139) is one JSON object per line:

    {"entity_change": {"entity": "...", "id": "...", "operation": N,
                       "fields": [{"name": "...",
                                   "new_value": {"Typed": {<Key>: <val>}}}]},
     "block_num": N}

where ``<Key>`` is one of ``String_ Int32 Bigint Bigdecimal Bytes Boolean
Float Array`` and Array wraps ``{"value": [{"Typed": {<Key>: <val>}}, ...]}``
(entity.go:87-114).

Spark-first: we give ``from_json`` the complete explicit struct schema (never
inferred — matching the reference, which declares schema in GraphQL), so the
whole decode stays JVM-side.  Event order within a file is captured from the
line's byte offset; with the reference's strictly block-ordered bundle files,
``(bundle_start, offset)`` is a stable total order -> the ``seq`` column
SURVEY §2.3 requires (monotonically_increasing_id would NOT survive re-reads).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema.entities import EntityDesc, Field, FieldType, TYPED_KEY
from ..schema.normalize import normalize_field

_SCALAR_TYPED = T.StructType(
    [
        T.StructField("String_", T.StringType()),
        T.StructField("Int32", T.IntegerType()),
        T.StructField("Bigint", T.StringType()),
        T.StructField("Bigdecimal", T.StringType()),
        T.StructField("Bytes", T.StringType()),  # std base64, decoded at extract
        T.StructField("Boolean", T.BooleanType()),
        T.StructField("Float", T.DoubleType()),
    ]
)

_TYPED = T.StructType(
    list(_SCALAR_TYPED.fields)
    + [
        T.StructField(
            "Array",
            T.StructType(
                [
                    T.StructField(
                        "value",
                        T.ArrayType(
                            T.StructType([T.StructField("Typed", _SCALAR_TYPED)])
                        ),
                    )
                ]
            ),
        )
    ]
)

CHANGE_JSON_SCHEMA = T.StructType(
    [
        T.StructField(
            "entity_change",
            T.StructType(
                [
                    T.StructField("entity", T.StringType()),
                    T.StructField("id", T.StringType()),
                    T.StructField("operation", T.IntegerType()),
                    T.StructField(
                        "fields",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("name", T.StringType()),
                                    T.StructField(
                                        "new_value",
                                        T.StructType(
                                            [T.StructField("Typed", _TYPED)]
                                        ),
                                    ),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        ),
        T.StructField("block_num", T.LongType()),
    ]
)


def read_change_jsonl(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """Scan bundled JSONL files into raw change rows with a stable ``seq``.

    ``path`` may contain globs (``<dir>/<entity>/*.jsonl``).  The text source
    is used (not ``spark.read.json``) so we can carry the per-file byte
    offset as the intra-file order — JSON inference is avoided entirely.
    """
    raw = spark.read.text(path).select(
        F.col("value"),
        F.col("_metadata.file_path").alias("_file"),
        F.col("_metadata.file_block_start").alias("_bstart"),
    )
    return parse_change_lines(raw)


def parse_change_lines(raw: DataFrame) -> DataFrame:
    """Parse (value, _file) text rows into typed change rows with a stable
    per-file line order.  Shared by the batch scan and the streaming
    ``foreachBatch`` path (each microbatch is a plain batch DataFrame here).
    """
    # _bstart (_metadata.file_block_start) anchors the ordering when one
    # file spans multiple scan splits: monotonically_increasing_id is only
    # ordered WITHIN a split, and relying on Spark's internal split
    # enumeration order across splits of the same file would be an
    # undocumented invariant.  (_bstart, _mid) is documented-stable: splits
    # are byte ranges, ids ascend within each.
    bstart = (
        F.col("_bstart") if "_bstart" in raw.columns else F.lit(0).cast("long")
    )
    raw = raw.select(
        "value",
        "_file",
        bstart.alias("_bstart"),
        # generated during the scan in row order per partition; the text
        # source emits each split's lines in byte order, so ordering by
        # (_bstart, _mid) *within a file* recovers the exact line number.
        F.monotonically_increasing_id().alias("_mid"),
    )
    w = Window.partitionBy("_file").orderBy("_bstart", "_mid")
    parsed = raw.select(
        F.from_json("value", CHANGE_JSON_SCHEMA).alias("j"),
        F.col("_file"),
        F.row_number().over(w).alias("_line_no"),
    )
    return parsed.select(
        F.col("j.block_num").alias("block_num"),
        F.col("j.entity_change.entity").alias("entity"),
        F.col("j.entity_change.id").alias("id"),
        F.col("j.entity_change.operation").alias("operation"),
        F.col("j.entity_change.fields").alias("fields"),
        F.col("_file"),
        F.col("_line_no"),
    ).withColumn(
        # global stable order: (block_num, line order within its file);
        # bundle files are disjoint block ranges, so this totals correctly.
        "seq",
        F.col("_line_no").cast("long"),
    )


def parse_change_lines_stream(raw: DataFrame) -> DataFrame:
    """:func:`parse_change_lines` for a fully-STREAMING text source, where
    the per-file ``row_number`` window is unsupported (and so is
    ``monotonically_increasing_id`` — neither runs on a streaming
    DataFrame).  The dense ``_line_no`` is replaced by the pair
    ``(seq, sub_seq)``: ``seq = _bstart`` is the scan split's byte offset
    within its file, and ``sub_seq`` is a per-scan-partition running row
    index assigned by an Arrow-batched ``mapInPandas`` stage (rows
    iterate a file split in byte order, and a (file, split) pair lives in
    exactly one scan partition, so the counter ascends in line order
    wherever it is ever compared).  ``(block_num, seq, sub_seq)`` then
    totals event order exactly like ``(block_num, line_no)`` does — a
    block never spans files, and within a file the split offset then the
    in-split index recover byte order.  Values are non-dense (ordering
    keys, not line numbers), which the TWS fold only ever sorts by."""
    import pandas as pd  # noqa: F401 (mapInPandas batch type)

    bstart = (
        F.col("_bstart") if "_bstart" in raw.columns else F.lit(0).cast("long")
    )
    src = raw.select("value", bstart.alias("seq"))

    def _number(batches):
        i = 0
        for pdf in batches:
            pdf = pdf.assign(sub_seq=range(i, i + len(pdf)))
            i += len(pdf)
            yield pdf

    numbered = src.mapInPandas(
        _number, "value string, seq long, sub_seq long"
    )
    parsed = numbered.select(
        F.from_json("value", CHANGE_JSON_SCHEMA).alias("j"),
        "seq",
        "sub_seq",
    )
    return parsed.select(
        F.col("j.block_num").alias("block_num"),
        F.col("j.entity_change.entity").alias("entity"),
        F.col("j.entity_change.id").alias("id"),
        F.col("j.entity_change.operation").alias("operation"),
        F.col("j.entity_change.fields").alias("fields"),
        F.col("seq"),
        F.col("sub_seq"),
    )


def _candidates(f: Field, originals: list[str]) -> list[str]:
    """Event field names arrive un-normalized (camelCase).  The reference
    normalizes then matches (entity.go:60-64); we match the schema's
    ORIGINAL spelling (authoritative — snake_case round-trips can't
    reconstruct acronym names like volumeUSD), the normalized form, any
    caller-supplied originals, and the common lowerCamel reconstruction."""
    cands = {f.name}
    if f.original:
        cands.add(f.original)
    cands.update(o for o in originals if normalize_field(o) == f.name)
    # common lowerCamel reconstruction: tx_count -> txCount
    parts = f.name.split("_")
    cands.add(parts[0] + "".join(p.title() for p in parts[1:]))
    return sorted(cands)


def _extract_field(f: Field, originals: list[str]) -> Column:
    """Projection extracting one declared field from the fields array,
    per the declared type's discriminant key (entity.go:66-121)."""
    key = TYPED_KEY[f.type]
    cands = F.array(*[F.lit(c) for c in _candidates(f, originals)])
    entry = F.try_element_at(
        F.filter("fields", lambda x: F.array_contains(cands, x["name"])), F.lit(1)
    )
    if f.array:
        arr = entry["new_value"]["Typed"]["Array"]
        elems = F.transform(arr["value"], lambda e: e["Typed"][key])
        if f.type == FieldType.BYTES:
            elems = F.transform(elems, F.unbase64)
        # absent "value" key on a present Array field -> empty array
        # (entity.go:98-101)
        value = F.when(arr.isNotNull(), F.coalesce(elems, F.array()))
    else:
        v = entry["new_value"]["Typed"][key]
        value = F.unbase64(v) if f.type == FieldType.BYTES else v
    return value.alias(f.name)


def typed_extract(
    changes: DataFrame,
    desc: EntityDesc,
    originals: list[str] | None = None,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Flatten raw change rows into one typed column per declared field.

    NULL column == field absent from the event (drives the SCD-2 overlay).
    ``extra_cols`` passes ordering/metadata columns through untouched
    (e.g. the streaming chain's ``sub_seq`` tiebreaker).
    """
    originals = originals or []
    fields = [f for f in desc.ordered_fields() if f.name != "id"]
    return changes.select(
        "block_num",
        "seq",
        "id",
        "operation",
        *(extra_cols or []),
        *[_extract_field(f, originals) for f in fields],
    )


def parse_bundle_ranges(df: DataFrame) -> DataFrame:
    """Parse ``NNNNNNNNNN-NNNNNNNNNN`` block ranges out of ``_file`` paths
    (ref csvprocessor/processor.go:340-351)."""
    base = F.element_at(F.split(F.col("_file"), "/"), -1)
    return df.withColumn(
        "bundle_start", F.regexp_extract(base, r"(\d{10})-(\d{10})", 1).cast("long")
    ).withColumn(
        "bundle_end", F.regexp_extract(base, r"(\d{10})-(\d{10})", 2).cast("long")
    )


def check_contiguity(
    filenames: list[str],
    stop_block: int | None = None,
    require_coverage: bool = False,
) -> list[str]:
    """Contiguity check over the bundle *file listing* (empty bundle files
    count): each file must start at the previous file's end + 1; files
    starting at/after the stop block are cut off (ref csvprocessor/
    processor.go:109-152).  Returns the files to load, in block order.

    ``require_coverage=True`` additionally demands the listing reach
    ``stop_block``: the reference errors out when the input falls short
    (processor.go:145-146 ``entities do not cover the full range``) — its
    end-of-log flush guard (processor.go:168) is therefore only ever
    reached with full coverage, so flush rows never materialize for a
    truncated input there.

    Driver-side on purpose — it's a metadata walk, exactly like the
    reference's ``inputStore.Walk``; O(#files), no data touched.
    """
    ranged = []
    for fn in filenames:
        m = re.search(r"(\d{10})-(\d{10})", os.path.basename(fn))
        if not m:
            raise ValueError(f"fail reading block range in {fn!r}")
        ranged.append((int(m.group(1)), int(m.group(2)), fn))
    ranged.sort()
    out, prev_end = [], None
    for start, end, fn in ranged:
        if stop_block is not None and start >= stop_block:
            break
        if prev_end is not None and start != prev_end + 1:
            raise ValueError(
                f"broken file contiguity at {fn!r} (previous range end was {prev_end})"
            )
        prev_end = end
        out.append(fn)
    if require_coverage and stop_block is not None:
        covered_to = -1 if prev_end is None else prev_end
        if covered_to + 1 < stop_block:
            first = out[0] if out else "<none>"
            raise ValueError(
                f"entities do not cover the full range ({first!r} -> "
                f"{covered_to + 1}), stop block: {stop_block}"
            )
    return out
