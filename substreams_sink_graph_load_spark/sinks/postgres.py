"""Postgres bulk-load sink: the reference's ``inject-csv`` command
(ref cmd/substreams-sink-graph-load/inject_csv.go) as a partition-wise
COPY executor.

The headline trick IS the reference's headline trick: ``COPY ... FROM STDIN
WITH (FORMAT CSV, HEADER, FORCE_NOT_NULL (...))`` per bundled file
(inject_csv.go:278-289) — 10-100x over row INSERTs.  Spark's role is
parallelism and placement: files distribute over executors with
``foreachPartition``, each partition holding one pooled connection
(inject_csv.go:78 uses 2-3; one per task here).

psycopg is not in this container, so the connection step is gated behind an
import-try; everything up to the wire call (file pruning, header validation,
COPY statement assembly, FORCE_NOT_NULL derivation) is pure and tested.
"""

from __future__ import annotations

import csv
import os
import re
from collections.abc import Sequence

from ..schema.entities import EntityDesc

_RANGE_RE = re.compile(r"(\d{10})-(\d{10})")


def force_not_null_columns(desc: EntityDesc) -> list[str]:
    """Non-nullable columns get FORCE_NOT_NULL so empty CSV strings load as
    ``''``/default instead of NULL (ref inject_csv.go:88-106: id + block
    column + every non-nullable field)."""
    cols = ["id", "block$" if desc.immutable else "block_range"]
    cols += sorted(
        f.name for f in desc.ordered_fields()
        if f.name != "id" and not f.nullable
    )
    # dedupe, keep order
    seen: set[str] = set()
    return [c for c in cols if not (c in seen or seen.add(c))]


def build_copy_sql(
    pg_schema: str, table: str, columns: Sequence[str], force_not_null: Sequence[str]
) -> str:
    """The exact COPY shape of inject_csv.go:278-289."""
    collist = ", ".join(f'"{c}"' for c in columns)
    stmt = (
        f'COPY "{pg_schema}"."{table}" ({collist}) FROM STDIN '
        "WITH (FORMAT CSV, HEADER"
    )
    if force_not_null:
        fnn = ", ".join(f'"{c}"' for c in force_not_null)
        stmt += f", FORCE_NOT_NULL ({fnn})"
    return stmt + ")"


def list_candidate_files(
    directory: str, start_block: int, stop_block: int
) -> list[str]:
    """Range-prune bundled CSVs: keep files overlapping [start, stop)
    (ref inject_csv.go:305-327), in block order."""
    out = []
    for fn in sorted(os.listdir(directory)):
        m = _RANGE_RE.search(fn)
        if not m or not fn.endswith(".csv"):
            continue
        s, e = int(m.group(1)), int(m.group(2))
        if e < start_block:
            continue
        if s >= stop_block:
            break
        out.append(os.path.join(directory, fn))
    return out


def validate_csv_header(path: str, desc: EntityDesc) -> list[str]:
    """Read the first file's header; demand the id + block leading columns
    (ref inject_csv.go:203-224).  Returns the column list for COPY."""
    with open(path, newline="") as fh:
        header = next(csv.reader(fh))
    if not header or header[0] != "id":
        raise ValueError(f"first column of {path!r} must be 'id', got {header[:1]}")
    expect = "block$" if desc.immutable else "block_range"
    if len(header) < 2 or header[1] != expect:
        raise ValueError(
            f"second column of {path!r} must be {expect!r}, got {header[1:2]}"
        )
    return header


def inject_csv_files(
    spark,
    files: Sequence[str],
    dsn: str,
    pg_schema: str,
    table: str,
    desc: EntityDesc,
    pool_conns: int = 3,
):
    """Distribute COPY-per-file over executors.

    Each task opens one connection and streams its files through
    ``copy_expert`` — the partition-wise analogue of running N inject
    processes (reference README.md:83-87 parallelizes per entity; we
    parallelize per file batch as well).
    """
    if not files:
        return 0
    columns = validate_csv_header(files[0], desc)
    fnn = force_not_null_columns(desc)
    copy_sql = build_copy_sql(pg_schema, table, columns, fnn)

    def load_partition(paths):
        try:
            import psycopg  # noqa: F401  (not in this container)
        except ImportError as ex:  # pragma: no cover - environment-specific
            raise NotImplementedError(
                "psycopg not installed; install it to inject, or use the "
                "generated COPY statements with psql"
            ) from ex
        import psycopg

        n = 0
        with psycopg.connect(dsn) as conn:  # pragma: no cover
            for p in paths:
                with conn.cursor() as cur, open(p, "rb") as fh:
                    with cur.copy(copy_sql) as cp:
                        while chunk := fh.read(1 << 20):
                            cp.write(chunk)
                n += 1
            conn.commit()
        return [n]

    rdd = spark.sparkContext.parallelize(list(files), min(pool_conns, len(files)))
    return sum(rdd.mapPartitions(load_partition).collect())
