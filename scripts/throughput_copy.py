"""COPY-vs-batched-INSERT injection throughput — measuring the reference's
one published performance claim ("10-100x faster injection" via COPY,
ref README.md:7; inject_csv.go:278-289) against this engine's sink.

Fixture: scripts/throughput_tocsv.synthesize at the given SF -> tocsv ->
bundled version CSVs (the exact inject input).  A throwaway PostgreSQL
server is initdb'd on a unix socket (the test_postgres_live pattern),
then the same rows load twice:

- COPY    — sinks.postgres.inject_csv_files (COPY FROM STDIN per file,
            measured at 1 connection and at the sink's pooled default).
- INSERT  — the JDBC-style strawman: multi-row INSERT VALUES batches
            (500 rows/statement) on one connection inside one
            transaction (executeBatch with autocommit off).

Row counts and content checksums must match between the two loads
(unquoted-empty -> NULL mirrors COPY's CSV semantics via FORCE_NOT_NULL
on the same columns the sink forces).

Usage: python scripts/throughput_copy.py [sf_dir]   (default sf0.01)
"""

import csv
import io
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from throughput_tocsv import synthesize

# throughput_tocsv.SDL minus the never-set nullable array/string columns:
# the reference renders an absent nullable field as the literal string
# ``NULL`` (writer.go:233), which COPY rejects for an array column
# (malformed array literal) — the reference has the same constraint, so
# the injection benchmark uses the columns the fixture actually sets.
SDL = """
type Position @entity {
  id: ID!
  owner: String!
  qty: BigInt!
  price: BigDecimal!
}
"""

from substreams_sink_graph_load_spark.schema.entities import parse_schema_file
from substreams_sink_graph_load_spark.session import get_spark
from substreams_sink_graph_load_spark.sinks.ddl import create_table_ddl
from substreams_sink_graph_load_spark.sinks.postgres import (
    force_not_null_columns,
    inject_csv_files,
    list_candidate_files,
    run_sql,
    validate_csv_header,
)
from substreams_sink_graph_load_spark.tocsv import tocsv


def _server_cmd(cmd: str) -> subprocess.CompletedProcess:
    if os.getuid() == 0:
        return subprocess.run(
            ["su", "postgres", "-c", cmd], cwd="/tmp",
            capture_output=True, text=True,
        )
    return subprocess.run(cmd, shell=True, capture_output=True, text=True)


def _start_server(base: str) -> str:
    data = os.path.join(base, "data")
    if os.getuid() == 0:
        shutil.chown(base, "postgres")
    r = _server_cmd(f"initdb -D {data} -E UTF8 --no-sync -A trust")
    if r.returncode != 0:
        raise RuntimeError(f"initdb failed: {r.stderr[-300:]}")
    r = _server_cmd(
        f"pg_ctl -D {data} -o '-k {base} -h \"\"' -l {base}/pg.log -w start"
    )
    if r.returncode != 0:
        raise RuntimeError(f"pg_ctl start failed: {r.stderr[-300:]}")
    return f"host={base} dbname=postgres user=postgres"


def _stop_server(base: str) -> None:
    _server_cmd(f"pg_ctl -D {os.path.join(base, 'data')} -m immediate -w stop")


def _lit(v: str | None) -> str:
    if v is None:
        return "NULL"
    return "'" + v.replace("'", "''") + "'"


def _insert_batched(
    dsn: str, files: list[str], table_sql: str, columns: list[str],
    fnn: set[str], batch: int = 500,
) -> int:
    """One psql process, one transaction, multi-row INSERT statements —
    the executeBatch shape.  Unquoted-empty-means-NULL cannot be
    recovered from csv.reader, so empty maps to NULL except on the
    FORCE_NOT_NULL columns, which is exactly what COPY loads."""
    proc = subprocess.Popen(
        ["psql", dsn, "-v", "ON_ERROR_STOP=1", "-X", "-q"],
        stdin=subprocess.PIPE, stdout=subprocess.DEVNULL,
        stderr=subprocess.PIPE,
    )
    assert proc.stdin is not None
    w = io.TextIOWrapper(proc.stdin, encoding="utf-8")
    w.write("BEGIN;\n")
    cols_sql = ", ".join(f'"{c}"' for c in columns)
    n = 0
    vals: list[str] = []

    def flush():
        nonlocal vals
        if vals:
            w.write(
                f"INSERT INTO {table_sql} ({cols_sql}) VALUES "
                + ",".join(vals) + ";\n"
            )
            vals = []

    for path in files:
        with open(path, newline="") as fh:
            rdr = csv.reader(fh)
            next(rdr)  # header
            for row in rdr:
                vals.append(
                    "(" + ",".join(
                        _lit(v if (v != "" or c in fnn) else None)
                        for c, v in zip(columns, row)
                    ) + ")"
                )
                n += 1
                if len(vals) >= batch:
                    flush()
    flush()
    w.write("COMMIT;\n")
    w.flush()
    w.close()
    proc.wait()
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr.read().decode(errors="replace"))
    return n


def _checksum(dsn: str, table_sql: str) -> tuple:
    rows = run_sql(
        dsn,
        f"SELECT count(*), coalesce(sum(hashtext(id)), 0), "
        f"coalesce(sum(lower(block_range)), 0), "
        f"coalesce(sum(length(owner)), 0) FROM {table_sql}",
    )
    return rows[0]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="copy-throughput", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="copy_throughput_", dir="/tmp")
    dsn = _start_server(tmp)
    work = tempfile.mkdtemp(prefix="copy_throughput_csv_")
    try:
        jsonl_dir = os.path.join(work, "jsonl")
        n_events, stop_block = synthesize(spark, sf_dir, jsonl_dir, 1000)
        schema_file = os.path.join(work, "schema.graphql")
        with open(schema_file, "w") as fh:
            fh.write(SDL)
        dest = os.path.join(work, "csv")
        tocsv(spark, jsonl_dir, dest, "position", schema_file,
              stop_block=stop_block, bundle_size=1000)
        files = list_candidate_files(
            os.path.join(dest, "position"), 0, stop_block
        )
        desc = parse_schema_file(schema_file)["position"]
        columns = validate_csv_header(files[0], desc)
        fnn = set(force_not_null_columns(desc))
        n_rows = sum(
            max(sum(1 for _ in open(f)) - 1, 0) for f in files
        )
        print(f"fixture: {n_rows} version rows in {len(files)} CSV files",
              flush=True)

        run_sql(dsn, 'CREATE SCHEMA IF NOT EXISTS "sgd1"')
        table_sql = '"sgd1"."position"'
        results = {}
        sums = {}
        for name, loader in [
            ("copy_pool1", lambda: inject_csv_files(
                spark, files, dsn, "sgd1", "position", desc, pool_conns=1)),
            ("copy_pool4", lambda: inject_csv_files(
                spark, files, dsn, "sgd1", "position", desc, pool_conns=4)),
            ("insert_batched", lambda: _insert_batched(
                dsn, files, table_sql, columns, fnn)),
        ]:
            run_sql(dsn, f"DROP TABLE IF EXISTS {table_sql}")
            run_sql(dsn, create_table_ddl(desc, "sgd1"))
            t0 = time.monotonic()
            loader()
            dt = time.monotonic() - t0
            got = run_sql(dsn, f"SELECT count(*) FROM {table_sql}")
            assert got == [(str(n_rows),)], (name, got, n_rows)
            sums[name] = _checksum(dsn, table_sql)
            results[name] = {
                "sec": round(dt, 2), "rows_per_sec": round(n_rows / dt)
            }
            print(f"{name}: {dt:.2f}s ({n_rows / dt:,.0f} rows/s)", flush=True)

        assert sums["copy_pool1"] == sums["insert_batched"], sums
        speedup = (
            results["insert_batched"]["sec"] / results["copy_pool1"]["sec"]
        )
        print(json.dumps({
            "metric": "copy_vs_insert_throughput",
            "sf_dir": sf_dir,
            "rows": n_rows,
            "copy_speedup_over_insert_1conn": round(speedup, 1),
            **{f"{k}_{m}": v for k, r in results.items()
               for m, v in r.items()},
        }))
    finally:
        _stop_server(tmp)
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
