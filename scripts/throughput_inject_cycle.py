"""Full inject cycle: index drop -> COPY -> parallel index recreate,
measured against COPY with the indexes left in place (r10 verdict item 5).

The reference's injection speed rests on TWO legs: COPY instead of
INSERT (measured in scripts/throughput_copy.py) and the
drop/recreate-indexes-around-the-load strategy (ref README.md:103-140;
drop-indexes.go:69-96; create-indexes.go:114-156 with 10 parallel
connections, postgres/utils.go:11).  This script measures the second leg
with this engine's own DDL surface (sinks/ddl.py): same fixture as the
COPY benchmark (synthesized change-log -> tocsv -> bundled version CSVs),
one table, a graph-node-shaped index set — a GiST on (id, block_range)
whose name carries the protected ``block_range_excl`` marker (never
dropped, ref drop-indexes.go:79) plus one BTree per attribute column
(the droppable majority graph-node creates per attribute).

Variants (row counts + checksums asserted identical):

  indexed_copy — CREATE indexes, then COPY into the indexed table.
  cycle        — CREATE indexes, extract -> drop non-protected ->
                 COPY -> recreate over N parallel connections
                 (ddl.create_index_sql lanes, one psql each).

Usage: python scripts/throughput_inject_cycle.py [sf_dir] [--lanes=N]
       (default sf0.1 — ~1.4M version rows; lanes default 10, the
       reference's MAX_CONNECTIONS)
"""

import json
import os
import subprocess
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from throughput_copy import SDL, _checksum, _start_server, _stop_server
from throughput_tocsv import synthesize

from substreams_sink_graph_load_spark.schema.entities import parse_schema_file
from substreams_sink_graph_load_spark.session import get_spark
from substreams_sink_graph_load_spark.sinks.ddl import (
    create_index_sql,
    create_table_ddl,
    drop_index_sql,
    extract_index_sql,
)
from substreams_sink_graph_load_spark.sinks.postgres import (
    inject_csv_files,
    list_candidate_files,
    run_sql,
)
from substreams_sink_graph_load_spark.tocsv import tocsv

# Graph-node-shaped index set for the Position entity: the protected
# exclusion-constraint-style GiST plus one attr BTree per column.
# (btree_gist supplies the text opclass for the composite GiST, the same
# extension graph-node's block_range exclusion constraints rely on.)
EXTENSION_DDL = "CREATE EXTENSION IF NOT EXISTS btree_gist"
INDEX_DDL = [
    'CREATE INDEX position_block_range_excl ON "sgd1"."position" '
    "USING gist (id, block_range)",
    'CREATE INDEX attr_0_owner ON "sgd1"."position" USING btree (owner)',
    'CREATE INDEX attr_1_qty ON "sgd1"."position" USING btree (qty)',
    'CREATE INDEX attr_2_price ON "sgd1"."position" USING btree (price)',
    'CREATE INDEX attr_3_id ON "sgd1"."position" USING btree (id)',
]


def _psql_lane(dsn: str, stmts: list[str]) -> None:
    p = subprocess.run(
        ["psql", dsn, "-v", "ON_ERROR_STOP=1", "-X", "-q"],
        input=";\n".join(stmts) + ";\n",
        capture_output=True,
        text=True,
    )
    if p.returncode != 0:
        raise RuntimeError(p.stderr[-500:])


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    lanes_n = 10
    for a in sys.argv[1:]:
        if a.startswith("--lanes="):
            lanes_n = int(a.split("=", 1)[1])

    spark = get_spark(app_name="inject-cycle", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="inject_cycle_", dir="/tmp")
    dsn = _start_server(tmp)
    work = tempfile.mkdtemp(prefix="inject_cycle_csv_")
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
        n_rows = sum(max(sum(1 for _ in open(f)) - 1, 0) for f in files)
        print(f"fixture: {n_rows} version rows in {len(files)} CSV files",
              flush=True)

        run_sql(dsn, 'CREATE SCHEMA IF NOT EXISTS "sgd1"')
        run_sql(dsn, EXTENSION_DDL)
        table_sql = '"sgd1"."position"'
        results: dict[str, dict] = {}
        sums = {}

        for variant in ["indexed_copy", "cycle"]:
            run_sql(dsn, f"DROP TABLE IF EXISTS {table_sql}")
            run_sql(dsn, create_table_ddl(desc, "sgd1"))
            for ddl in INDEX_DDL:
                run_sql(dsn, ddl)
            phases: dict[str, float] = {}

            if variant == "cycle":
                t0 = time.monotonic()
                # extract-index / drop-index, the engine's own DDL path
                inv: dict[str, list[str]] = {}
                defs: dict[str, str] = {}
                for tab, name, ddl in run_sql(
                    dsn, extract_index_sql("sgd1")
                ):
                    inv.setdefault(tab, []).append(name)
                    defs[name] = ddl
                drops = drop_index_sql("sgd1", inv, {"position"})
                for stmt in drops:
                    run_sql(dsn, stmt)
                phases["drop"] = time.monotonic() - t0
                dropped = [
                    s.rsplit(".", 1)[-1].strip('"') for s in drops
                ]
                recreate = [defs[n] for n in sorted(dropped)]
                print(f"dropped {len(drops)} indexes "
                      f"(protected kept: "
                      f"{sorted(set(defs) - set(dropped))})", flush=True)

            t0 = time.monotonic()
            inject_csv_files(
                spark, files, dsn, "sgd1", "position", desc, pool_conns=1
            )
            phases["copy"] = time.monotonic() - t0

            if variant == "cycle":
                t0 = time.monotonic()
                threads = [
                    threading.Thread(target=_psql_lane, args=(dsn, lane))
                    for lane in create_index_sql(recreate, lanes_n)
                ]
                for t in threads:
                    t.start()
                for t in threads:
                    t.join()
                phases["recreate"] = time.monotonic() - t0

            total = sum(phases.values())
            got = run_sql(dsn, f"SELECT count(*) FROM {table_sql}")
            assert got == [(str(n_rows),)], (variant, got, n_rows)
            nidx = run_sql(
                dsn,
                "SELECT count(*) FROM pg_indexes WHERE "
                "schemaname='sgd1' AND tablename='position'",
            )
            assert nidx == [(str(len(INDEX_DDL)),)], (variant, nidx)
            sums[variant] = _checksum(dsn, table_sql)
            results[variant] = {
                "phases_sec": {k: round(v, 2) for k, v in phases.items()},
                "total_sec": round(total, 2),
                "rows_per_sec": round(n_rows / total),
            }
            print(f"{variant}: {results[variant]}", flush=True)

        assert sums["indexed_copy"] == sums["cycle"], sums
        print(json.dumps({
            "rows": n_rows,
            "lanes": lanes_n,
            "results": results,
            "cycle_speedup": round(
                results["indexed_copy"]["total_sec"]
                / results["cycle"]["total_sec"], 2
            ),
        }))
    finally:
        _stop_server(tmp)
        spark.stop()


if __name__ == "__main__":
    main()
