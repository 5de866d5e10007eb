"""Uniform forced-projection wall probe for the PLANS.md sf10 table.

The r9 sf10 walls table mixed probe methods — count() probes let Catalyst
prune terminal projections and unused expressions (substring_remove's
kept_md5, the eval frames' array_intersect never executed), while
collect() probes pay ~30s of pure driver transfer on a 10M-row output.
One method for every row (r10 verdict item 2):

    df.agg(sum(xxhash64(*all_output_columns)))

xxhash64 consumes every output column's value (arrays included), so no
terminal projection can be pruned, and the driver receives ONE row — the
probe measures plan cost, not harness cost.  The hash sum is printed so a
re-run on identical data can assert the probed computation didn't change.

Usage:
    python scripts/sf10_walls.py [--sf DIR] [--runs N] [--cpus N] query...
Defaults: --sf testdata_local/sf10, --runs 3 (min-of-N reported), 32 cores.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from substreams_sink_graph_load_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testdata_local", "sf10"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from substreams_sink_graph_load_spark.plans import QUERIES

    spark = get_spark(
        master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict] = {}
    for name in args.queries:
        fn = QUERIES[name]
        walls, hashes = [], []
        for _ in range(args.runs):
            t0 = time.monotonic()
            df = fn(spark, args.sf)
            row = df.agg(
                # bit_xor: order-insensitive, cannot overflow under ANSI
                F.bit_xor(F.xxhash64(*df.columns)).alias("h"),
                F.count(F.lit(1)).alias("n"),
            ).collect()[0]
            walls.append(time.monotonic() - t0)
            hashes.append(row["h"])
            spark.catalog.clearCache()
        assert len(set(hashes)) == 1, (name, hashes)
        out[name] = {
            "wall_min": round(min(walls), 2),
            "walls": [round(w, 2) for w in walls],
            "rows": row["n"],
            "probe_hash": row["h"],
        }
        print(f"{name}: {out[name]}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
