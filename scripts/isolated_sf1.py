#!/usr/bin/env python
"""Isolated quiet-host min-of-N re-timer for sf1 adjudications.

The adjudication standard (PLANS.md r10-late, reaffirmed by the r10
verdict): on a session-long-loaded VM, only min-of-runs records and
isolated re-times are evidence — single-pass ratios from inside a
147-query sweep are not.  This script IS the isolated re-time: one
fresh JVM, the bench's exact measurement method (noop sink so every
output column materializes, clearCache between runs, System.gc between
passes), N runs per query, printed as one JSON line per query.

Usage:
  python scripts/isolated_sf1.py [--sf-dir DIR] [--runs N] q1 q2 ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument(
        "--sf-dir",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "testdata_local",
            "sf1",
        ),
    )
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    from substreams_sink_graph_load_spark.session import get_spark
    from substreams_sink_graph_load_spark.plans import QUERIES

    spark = get_spark(app_name="isolated_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    # same warm-up as bench.py: JVM + parquet footers + Python workers
    QUERIES["sort_limit_top10"](spark, args.sf_dir).collect()
    spark.range(1000).repartition(64).mapInPandas(
        lambda it: it, "id long"
    ).count()

    for name in args.queries:
        walls: list[float] = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            QUERIES[name](spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        print(
            json.dumps(
                {
                    "query": name,
                    "sf_dir": args.sf_dir,
                    "runs": walls,
                    "min": min(walls),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
