"""Time every registry query at sf0.01 (driver-shaped execution: collect()).

Prints one JSON object {name: seconds} sorted ascending, for choosing the
registry export order (cheap-first so a budgeted driver verifies the most).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from substreams_sink_graph_load_spark.plans import QUERIES

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    for name, fn in QUERIES.items():
        t0 = time.monotonic()
        try:
            rows = fn(spark, SF_DIR).collect()
            timings[name] = round(time.monotonic() - t0, 3)
            print(f"{name}: {timings[name]}s ({len(rows)} rows)", flush=True)
        except Exception as exc:  # noqa: BLE001
            timings[name] = -1.0
            print(f"{name}: FAIL {exc}", flush=True)
        spark.catalog.clearCache()
    print(json.dumps(dict(sorted(timings.items(), key=lambda kv: kv[1]))))


if __name__ == "__main__":
    main()
