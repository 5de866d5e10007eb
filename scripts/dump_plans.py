"""Dump .explain('formatted') for registry queries to plans/<dir>/<q>_<tag>.txt.

Usage: python scripts/dump_plans.py <dir> <tag> <query> [query ...]
e.g.   python scripts/dump_plans.py plans/r12 before fuzzy_pairs graph_pagerank
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from substreams_sink_graph_load_spark.session import get_spark
from substreams_sink_graph_load_spark.plans import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main(out_dir: str, tag: str, names: list[str]) -> None:
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_exch = plan.count("Exchange")
        print(f"{name}: {path} ({n_exch} Exchange mentions)")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3:])
