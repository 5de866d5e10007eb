"""Bucketed-edges A/B for graph_pagerank (r10 verdict item 3).

graph_pagerank is the bench's largest line (8.7s sf0.1, 126.5s sf10) and
every one of its five power iterations joins the SAME edge relation on
the SAME node key — exactly the shape the bucketed layout exists for.
This script materializes the derived edge relation (distinct
orders x lineitem pairs, long-encoded, both directions) ONCE, then runs
``pagerank_ppm`` twice over identical bytes:

  A: edges read from a plain parquet table (status quo physical shape)
  B: edges read from a catalog table bucketed + sorted by ``src``

Both variants run with auto-broadcast DISABLED (at 100 TB the rank side
does not fit an executor; with it enabled AQE broadcasts the
node-cardinality rank frame and hides the exchange this A/B measures).
Reported per variant: min-of-N wall, Exchange count in the final plan,
and full-result md5 (must be identical — the layout changes partitioning,
never rows).  Context for reading the result: within one action the five
identical edge-side exchanges collapse to one + four ReusedExchange, so
the elidable cost is ONE exchange+sort of the edge relation, not five.

Usage: python scripts/pagerank_bucketed_ab.py [sf_dir] [--buckets=N] [--runs=N]
       (default sf_dir: testdata_local/sf1)
"""

from __future__ import annotations

import contextlib
import hashlib
import io
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from substreams_sink_graph_load_spark.session import get_spark

DB = "graft_prab"


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _iteration_probe(src):
    from substreams_sink_graph_load_spark.operators.graph import (
        pagerank_iteration_probe,
    )

    return pagerank_iteration_probe(src)


def _result_md5(df) -> tuple[int, str]:
    rows = sorted(map(lambda r: tuple(str(v) for v in r), df.collect()))
    h = hashlib.md5()
    for r in rows:
        h.update("\x1f".join(r).encode())
    return len(rows), h.hexdigest()


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "testdata_local/sf1"
    buckets, runs = 32, 3
    for a in sys.argv[1:]:
        if a.startswith("--buckets="):
            buckets = int(a.split("=", 1)[1])
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])

    spark = get_spark(
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "-1"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    from substreams_sink_graph_load_spark.operators.graph import pagerank_ppm

    # The edge relation exactly as plans.queries.graph_pagerank consumes
    # it (single source of truth; parquet derivation forced)
    from substreams_sink_graph_load_spark.plans.queries import pagerank_edges

    edges = pagerank_edges(spark, sf_dir, allow_bucketed=False)

    loc = os.path.abspath(os.path.join(".tmp", "prab_wh"))
    shutil.rmtree(loc, ignore_errors=True)
    spark.sql(f"DROP DATABASE IF EXISTS {DB} CASCADE")
    spark.sql(f"CREATE DATABASE {DB} LOCATION '{loc}'")

    t0 = time.perf_counter()
    edges.write.format("parquet").mode("overwrite").saveAsTable(
        f"{DB}.edges_plain"
    )
    t_plain = time.perf_counter() - t0
    t0 = time.perf_counter()
    edges.write.format("parquet").mode("overwrite").bucketBy(
        buckets, "src"
    ).sortBy("src").saveAsTable(f"{DB}.edges_bucketed")
    t_bucketed = time.perf_counter() - t0
    n_edges = spark.table(f"{DB}.edges_plain").count()
    print(
        f"# edges={n_edges:,}  write plain={t_plain:.1f}s  "
        f"bucketed({buckets})={t_bucketed:.1f}s"
    )

    results = {}
    for variant, table in [("plain", "edges_plain"), ("bucketed", "edges_bucketed")]:
        walls = []
        for r in range(runs):
            src = spark.table(f"{DB}.{table}")
            t0 = time.perf_counter()
            out = pagerank_ppm(src, iterations=5, damping_pct=85)
            n, md5 = _result_md5(out)
            walls.append(time.perf_counter() - t0)
            if r == 0:
                plan = _explain(_iteration_probe(src))
                nex = len(re.findall(r"\(\d+\) Exchange\b", plan))
                results[variant] = {"rows": n, "md5": md5, "iter_exchanges": nex}
            spark.catalog.clearCache()
        results[variant]["walls"] = [round(w, 2) for w in walls]
        results[variant]["wall_min"] = round(min(walls), 2)
        print(f"{variant}: {results[variant]}", flush=True)

    assert results["plain"]["md5"] == results["bucketed"]["md5"], results
    print(
        f"# PARITY OK ({results['plain']['rows']} rows); "
        f"bucketed/plain wall ratio = "
        f"{results['bucketed']['wall_min'] / results['plain']['wall_min']:.2f}"
    )


if __name__ == "__main__":
    main()
