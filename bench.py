#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query runs ``BENCH_RUNS`` times (default 3, full passes so one
query's JIT warm-up never flatters its neighbor); ``queries`` carries the
per-query MIN, ``value`` is the sum of those mins, and ``variance``
records per-pass totals + the worst per-query spread so round-over-round
movement can be judged against run noise.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "q3_shipping_priority",
    "q5_region_revenue",
    "join_broadcast_segments",
    "agg_rollup_orders",
    "window_topk_per_segment",
    "window_running_total",
    "sort_limit_top10",
    "events_sessionize",
    "events_tumbling_hour",
    "scd2_versions",
    "dedup_exact",
    "text_stats",
    "similarity_topk",
    "dedup_minhash",
    "dedup_minhash_pairs",
    "dedup_simhash",
    "token_count",
    "quality_score",
    "dedup_embedding",
    "ann_ivf_topk",
    "ann_topk_matmul",
    "join_asof",
    "join_range",
    # round-2 additions (r1's 25 stay in place for cross-round comparison)
    "q4_order_priority",
    "tfidf_top_terms",
    "dedup_clusters",
    # round-4 additions
    "fuzzy_pairs",
    "split_train_eval",
    "quality_gopher_rules",
    "ngram_counts",
    "contamination_probe",
    "dedup_substring_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from substreams_sink_graph_load_spark.session import get_spark
    from substreams_sink_graph_load_spark.plans import QUERIES

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers + Python UDF workers once so timings
    # measure the queries, not daemon spin-up
    QUERIES["sort_limit_top10"](spark, sf_dir).collect()
    spark.range(1000).repartition(64).mapInPandas(
        lambda it: it, "id long"
    ).count()

    runs = int(os.environ.get("BENCH_RUNS", "3"))
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    pass_totals: list[float] = []
    for r in range(runs):
        pass_total = 0.0
        for name in HEADLINE:
            fn = QUERIES[name]
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            # noop sink materializes every output column (count() would
            # let Catalyst prune the computed expressions away)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            samples[name].append(dt)
            pass_total += dt
            print(f"# run{r + 1} {name}: {dt:.3f}s", file=sys.stderr)
            # operators may persist intermediates (e.g. the LSH sketch
            # across its self-join); drop them so queries don't charge
            # each other rent
            spark.catalog.clearCache()
        pass_totals.append(round(pass_total, 3))

    timings = {name: round(min(ts), 3) for name, ts in samples.items()}
    spreads = {name: max(ts) - min(ts) for name, ts in samples.items()}
    worst = max(spreads, key=spreads.get)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "variance": {
                    "runs": runs,
                    "pass_totals": pass_totals,
                    "worst_query_spread": {
                        "query": worst,
                        "spread_sec": round(spreads[worst], 3),
                    },
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
