"""Bucketed-layout end-to-end audit (PLANS.md evidence for the
write-once-shuffle-never claim).

Builds the registry bucketed layout (plans/bucketing.registry_layout:
documents by doc_id, embeddings by vec_id, events by user_id) for the
given sf_dir, then runs the id-join family twice — plain parquet vs
bucketed catalog tables (SPARK_GRAFT_BUCKETED_DB) — with broadcast joins
disabled (at 100 TB neither join side fits an executor), and reports per
query:

- Exchange count in the formatted physical plan, both layouts
- result parity: sorted-row md5 over the full output, both layouts

Usage: python scripts/bucketed_audit.py [sf_dir] [--buckets N]
       (default sf_dir: testdata_local/sf1)
"""

from __future__ import annotations

import contextlib
import hashlib
import io
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from substreams_sink_graph_load_spark.session import get_spark

AUDIT = [
    "embedding_drift_by_source",
    "dsir_importance",
    "sessions_attribution",
    "events_sessionize",
    "split_leakage_safe",
    # served from the DERIVED bucketed edge relation (pagerank_edges by
    # src); its final plan is a checkpoint scan, so its Exchange count is
    # taken from the iteration probe instead (see below)
    "graph_pagerank",
    # served from the DERIVED fitted IVF-PQ index members (annivfpq_*):
    # the bucketed run skips the inline seed-collect + Lloyd fit + encode
    # (~60% of the cold sf1 wall, r11 phase breakdown) and its probe
    # filter lands as PartitionFilters on the cell-partitioned codes scan
    "ann_ivf_pq_topk",
]

DB = "graft_bucketed_audit"


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _exchanges(plan: str) -> int:
    # formatted mode: one "(n) Exchange" detail entry per physical node
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def _result_md5(df) -> tuple[int, str]:
    rows = sorted(map(lambda r: tuple(str(v) for v in r), df.collect()))
    h = hashlib.md5()
    for r in rows:
        h.update("\x1f".join(r).encode())
    return len(rows), h.hexdigest()


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "testdata_local/sf1"
    buckets = 32
    for a in sys.argv[1:]:
        if a.startswith("--buckets="):
            buckets = int(a.split("=", 1)[1])

    os.environ.pop("SPARK_GRAFT_BUCKETED_DB", None)
    # the audit session carries the layout BUILD (now including the sf10
    # IVF-PQ fit/encode) plus every query twice; under the 8g default the
    # r12 sf10 run exhausted execution memory caching pagerank's edges
    # (36 SparkOutOfMemoryErrors).  Same lever as bench.py: a 32-thread
    # local JVM doing sf10 work needs the bigger heap.
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark()
    from substreams_sink_graph_load_spark.plans import QUERIES
    from substreams_sink_graph_load_spark.plans.bucketing import (
        registry_layout,
    )

    loc = os.path.abspath(os.path.join(".tmp", "bucketed_audit_wh"))
    print(f"# building bucketed layout for {sf_dir} ({buckets} buckets)")
    t0 = time.perf_counter()
    spark.sql(f"DROP DATABASE IF EXISTS {DB} CASCADE")
    # a crashed prior run can leave the managed-table location behind
    # after the metastore entry is gone — saveAsTable then refuses with
    # LOCATION_ALREADY_EXISTS
    import shutil

    shutil.rmtree(loc, ignore_errors=True)
    registry_layout(spark, sf_dir, DB, loc, buckets=buckets)
    print(f"# layout built in {time.perf_counter() - t0:.1f}s")

    # at target scale no join side broadcasts; disable so the audit shows
    # the co-located plan, not a small-SF broadcast artifact
    for k in (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ):
        spark.conf.set(k, "-1")

    def _probe_exchanges(name: str) -> int:
        """graph_pagerank's final plan is an eager-checkpoint scan, so
        count the ITERATED shape's Exchanges via the shared probe over
        the edges the current layout serves.  ``spark.sql.shuffle.
        partitions`` is pinned to the bucket count for the probe (and
        restored) — the deployment recipe pairs them; with a mismatched
        session value the rank side's shuffle produces a different
        partitioning and Spark re-shuffles one join side (+1 Exchange),
        a sizing artifact tests/test_plan_shapes.py documents, not the
        layout's shape."""
        if name != "graph_pagerank":
            return -1
        from substreams_sink_graph_load_spark.operators.graph import (
            pagerank_iteration_probe,
        )
        from substreams_sink_graph_load_spark.plans import queries as Q

        Q._BUCKETED_SF.clear()
        saved = spark.conf.get("spark.sql.shuffle.partitions", None)
        try:
            spark.conf.set("spark.sql.shuffle.partitions", str(buckets))
            return _exchanges(
                _explain(
                    pagerank_iteration_probe(Q.pagerank_edges(spark, sf_dir))
                )
            )
        finally:
            if saved is None:
                spark.conf.unset("spark.sql.shuffle.partitions")
            else:
                spark.conf.set("spark.sql.shuffle.partitions", saved)

    ok = True
    for name in AUDIT:
        fn = QUERIES[name]
        os.environ.pop("SPARK_GRAFT_BUCKETED_DB", None)
        plain_df = fn(spark, sf_dir)
        plain_ex = (
            _probe_exchanges(name)
            if name == "graph_pagerank"
            else _exchanges(_explain(plain_df))
        )
        t0 = time.perf_counter()
        plain_n, plain_h = _result_md5(plain_df)
        plain_t = time.perf_counter() - t0
        spark.catalog.clearCache()

        os.environ["SPARK_GRAFT_BUCKETED_DB"] = DB
        buck_df = fn(spark, sf_dir)
        buck_ex = (
            _probe_exchanges(name)
            if name == "graph_pagerank"
            else _exchanges(_explain(buck_df))
        )
        t0 = time.perf_counter()
        buck_n, buck_h = _result_md5(buck_df)
        buck_t = time.perf_counter() - t0
        spark.catalog.clearCache()

        match = (plain_n, plain_h) == (buck_n, buck_h)
        ok = ok and match
        print(
            f"{name}: exchanges {plain_ex} -> {buck_ex}, "
            f"rows {plain_n}, hash {'MATCH' if match else 'MISMATCH'}, "
            f"wall {plain_t:.1f}s -> {buck_t:.1f}s"
        )
    os.environ.pop("SPARK_GRAFT_BUCKETED_DB", None)
    print("parity OK" if ok else "PARITY FAILURE")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
