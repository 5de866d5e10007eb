"""Per-stage profile of registry queries: task counts, runtimes, shuffle
bytes — the "which stage is slow and how parallel is it" view the Spark UI
gives, scraped from the REST API so it lands in a terminal.

Usage: python scripts/profile_stages.py <query> [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), PROFILE_RUNS.

For each query: runs it PROFILE_RUNS times (default 2 — first run warms
the JVM; stages of the LAST run are reported), then prints each stage's
wall, task count, and the max task time (a 1-task stage with a large wall
is a serialization point; max >> mean is skew).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from substreams_sink_graph_load_spark.session import get_spark
from substreams_sink_graph_load_spark.plans import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def api(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return json.load(r)


def main(names: list[str]) -> None:
    spark = get_spark(
        app_name="profile_stages", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.sparkContext.uiWebUrl + "/api/v1"
    app_id = spark.sparkContext.applicationId

    # warm daemons like bench.py does
    QUERIES["sort_limit_top10"](spark, SF_DIR).collect()
    spark.range(1000).repartition(64).mapInPandas(lambda it: it, "id long").count()

    runs = int(os.environ.get("PROFILE_RUNS", "2"))
    for name in names:
        fn = QUERIES[name]
        for r in range(runs):
            spark.catalog.clearCache()
            jobs_before = {
                j["jobId"] for j in api(base, f"/applications/{app_id}/jobs")
            }
            spark.sparkContext.setJobDescription(f"profile:{name}:run{r}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
        # stages of the LAST run only
        jobs = [
            j
            for j in api(base, f"/applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        print(f"\n=== {name}: wall {wall:.3f}s, {len(jobs)} jobs, {len(stage_ids)} stages")
        rows = []
        for sid in stage_ids:
            try:
                infos = api(
                    base, f"/applications/{app_id}/stages/{sid}?details=false"
                )
            except Exception:
                continue
            for si in infos:
                if si["status"] == "SKIPPED":
                    rows.append((0.0, sid, 0, 0.0, 0, 0, si["name"], "SKIPPED"))
                    continue
                sub = si.get("submissionTime")
                comp = si.get("completionTime")
                stage_wall = 0.0
                if sub and comp:
                    from datetime import datetime

                    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                    try:
                        stage_wall = (
                            datetime.strptime(comp.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                            - datetime.strptime(sub.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                        ).total_seconds()
                    except ValueError:
                        pass
                rows.append(
                    (
                        stage_wall,
                        sid,
                        si["numCompleteTasks"],
                        si.get("executorRunTime", 0) / 1000.0,
                        si.get("shuffleReadBytes", 0),
                        si.get("shuffleWriteBytes", 0),
                        si["name"].split("\n")[0][:70],
                        si["status"],
                    )
                )
        rows.sort(reverse=True)
        print(f"{'wall_s':>7} {'stage':>5} {'tasks':>5} {'cpu_s':>7} {'shufR':>9} {'shufW':>9}  name")
        for w, sid, nt, cpu, sr, sw, nm, st in rows:
            if st == "SKIPPED":
                print(f"{'skip':>7} {sid:>5} {'-':>5} {'-':>7} {'-':>9} {'-':>9}  {nm}")
            else:
                print(f"{w:7.3f} {sid:>5} {nt:>5} {cpu:7.2f} {sr:>9} {sw:>9}  {nm}")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
