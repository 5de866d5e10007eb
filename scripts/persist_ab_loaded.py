"""Loaded-executor lazy-vs-eager persist A/B (r13 item 6).

The r12 A/B measured the LSH persists' lazy fill beating an eager
count() fill on 13/15 queries — on an idle-core host, where the lazy
path's duplicated first-action work hides in spare capacity.  The r12
verdict (item 5) asked for the same measurement with NO idle cores.

This probe emulates full utilization: Spark at local[8]
(SPARK_GRAFT_CPUS=8) while a 24-process busy-loop burner saturates the
other cores, so duplicated stage work must displace real work.  One
fresh JVM per (state, round), states interleaved ABAB within the same
host window (the only methodology that survives this host's bursty
steal — see scripts/ab_probe.py).

Usage:
  python scripts/persist_ab_loaded.py probe <lazy|eager> [query ...]
      (single sample, prints one JSON line; called by the driver loop)
  python scripts/persist_ab_loaded.py run [rounds]
      (spawns the burner, loops probe lazy / probe eager, prints table)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES_AB = [
    "dedup_minhash_pairs",      # sk2 persist (minhash_candidate_pairs)
    "minhash_precision_eval",   # same persist, eval consumer
    "dedup_ngram_jaccard",      # gram-table persist (ngram_jaccard_pairs)
    "dedup_substring_stats",    # winnow fingerprint persist
    "dedup_clusters",           # pair persist feeding the CC fixpoint
]

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def probe(state: str, names: list[str]) -> None:
    if state == "eager":
        os.environ["SPARK_GRAFT_EAGER_PERSIST"] = "1"
    else:
        os.environ.pop("SPARK_GRAFT_EAGER_PERSIST", None)
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "12g")
    from substreams_sink_graph_load_spark.plans import QUERIES
    from substreams_sink_graph_load_spark.session import get_spark

    spark = get_spark(app_name=f"persist_ab_{state}")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["sort_limit_top10"](spark, SF_DIR).collect()  # warmup
    out = {}
    for name in names or QUERIES_AB:
        t0 = time.perf_counter()
        QUERIES[name](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        out[name] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
    print("ABPERSIST " + json.dumps({"state": state, "q": out}), flush=True)


def _burn(n: int):
    procs = []
    code = "x=0\nwhile True: x = (x*1103515245+12345) % 2**31"
    for _ in range(n):
        procs.append(
            subprocess.Popen([sys.executable, "-c", code])
        )
    return procs


def run(rounds: int) -> None:
    burners = _burn(24)
    print(f"# burner: 24 busy processes (pids {[p.pid for p in burners[:3]]}...)",
          file=sys.stderr)
    try:
        for r in range(rounds):
            for state in ("lazy", "eager"):
                subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "probe", state],
                    check=False,
                )
    finally:
        for p in burners:
            p.kill()


if __name__ == "__main__":
    if sys.argv[1] == "probe":
        probe(sys.argv[2], sys.argv[3:])
    else:
        run(int(sys.argv[2]) if len(sys.argv) > 2 else 3)
