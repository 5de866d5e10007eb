"""ABAB cross-tree probe: time registry queries at sf0.1, bench-shaped.

Settles host-vs-code when a bench line moves against a baseline taken on a
different host day: run this alternately against the current tree and a git
worktree of the comparison commit (fresh JVM per sample, warmup excluded,
noop sink — bench.py methodology), then compare per-state minimums.  The
interleaving puts both states under the same host-steal distribution, which
a cross-day record comparison cannot do.

Usage: python scripts/ab_probe.py <repo_root> <tag> [query ...]
       (default queries: ann_pq_topk ann_ivf_pq_topk q1_pricing_summary)
Prints one line: ABPROBE {"tag":..., "q":{name:[t1,t2]}, "load":[...]}

e.g. the r12 adjudication loop:
  for r in 1 2 3 4; do
    python scripts/ab_probe.py /root/repo head
    python scripts/ab_probe.py /tmp/wt_entry entry
  done
"""
import json
import os
import sys
import time

root = sys.argv[1]
tag = sys.argv[2]
names = sys.argv[3:] or ["ann_pq_topk", "ann_ivf_pq_topk", "q1_pricing_summary"]
sys.path.insert(0, root)
os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from substreams_sink_graph_load_spark.session import get_spark  # noqa: E402
from substreams_sink_graph_load_spark.plans import QUERIES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark(app_name="ab_probe")
spark.sparkContext.setLogLevel("ERROR")
# warmup: JVM + parquet footers + Python workers (same as bench.py)
QUERIES["sort_limit_top10"](spark, SF_DIR).collect()
spark.range(1000).repartition(64).mapInPandas(lambda it: it, "id long").count()

out = {}
for name in names:
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        QUERIES[name](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        ts.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()
    out[name] = ts
load = open("/proc/loadavg").read().split()[:3]
print("ABPROBE " + json.dumps({"tag": tag, "q": out, "load": load}))
spark.stop()
