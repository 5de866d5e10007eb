"""TWS per-trigger overhead profile (r10 verdict item 6).

The r9 measurement attributed the TWS path's ~4.7s/trigger (vs the
foreachBatch replay's ~2.1s at sf0.1) to per-key state-server roundtrips
by reasoning.  This script confirms or refutes that one level down, two
ways:

Part A — engine-side breakdown from Spark's own streaming metrics: a
StreamingQueryListener captures every trigger's ``durationMs`` map
(addBatch / queryPlanning / commit...) and the state operator's
``allUpdatesTimeMs`` / ``commitTimeMs`` / RocksDB custom metrics across
the SAME run_stream(stateful="tws") run throughput_stream.py times.
``addBatch`` minus the state-store commit/update times is the
Python-worker span (Arrow transfer + per-key protocol roundtrips + the
fold itself).

Part B — a state-roundtrip micro-benchmark: a minimal
transformWithStateInPandas processor times exists()/get()/update()
around a no-op fold, per key, from INSIDE the worker
(perf_counter_ns), over K keys on a rate source.  Multiplying the
median per-key roundtrip cost by keys/trigger bounds how much of the
trigger wall the state protocol alone explains.

Usage: python scripts/profile_tws.py [sf_dir] [files_per_trigger] [n_keys]
    defaults: /root/testdata/sf0.1, 5, 20000
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from throughput_tocsv import SDL, synthesize

from substreams_sink_graph_load_spark.session import get_spark
from substreams_sink_graph_load_spark.streaming.run import run_stream
from substreams_sink_graph_load_spark.streaming.stateful import (
    ROCKSDB_PROVIDER,
)


CHANGELOG_CONF = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)


def part_a(spark, sf_dir: str, per_trigger: int) -> dict:
    from pyspark.sql.streaming import StreamingQueryListener

    progresses: list[dict] = []

    class Capture(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            progresses.append(json.loads(event.progress.json))

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    listener = Capture()
    spark.streams.addListener(listener)
    tmp = tempfile.mkdtemp(prefix="tws_profile_")
    try:
        jsonl_dir = os.path.join(tmp, "jsonl")
        n_events, stop_block = synthesize(spark, sf_dir, jsonl_dir, 1000)
        d = os.path.join(jsonl_dir, "position")
        base_t = time.time()
        for i, fn in enumerate(sorted(os.listdir(d))):
            os.utime(os.path.join(d, fn), (base_t + i, base_t + i))
        schema_file = os.path.join(tmp, "schema.graphql")
        with open(schema_file, "w") as fh:
            fh.write(SDL)
        t0 = time.monotonic()
        run_stream(
            spark, jsonl_dir, os.path.join(tmp, "csv"), "position",
            schema_file, stop_block=stop_block, bundle_size=1000,
            max_files_per_trigger=per_trigger, stateful="tws",
        )
        wall = time.monotonic() - t0
        import hashlib

        dig = hashlib.sha256()
        d_out = os.path.join(tmp, "csv", "position")
        for fn in sorted(os.listdir(d_out)):
            dig.update(fn.encode())
            with open(os.path.join(d_out, fn), "rb") as fh:
                dig.update(fh.read())
    finally:
        spark.streams.removeListener(listener)
        shutil.rmtree(tmp, ignore_errors=True)

    trig = [p for p in progresses if p.get("numInputRows", 0) > 0]
    out = {
        "events": n_events,
        "wall_sec": round(wall, 1),
        "triggers": len(trig),
        "csv_digest": dig.hexdigest(),
    }
    dur_keys = sorted({k for p in trig for k in p.get("durationMs", {})})
    out["durationMs_mean"] = {
        k: round(
            sum(p["durationMs"].get(k, 0) for p in trig) / len(trig), 1
        )
        for k in dur_keys
    }
    ops = [p["stateOperators"][0] for p in trig if p.get("stateOperators")]
    if ops:
        for k in [
            "allUpdatesTimeMs", "allRemovalsTimeMs", "commitTimeMs",
            "numRowsUpdated", "numRowsRemoved", "numStateStoreInstances",
        ]:
            out[f"stateOp_{k}_mean"] = round(
                sum(o.get(k, 0) for o in ops) / len(ops), 1
            )
        cm = sorted({k for o in ops for k in o.get("customMetrics", {})})
        out["rocksdb_mean"] = {
            k: round(
                sum(o["customMetrics"].get(k, 0) for o in ops) / len(ops), 1
            )
            for k in cm
            if any(o["customMetrics"].get(k, 0) for o in ops)
        }
    return out


def part_b(spark, n_keys: int) -> dict:
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class RoundtripProbe(StatefulProcessor):
        def init(self, handle) -> None:
            self._s = handle.getValueState("v", "a long, b string")

        def handleInputRows(self, key, rows, timerValues):
            t0 = time.perf_counter_ns()
            if self._s.exists():
                self._s.get()
            t1 = time.perf_counter_ns()
            self._s.update((1, "x" * 64))
            t2 = time.perf_counter_ns()
            n = sum(len(p) for p in rows)
            yield pd.DataFrame(
                {
                    "id": [key[0]],
                    "get_us": [(t1 - t0) / 1e3],
                    "update_us": [(t2 - t1) / 1e3],
                    "rows": [n],
                }
            )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            return iter(())

        def close(self) -> None:
            pass

    src = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", n_keys)
        .option("numBatches", 2)
        .load()
        .withColumn("id", (F.col("value") % n_keys).cast("string"))
    )
    probed = src.groupBy("id").transformWithStateInPandas(
        RoundtripProbe(),
        outputStructType="id string, get_us double, update_us double, rows long",
        outputMode="append",
        timeMode="none",
    )
    ckpt = tempfile.mkdtemp(prefix="tws_probe_ckpt_")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    t0 = time.monotonic()
    q = (
        probed.writeStream.format("memory")
        .queryName("tws_probe")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.monotonic() - t0
    pdf = spark.table("tws_probe").toPandas()
    shutil.rmtree(ckpt, ignore_errors=True)
    qs = pdf[["get_us", "update_us"]].quantile([0.5, 0.99])
    return {
        "keys": int(len(pdf)),
        "wall_sec": round(wall, 1),
        "get_us_p50": round(float(qs.loc[0.5, "get_us"]), 1),
        "get_us_p99": round(float(qs.loc[0.99, "get_us"]), 1),
        "update_us_p50": round(float(qs.loc[0.5, "update_us"]), 1),
        "update_us_p99": round(float(qs.loc[0.99, "update_us"]), 1),
        "sum_state_sec": round(
            float((pdf["get_us"] + pdf["update_us"]).sum() / 1e6), 2
        ),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    per_trigger = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    n_keys = int(sys.argv[3]) if len(sys.argv) > 3 else 20000
    spark = get_spark(app_name="tws-profile", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    a = part_a(spark, sf_dir, per_trigger)
    print("part_a (snapshot checkpointing):", json.dumps(a), flush=True)
    # The breakdown's dominant commit cost is the per-trigger RocksDB
    # snapshot zip + file sync; changelog checkpointing is Spark 4's
    # lever for exactly that (commit appends a changelog, snapshots
    # happen in the background maintenance thread).
    spark.conf.set(CHANGELOG_CONF, "true")
    a2 = part_a(spark, sf_dir, per_trigger)
    print("part_a (changelog checkpointing):", json.dumps(a2), flush=True)
    assert a["csv_digest"] == a2["csv_digest"], "output diverged"
    spark.conf.unset(CHANGELOG_CONF)
    b = part_b(spark, n_keys)
    print("part_b:", json.dumps(b), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
