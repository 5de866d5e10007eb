"""Streaming state-engine throughput: the SAME bundled-JSONL fixture
(scripts/throughput_tocsv.synthesize) driven through run_stream twice —
once per state engine — so the numbers are directly comparable:

- ``replay``  — foreachBatch (state ⊎ batch) window replay: each trigger
  re-folds the accumulated open state, O(open-state) per trigger.
- ``tws``     — transformWithStateInPandas on the RocksDB store: the
  per-id fold is incremental, O(batch) per trigger, opens recovered via
  the statestore reader at the end.

Both engines must produce byte-identical bundled CSV (asserted here and
pinned by tests/test_streaming.py); the interesting number is events/s
as the trigger count grows — the replay engine's per-trigger cost grows
with history, the TWS engine's does not.

Usage: python scripts/throughput_stream.py [sf_dir] [files_per_trigger] [state_partitions]
    defaults: /root/testdata/sf0.01, 5, engine default
    state_partitions sizes the TWS state operator (RocksDB instances /
    Python state workers maintained per trigger) — the local-mode lever.
"""

import hashlib
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


def _dir_digest(dest: str, entity: str) -> str:
    h = hashlib.sha256()
    d = os.path.join(dest, entity)
    for fn in sorted(os.listdir(d)):
        h.update(fn.encode())
        with open(os.path.join(d, fn), "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    per_trigger = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    state_parts = int(sys.argv[3]) if len(sys.argv) > 3 else None
    spark = get_spark(app_name="stream-throughput", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="stream_throughput_")
    try:
        jsonl_dir = os.path.join(tmp, "jsonl")
        n_events, stop_block = synthesize(spark, sf_dir, jsonl_dir, 1000)
        # the source contract (T1) is block-ordered delivery: give the
        # bundle files ascending mtimes in block order so the file stream
        # replays them in sequence (synthesize writes them in one job
        # with effectively identical mtimes, which makes the delivery
        # order ambiguous — not a shape either engine is specified for)
        d = os.path.join(jsonl_dir, "position")
        base_t = time.time()
        for i, fn in enumerate(sorted(os.listdir(d))):
            os.utime(os.path.join(d, fn), (base_t + i, base_t + i))
        schema_file = os.path.join(tmp, "schema.graphql")
        with open(schema_file, "w") as fh:
            fh.write(SDL)
        n_files = len(os.listdir(os.path.join(jsonl_dir, "position")))
        print(
            f"fixture: {n_events} events, {n_files} bundle files, "
            f"{per_trigger} files/trigger "
            f"(~{(n_files + per_trigger - 1) // per_trigger} triggers)",
            flush=True,
        )

        results = {}
        digests = {}
        for engine in ("replay", "tws"):
            dest = os.path.join(tmp, f"csv_{engine}")
            t0 = time.monotonic()
            run_stream(
                spark,
                jsonl_dir,
                dest,
                "position",
                schema_file,
                stop_block=stop_block,
                bundle_size=1000,
                max_files_per_trigger=per_trigger,
                stateful=engine,
                state_partitions=state_parts if engine == "tws" else None,
            )
            dt = time.monotonic() - t0
            results[engine] = {
                "sec": round(dt, 2),
                "events_per_sec": round(n_events / dt),
            }
            digests[engine] = _dir_digest(dest, "position")
            print(f"{engine}: {dt:.2f}s ({n_events / dt:,.0f} events/s)",
                  flush=True)

        assert digests["replay"] == digests["tws"], (
            "state engines diverged: " + json.dumps(digests)
        )
        print(
            json.dumps(
                {
                    "metric": "stream_state_engine_throughput",
                    "sf_dir": sf_dir,
                    "events": n_events,
                    "files_per_trigger": per_trigger,
                    "csv_identical": True,
                    **{f"{k}_{m}": v for k, r in results.items()
                       for m, v in r.items()},
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
