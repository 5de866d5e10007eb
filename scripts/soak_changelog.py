#!/usr/bin/env python
"""Changelog-checkpointing soak: crash-resume parity + maintenance lever
(r10 verdict item 6).

The changelog default shipped measured on 21 clean triggers of sf0.1
with byte-identical output.  Before it carries the production label
through r11, this soak runs the TWS path LONGER (sf1-scale change-log,
~100 triggers), kills the driver MID-STREAM with SIGKILL, resumes from
the checkpoint, and asserts the final bundled CSV is byte-identical to
a clean snapshot-mode run.  It also measures whether background
snapshots actually bound changelog replay length on restart — the
``spark.sql.streaming.stateStore.maintenanceInterval`` lever — by
timing the resumed run's first trigger at the default (60s) and a
short (5s) interval.

Three runs over one synthesized fixture:

  A. clean, changelog OFF (snapshot mode)      -> digest + wall dist
  B. SIGKILL mid-run + resume, changelog ON, maintenanceInterval=60s
  C. SIGKILL mid-run + resume, changelog ON, maintenanceInterval=5s
  D. cross-format upgrade: checkpoint CREATED snapshot-mode, SIGKILLed,
     resumed under the changelog default (`--only=cross_format`)

Assert all digests equal.  Per run, a
StreamingQueryListener appends every progress event to
``<workdir>/progress.jsonl`` so the parent can report trigger-wall
distribution and the resume's first-trigger (state reload + replay)
time.

Usage: python scripts/soak_changelog.py [sf_dir] [--bundle=1000]
           [--per-trigger=1] [--kill-after=SECONDS]
       python scripts/soak_changelog.py --child <tag> <tmp> <changelog>
           <maintenance>          (internal: one run_stream execution)
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHANGELOG_CONF = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)
MAINT_CONF = "spark.sql.streaming.stateStore.maintenanceInterval"


def _digest_csv(d_out: str) -> str:
    dig = hashlib.sha256()
    for fn in sorted(os.listdir(d_out)):
        dig.update(fn.encode())
        with open(os.path.join(d_out, fn), "rb") as fh:
            dig.update(fh.read())
    return dig.hexdigest()


def child(tag: str, tmp: str, changelog: str, maintenance: str) -> None:
    """One run_stream execution with a progress-logging listener; safe
    to SIGKILL — everything durable lives in the checkpoint."""
    from pyspark.sql.streaming import StreamingQueryListener

    from substreams_sink_graph_load_spark.session import get_spark
    from substreams_sink_graph_load_spark.streaming.run import run_stream

    per_trigger = int(os.environ.get("SOAK_PER_TRIGGER", "1"))
    spark = get_spark(app_name=f"soak_{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(CHANGELOG_CONF, changelog)
    spark.conf.set(MAINT_CONF, maintenance)

    workdir = os.path.join(tmp, f"work_{tag}")
    progress_path = os.path.join(tmp, f"progress_{tag}.jsonl")

    class Capture(StreamingQueryListener):
        def onQueryStarted(self, event):
            with open(progress_path, "a") as fh:
                fh.write(json.dumps({"started_at": time.time()}) + "\n")

        def onQueryProgress(self, event):
            p = json.loads(event.progress.json)
            row = {
                "at": time.time(),
                "rows": p.get("numInputRows", 0),
                "durationMs": p.get("durationMs", {}),
            }
            ops = p.get("stateOperators") or []
            if ops:
                row["allUpdatesTimeMs"] = ops[0].get("allUpdatesTimeMs")
                row["commitTimeMs"] = ops[0].get("commitTimeMs")
            with open(progress_path, "a") as fh:
                fh.write(json.dumps(row) + "\n")

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    spark.streams.addListener(Capture())
    with open(os.path.join(tmp, "meta.json")) as fh:
        meta = json.load(fh)
    run_stream(
        spark,
        meta["jsonl_dir"],
        os.path.join(tmp, f"csv_{tag}"),
        "position",
        meta["schema_file"],
        stop_block=meta["stop_block"],
        bundle_size=meta["bundle"],
        max_files_per_trigger=per_trigger,
        stateful="tws",
        workdir=workdir,
    )
    spark.stop()


def _spawn(tag: str, tmp: str, changelog: str, maintenance: str):
    return subprocess.Popen(
        [
            sys.executable,
            os.path.abspath(__file__),
            "--child",
            tag,
            tmp,
            changelog,
            maintenance,
        ],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.STDOUT,
        start_new_session=True,
    )


def _run(
    tag: str,
    tmp: str,
    changelog: str,
    maintenance: str,
    kill_after: float | None,
    resume_changelog: str | None = None,
) -> dict:
    """Run to completion, optionally SIGKILLing the first attempt.

    ``resume_changelog`` lets the resume attempt flip the changelog conf
    — the cross-FORMAT resume case (a snapshot-mode checkpoint resumed
    under the changelog default, i.e. what any pre-r10 deployment hits
    on upgrade)."""
    t0 = time.monotonic()
    killed = False
    if kill_after is not None:
        p = _spawn(tag, tmp, changelog, maintenance)
        time.sleep(kill_after)
        if p.poll() is None:
            os.killpg(p.pid, signal.SIGKILL)
            killed = True
            print(f"# {tag}: SIGKILL after {kill_after:.0f}s", flush=True)
        else:
            print(f"# {tag}: finished before the kill window", flush=True)
        p.wait()
    resume_t0 = time.monotonic()
    p = _spawn(tag, tmp, resume_changelog or changelog, maintenance)
    rc = p.wait()
    assert rc == 0, f"{tag}: resume run failed rc={rc}"
    wall = time.monotonic() - t0

    # parse the progress log: trigger walls via addBatch, split around
    # the resume boundary (the second started_at marker).  ALL progress
    # events count as triggers — `numInputRows` is unreliable here (the
    # metrics layer attributes every file-source row to batch 0 under
    # this TWS plan even though the checkpoint's source log proves
    # maxFilesPerTrigger admission split the files 1-per-batch), so
    # rows-based filtering would collapse the run to "one trigger".
    starts, rows = [], []
    with open(os.path.join(tmp, f"progress_{tag}.jsonl")) as fh:
        for line in fh:
            d = json.loads(line)
            if "started_at" in d:
                starts.append(d["started_at"])
            elif d.get("durationMs"):
                rows.append(d)
    add = sorted(r["durationMs"].get("addBatch", 0) / 1e3 for r in rows)
    n = len(add)
    resume_first = None
    # split the progress rows around the resume boundary so the row
    # counts report the killed attempt and the resume SEPARATELY — the
    # resume replays input the killed attempt already consumed, so a
    # single summed "rows" double-counts the replayed span
    resume_rows = rows
    killed_rows: list[dict] = []
    if killed and len(starts) >= 2:
        resume_rows = [r for r in rows if r["at"] > starts[-1]]
        killed_rows = [r for r in rows if r["at"] <= starts[-1]]
        if resume_rows:
            resume_first = round(
                resume_rows[0]["durationMs"].get("addBatch", 0) / 1e3, 1
            )
    out = {
        "tag": tag,
        "changelog": changelog,
        "resume_changelog": resume_changelog or changelog,
        "maintenance": maintenance,
        "killed_mid_run": killed,
        "triggers": n,
        "rows_resume": sum(r["rows"] for r in resume_rows),
        "rows_killed_attempt": sum(r["rows"] for r in killed_rows),
        "addBatch_p50": round(add[n // 2], 1) if n else None,
        "addBatch_p90": round(add[int(n * 0.9)], 1) if n else None,
        "addBatch_max": round(add[-1], 1) if n else None,
        "resume_first_trigger_sec": resume_first,
        "total_wall_sec": round(wall, 1),
        "resume_wall_sec": round(time.monotonic() - resume_t0, 1),
        "csv_digest": _digest_csv(os.path.join(tmp, f"csv_{tag}", "position")),
    }
    print(json.dumps(out), flush=True)
    return out


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3], sys.argv[4], sys.argv[5])
        return

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "testdata_local/sf1"
    bundle, per_trigger, kill_after = 1000, 1, 240.0
    only = None
    keep_fixture = False
    for a in sys.argv[1:]:
        if a.startswith("--bundle="):
            bundle = int(a.split("=", 1)[1])
        if a.startswith("--per-trigger="):
            per_trigger = int(a.split("=", 1)[1])
        if a.startswith("--kill-after="):
            kill_after = float(a.split("=", 1)[1])
        if a.startswith("--only="):
            only = a.split("=", 1)[1].split(",")
        if a == "--keep-fixture":
            keep_fixture = True
    os.environ["SOAK_PER_TRIGGER"] = str(per_trigger)

    tmp = os.path.abspath(os.path.join(".tmp", "soak_changelog"))
    if not (keep_fixture and os.path.exists(os.path.join(tmp, "meta.json"))):
        from throughput_tocsv import SDL, synthesize

        from substreams_sink_graph_load_spark.session import get_spark

        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        spark = get_spark(app_name="soak_synth")
        spark.sparkContext.setLogLevel("ERROR")
        jsonl_dir = os.path.join(tmp, "jsonl")
        n_events, stop_block = synthesize(spark, sf_dir, jsonl_dir, bundle)
        d = os.path.join(jsonl_dir, "position")
        base_t = time.time()
        for i, fn in enumerate(sorted(os.listdir(d))):
            os.utime(os.path.join(d, fn), (base_t + i, base_t + i))
        schema_file = os.path.join(tmp, "schema.graphql")
        with open(schema_file, "w") as fh:
            fh.write(SDL)
        with open(os.path.join(tmp, "meta.json"), "w") as fh:
            json.dump(
                {
                    "jsonl_dir": jsonl_dir,
                    "schema_file": schema_file,
                    "stop_block": stop_block,
                    "bundle": bundle,
                },
                fh,
            )
        n_files = len(os.listdir(d))
        print(f"# fixture: {n_events:,} events, {n_files} files", flush=True)
        spark.stop()

    plan = {
        "snapshot_clean": lambda: _run(
            "snapshot_clean", tmp, "false", "60s", kill_after=None
        ),
        "changelog_m60": lambda: _run(
            "changelog_m60", tmp, "true", "60s", kill_after=kill_after
        ),
        "changelog_m5": lambda: _run(
            "changelog_m5", tmp, "true", "5s", kill_after=kill_after
        ),
        # upgrade path: checkpoint CREATED in snapshot mode, SIGKILLed,
        # resumed under the changelog default (the conf every pre-r10
        # checkpoint meets on upgrade — r10 advice item 4)
        "cross_format": lambda: _run(
            "cross_format",
            tmp,
            "false",
            "60s",
            kill_after=kill_after,
            resume_changelog="true",
        ),
    }
    runs = [fn() for tag, fn in plan.items() if only is None or tag in only]
    digests = {r["tag"]: r["csv_digest"] for r in runs}
    ok = len(set(digests.values())) == 1
    print(f"# digest parity: {'OK' if ok else 'FAILURE'} {digests}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
