#!/usr/bin/env python
"""Measure the per-task h60 memo hit rate under a given entry cap.

The r10 memo consolidation dropped every fold tier's per-task cap from
4M entries to a shared 64 MiB byte budget (~256k entries); the high-hit-
rate claim under the new cap was asserted from Zipf, not measured (r10
advice item 3).  This script measures it EXACTLY: it replays the MinHash
fold's per-task gram stream — documents partitioned into n_tasks
contiguous chunks, per-doc DISTINCT word k-grams in document order,
the identical capped-dict discipline (insert while len < cap, recompute
past it) — and reports per-task distinct grams, hit rate at the capped
size, and hit rate at the old 4M cap, worst task highlighted.

Usage: python scripts/memo_hitrate.py [sf_dir] [--k=2] [--tasks=32]
       [--cap=262144]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stream_stats(texts: list[str], k: int, cap: int) -> dict:
    """Replay the capped-memo discipline over one task's doc stream."""
    cache: set[str] = set()
    hits = misses = 0
    distinct: set[str] = set()
    for t in texts:
        if t is None:
            continue
        toks = t.split(" ")
        if len(toks) < k:
            grams = [t]
        else:
            grams = {" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)}
        for g in grams:
            distinct.add(g)
            if g in cache:
                hits += 1
            else:
                misses += 1
                if len(cache) < cap:
                    cache.add(g)
    total = hits + misses
    return {
        "lookups": total,
        "distinct": len(distinct),
        "hit_rate": round(hits / total, 4) if total else 0.0,
        "capped": len(cache) >= cap,
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "testdata_local/sf1"
    k, tasks, cap = 2, 32, 262144
    for a in sys.argv[1:]:
        if a.startswith("--k="):
            k = int(a.split("=", 1)[1])
        if a.startswith("--tasks="):
            tasks = int(a.split("=", 1)[1])
        if a.startswith("--cap="):
            cap = int(a.split("=", 1)[1])

    import pyarrow.parquet as pq

    texts = (
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
        .column("text")
        .to_pylist()
    )
    n = len(texts)
    per = (n + tasks - 1) // tasks
    worst = None
    for i in range(tasks):
        chunk = texts[i * per : (i + 1) * per]
        if not chunk:
            continue
        s = stream_stats(chunk, k, cap)
        if worst is None or s["hit_rate"] < worst[1]["hit_rate"]:
            worst = (i, s)
    assert worst is not None
    i, s = worst
    s_old = stream_stats(texts[i * per : (i + 1) * per], k, 4_000_000)
    print(
        f"docs={n} tasks={tasks} k={k} cap={cap}\n"
        f"worst task {i}: lookups={s['lookups']:,} distinct={s['distinct']:,}"
        f" capped={s['capped']}\n"
        f"hit_rate @cap={cap//1024}k: {s['hit_rate']:.4f}\n"
        f"hit_rate @cap=4M:    {s_old['hit_rate']:.4f}\n"
        f"recompute-rate delta: {s_old['hit_rate'] - s['hit_rate']:.4f}"
    )


if __name__ == "__main__":
    main()
