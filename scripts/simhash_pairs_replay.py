"""Independent heavy-SF check for ``simhash_hamming_pairs``.

The registry oracle is the TRUE quadratic Hamming scan — the point of the
cross-algorithm differential — which DuckDB evaluates fine through sf1
(50k docs, 1.25e9 pair tests) but not at sf10 (500k docs, 1.25e11).  This
replay keeps the signature derivation cross-engine — the 60-bit SimHash
per doc comes from DuckDB via the shipped ``dedup_simhash`` oracle CTE
over the same parquet — and replaces only the pair enumeration with an
independent numpy implementation of the SAME pigeonhole theorem the Spark
plan relies on (4 disjoint 15-bit bands; Hamming<=3 implies >=1 equal
band), verified exactly: candidates from band-value grouping, exact
popcount(xor) filter, compared as a set against the Spark registry query.
The replay itself is validated at sf0.01/sf1, where the Spark query
already hash-MATCHes the quadratic DuckDB oracle, so replay==Spark there
pins replay==oracle transitively.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/simhash_pairs_replay.py
       SPARK_GRAFT_SF_DIR=... python scripts/simhash_pairs_replay.py --recall

``--recall`` checks ``minhash_recall_eval`` the same way: its oracle
embeds the same quadratic SimHash truth CTE, so at sf10 the truth pairs
come from this replay's numpy banding, the Jaccard annotation runs in
DuckDB over the BOUNDED truth pair set only, and the MinHash candidate
side is the shipped (sf10-tractable, banded) dedup_minhash_pairs oracle
— every non-replayed piece stays cross-engine.
"""

from __future__ import annotations

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np

import __spark_entry__ as entry_mod
from substreams_sink_graph_load_spark.plans.queries import _SIMHASH_CTE_SQL
from substreams_sink_graph_load_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# the sf10 recall run builds ~0.5 GB of gram-array join state; the test
# default 8g heap dies building a broadcast there (observed:
# notEnoughMemoryToBuildAndBroadcastTableError at sf10) — match bench.py
os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")


def popcount64(x: np.ndarray) -> np.ndarray:
    """SWAR popcount for uint64 arrays (numpy<2 has no bitwise_count).
    The multiply wraps mod 2^64 by design — that IS the algorithm."""
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    with np.errstate(over="ignore"):
        return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


def replay_pairs(ids: np.ndarray, sims: np.ndarray) -> set[tuple[int, int, int]]:
    """Banded candidate generation + exact popcount filter, numpy/python."""
    out: set[tuple[int, int, int]] = set()
    for band in range(4):
        buckets: dict[int, list[int]] = defaultdict(list)
        vals = (sims >> (15 * band)) & 0x7FFF
        for idx, v in enumerate(vals):
            buckets[int(v)].append(idx)
        for members in buckets.values():
            if len(members) < 2:
                continue
            m = np.asarray(members)
            sub = sims[m]
            for i in range(len(m) - 1):
                ham = popcount64(np.bitwise_xor(sub[i + 1 :], sub[i]))
                for j in np.nonzero(ham <= 3)[0]:
                    a, b = int(ids[m[i]]), int(ids[m[i + 1 + j]])
                    if a > b:
                        a, b = b, a
                    out.add((a, b, int(ham[j])))
    return out


def main_recall() -> int:
    t0 = time.time()
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    sig = con.execute(
        f"WITH {_SIMHASH_CTE_SQL} SELECT doc_id, simhash FROM sim"
    ).df()
    ids = sig["doc_id"].to_numpy(np.int64)
    sims = sig["simhash"].to_numpy(np.int64).astype(np.uint64)
    truth = replay_pairs(ids, sims)
    print(f"truth replay: {len(truth)} pairs ({time.time() - t0:.1f}s)")

    con.execute(
        "create table truth(doc_a bigint, doc_b bigint, hamming bigint)"
    )
    con.executemany(
        "insert into truth values (?, ?, ?)", [list(t) for t in truth]
    )
    from substreams_sink_graph_load_spark.plans.queries import (
        ORACLES as _OR,
        _GRAMS2_SQL,
    )

    want_df = con.execute(f"""
        WITH cand AS ({_OR["dedup_minhash_pairs"]}),
        g AS (SELECT doc_id, grams, len(grams) AS n_grams FROM {_GRAMS2_SQL}),
        tj AS (
          SELECT t.doc_a, t.doc_b, t.hamming,
                 cast(floor(1000000.0 * len(list_intersect(ga.grams, gb.grams))
                      / (ga.n_grams + gb.n_grams
                         - len(list_intersect(ga.grams, gb.grams)))) AS bigint)
                   AS jaccard_ppm
          FROM truth t
          JOIN g ga ON ga.doc_id = t.doc_a
          JOIN g gb ON gb.doc_id = t.doc_b)
        SELECT tj.doc_a, tj.doc_b, tj.hamming, tj.jaccard_ppm,
               cast(coalesce(c.n_shared_bands, 0) AS bigint) AS n_shared_bands,
               cast(CASE WHEN c.doc_a IS NULL THEN 0 ELSE 1 END AS bigint)
                 AS found
        FROM tj LEFT JOIN cand c
          ON c.doc_a = tj.doc_a AND c.doc_b = tj.doc_b
    """).df()
    want = set(map(tuple, want_df.itertuples(index=False)))
    print(f"annotated: {len(want)} rows ({time.time() - t0:.1f}s)")

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"], r["jaccard_ppm"],
         r["n_shared_bands"], r["found"])
        for r in entry_mod.queries()["minhash_recall_eval"](
            spark, SF_DIR
        ).collect()
    }
    ok = got == want
    print(f"spark: {len(got)} rows — {'MATCH' if ok else 'MISMATCH'} "
          f"({time.time() - t0:.1f}s total)")
    if not ok:
        print("only-spark:", sorted(got - want)[:3])
        print("only-replay:", sorted(want - got)[:3])
    return 0 if ok else 1


def main() -> int:
    t0 = time.time()
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    sig = con.execute(
        f"WITH {_SIMHASH_CTE_SQL} SELECT doc_id, simhash FROM sim"
    ).df()
    ids = sig["doc_id"].to_numpy(np.int64)
    sims = sig["simhash"].to_numpy(np.int64).astype(np.uint64)
    want = replay_pairs(ids, sims)
    print(f"replay: {len(want)} pairs from {len(ids)} sigs "
          f"({time.time() - t0:.1f}s)")

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in entry_mod.queries()["simhash_hamming_pairs"](
            spark, SF_DIR
        ).collect()
    }
    ok = got == want
    print(f"spark: {len(got)} pairs — {'MATCH' if ok else 'MISMATCH'} "
          f"({time.time() - t0:.1f}s total)")
    if not ok:
        print("only-spark:", sorted(got - want)[:5])
        print("only-replay:", sorted(want - got)[:5])
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(
        main_recall() if sys.argv[1:] == ["--recall"] else main()
    )
