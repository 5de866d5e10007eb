"""Independent sf10-scale check for ``dedup_clusters`` AND
``split_leakage_safe`` (both consume the same LSH-pair component map;
the latter's recursive-CTE oracle is in the same intractable class).

The registry oracle's recursive CTE computes the full transitive closure
(O(sum of component sizes^2) rows in ``reach``), which is exact but
intractable in DuckDB 1.0 at sf10 boilerplate densities.  This replay
keeps the expensive part cross-engine — the MinHash signatures, banding
and candidate-pair join run in DuckDB from the SAME ``_SIG_CTE_SQL`` the
oracle embeds — and replaces only the pure graph-algebra step with an
independent union-find (min-label components), then compares against the
Spark ``dedup_clusters`` registry query exactly.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/cc_oracle_replay.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry_mod
from substreams_sink_graph_load_spark.plans.queries import _minhash_pairs_sql
from substreams_sink_graph_load_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _pairs_sql(num_perm: int, bands: int) -> str:
    """Candidate edges from the registry's parameterized band SQL.
    dedup_clusters consumes the SHIPPED pairs tier (32/4 since r9);
    split_leakage_safe deliberately stays on the looser 16/4 graph —
    for leakage safety the HIGHER-recall banding is the conservative
    choice (more near-dups grouped into one split)."""
    return (
        f"WITH cand AS ({_minhash_pairs_sql(num_perm, bands)}) "
        "SELECT DISTINCT doc_a, doc_b FROM cand"
    )


def union_find_min_label(edges):
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # keep the smaller id as the root so root == min label
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return {x: find(x) for x in parent}


def main() -> int:
    con = duckdb.connect()
    con.execute("SET threads = 8")
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    t0 = time.time()
    edges = con.execute(_pairs_sql(32, 4)).fetchall()
    t_pairs = time.time() - t0
    labels = union_find_min_label(edges)
    print(f"duckdb 32/4 pairs: {len(edges)} edges in {t_pairs:.1f}s; "
          f"{len(labels)} nodes, {len(set(labels.values()))} components")
    t0 = time.time()
    edges16 = con.execute(_pairs_sql(16, 4)).fetchall()
    labels16 = union_find_min_label(edges16)
    print(f"duckdb 16/4 pairs: {len(edges16)} edges in "
          f"{time.time() - t0:.1f}s (split_leakage_safe graph)")

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    t0 = time.time()
    sdf = entry_mod.queries()["dedup_clusters"](spark, SF_DIR).toPandas()
    t_spark = time.time() - t0
    got = dict(zip(sdf["doc_id"].astype(int), sdf["cluster_id"].astype(int)))
    ok = got == labels
    print(f"spark dedup_clusters: {len(got)} rows in {t_spark:.1f}s; "
          f"{'MATCH' if ok else 'MISMATCH'}")
    if not ok:
        extra = set(got) - set(labels)
        missing = set(labels) - set(got)
        diff = [k for k in set(got) & set(labels) if got[k] != labels[k]]
        print(f"  extra={len(extra)} missing={len(missing)} label-diff={len(diff)}")
        for k in sorted(diff)[:10]:
            print(f"  doc {k}: spark={got[k]} replay={labels[k]}")

    # split_leakage_safe: replay the split arithmetic on the SAME labels
    # (singletons key on their own doc_id), compare row-for-row.
    import hashlib

    all_ids = [
        r[0]
        for r in con.execute("SELECT doc_id FROM documents").fetchall()
    ]

    def split_of(ck: int) -> str:
        b = int(hashlib.md5(str(ck).encode()).hexdigest()[:15], 16) % 100
        return "train" if b < 80 else ("valid" if b < 90 else "test")

    want = {
        int(i): (
            int(labels16.get(int(i), int(i))),
            split_of(labels16.get(int(i), int(i))),
        )
        for i in all_ids
    }
    t0 = time.time()
    ldf = entry_mod.queries()["split_leakage_safe"](spark, SF_DIR).toPandas()
    t_leak = time.time() - t0
    got_l = {
        int(r.doc_id): (int(r.cluster_key), str(r.split))
        for r in ldf.itertuples()
    }
    ok_l = got_l == want
    print(f"spark split_leakage_safe: {len(got_l)} rows in {t_leak:.1f}s; "
          f"{'MATCH' if ok_l else 'MISMATCH'}")
    if not ok_l:
        diff = [k for k in set(got_l) & set(want) if got_l[k] != want[k]]
        print(f"  extra={len(set(got_l) - set(want))} "
              f"missing={len(set(want) - set(got_l))} diff={len(diff)}")
        for k in sorted(diff)[:10]:
            print(f"  doc {k}: spark={got_l[k]} replay={want[k]}")
    return 0 if (ok and ok_l) else 1


if __name__ == "__main__":
    raise SystemExit(main())
