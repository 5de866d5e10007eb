"""Independent heavy-SF check for ``graph_pagerank``.

The registry oracle chains five ``ed JOIN r_i JOIN deg`` CTEs; exact, and
fine at the driver SFs and sf1, but at sf10 the ~60M-distinct-pair /
~120M-edge graph makes DuckDB spill tens of GB re-materializing the edge
join per iteration (observed: >40 GB temp, killed).  This replay keeps
the edge derivation cross-engine — the DISTINCT (o_custkey, l_suppkey)
pair set comes from DuckDB over the same parquet — and replaces only the
power-iteration algebra with independent exact-int64 numpy (per-node
contribution ``(r * 85) // (100 * deg)``, scattered to neighbors via a
dst-sorted ``add.reduceat`` — no floats anywhere), then compares
node/deg/rank_ppm against the Spark ``graph_pagerank`` registry query
exactly.  The replay itself is validated at sf0.01/sf1, where the Spark
query already hash-MATCHes the shipped DuckDB oracle, so replay==Spark
there pins replay==oracle transitively.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/pagerank_replay.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np

import __spark_entry__ as entry_mod
from substreams_sink_graph_load_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

PAIRS_SQL = """
SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
"""


def _group_starts(sorted_idx: np.ndarray, n_groups: int) -> np.ndarray:
    # reduceat start offsets; every group 0..n_groups-1 is non-empty by
    # construction (indices come from np.unique of the same pair set)
    return np.searchsorted(sorted_idx, np.arange(n_groups))


def pagerank_replay(ck: np.ndarray, sk: np.ndarray, iterations: int = 5):
    cu, ci = np.unique(ck, return_inverse=True)
    su, si = np.unique(sk, return_inverse=True)
    deg_c = np.bincount(ci).astype(np.int64)
    deg_s = np.bincount(si).astype(np.int64)
    nc, ns = len(cu), len(su)

    # edge list sorted by destination, once, for exact int64 reduceat sums
    ord_s = np.argsort(si, kind="stable")  # edges c->s grouped by supplier
    ord_c = np.argsort(ci, kind="stable")  # edges s->c grouped by customer
    ci_by_s = ci[ord_s]
    si_by_c = si[ord_c]
    starts_s = _group_starts(si[ord_s], ns)
    starts_c = _group_starts(ci[ord_c], nc)

    r_c = np.full(nc, 1_000_000, dtype=np.int64)
    r_s = np.full(ns, 1_000_000, dtype=np.int64)
    for _ in range(iterations):
        contrib_c = (r_c * 85) // (100 * deg_c)
        contrib_s = (r_s * 85) // (100 * deg_s)
        new_s = 150_000 + np.add.reduceat(contrib_c[ci_by_s], starts_s)
        new_c = 150_000 + np.add.reduceat(contrib_s[si_by_c], starts_c)
        r_c, r_s = new_c.astype(np.int64), new_s.astype(np.int64)
    return cu, deg_c, r_c, su, deg_s, r_s


def main() -> int:
    con = duckdb.connect()
    con.execute("SET threads = 8")
    for t in ("orders", "lineitem"):
        con.execute(
            f"create view {t} as select * from read_parquet('{SF_DIR}/{t}.parquet')"
        )
    t0 = time.time()
    tbl = con.execute(PAIRS_SQL).fetch_arrow_table()
    ck = tbl.column("ck").to_numpy(zero_copy_only=False).astype(np.int64)
    sk = tbl.column("sk").to_numpy(zero_copy_only=False).astype(np.int64)
    t_pairs = time.time() - t0

    t0 = time.time()
    cu, deg_c, r_c, su, deg_s, r_s = pagerank_replay(ck, sk)
    t_iter = time.time() - t0
    print(
        f"duckdb pairs: {len(ck)} in {t_pairs:.1f}s; replay: "
        f"{len(cu)}+{len(su)} nodes, 5 iters in {t_iter:.1f}s"
    )

    expect: dict[str, tuple[int, int]] = {}
    for k, d, r in zip(cu, deg_c, r_c):
        expect[f"c{k}"] = (int(d), int(r))
    for k, d, r in zip(su, deg_s, r_s):
        expect[f"s{k}"] = (int(d), int(r))

    spark = get_spark(master="local[8]", shuffle_partitions=32)
    t0 = time.time()
    sdf = entry_mod.queries()["graph_pagerank"](spark, SF_DIR).toPandas()
    t_spark = time.time() - t0
    got = {
        n: (int(d), int(r))
        for n, d, r in zip(sdf["node"], sdf["deg"], sdf["rank_ppm"])
    }
    ok = got == expect
    print(
        f"spark graph_pagerank: {len(got)} rows in {t_spark:.1f}s; "
        f"{'MATCH' if ok else 'MISMATCH'}"
    )
    if not ok:
        extra = set(got) - set(expect)
        missing = set(expect) - set(got)
        diff = [k for k in set(got) & set(expect) if got[k] != expect[k]]
        print(f"  extra={len(extra)} missing={len(missing)} value-diff={len(diff)}")
        for k in sorted(diff)[:10]:
            print(f"  node {k}: spark={got[k]} replay={expect[k]}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
