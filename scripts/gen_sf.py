#!/usr/bin/env python
"""Generate driver-shaped synthetic testdata at an arbitrary scale factor.

The shipped testdata (TESTDATA.md) stops at sf0.1; the scale story in
PLANS.md should not rest on extrapolation alone, so this generator
produces the same ten tables with the same schemas, key ranges, value
distributions, and scaling rules observed across sf0.001/sf0.01/sf0.1
(row counts scale 10x per step except the fixed dims and the
documents/embeddings floors), one order of magnitude further.

NOT byte-compatible with the driver's seed — distributionally faithful
(verified against the shipped vintages: status/flag proportions, date
ranges, doc length/lang mix, ~0.2% exact-dup documents, L2-normalized
label-clustered embeddings).  Correctness at the new scale is still
cross-checked the usual way: the DuckDB oracles run on the SAME parquet,
so `scripts/oracle_check.py --sf-dir <out>` validates any query at sf1.

Usage: python scripts/gen_sf.py [sf] [out_dir]
    defaults: sf=1.0, out_dir=<repo>/testdata_local/sf1
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

US = 1_000_000
DAY_US = 86_400 * US


def _ts_us(base: str, us: np.ndarray) -> pa.Array:
    base_us = np.datetime64(base, "us").astype("int64")
    return pa.array(base_us + us, type=pa.timestamp("us"))


def write(out: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out, f"{name}.parquet")
    pq.write_table(table, path, compression="snappy", row_group_size=200_000)
    print(f"  {name}: {table.num_rows} rows -> {path}", file=sys.stderr)


def gen(sf: float, out: str, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out, exist_ok=True)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))

    # --- fixed dims (identical content to every shipped sf) ------------
    regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), type=pa.int32()),
        "r_name": regions,
    }))
    write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), type=pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], type=pa.int32()),
    }))

    # --- customer / supplier / part ------------------------------------
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    write(out, "customer", pa.table({
        "c_custkey": pa.array(range(n_cust), type=pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), type=pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
        "c_mktsegment": pa.array(np.array(segs)[rng.integers(0, 5, n_cust)]),
    }))
    write(out, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), type=pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), type=pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_supp), 2),
    }))
    adjectives = ["large", "small", "hot", "cold", "blue", "red", "green", "shiny"]
    nouns = ["ring", "bolt", "gear", "widget", "sprocket", "cog", "pin", "cap"]
    types = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
    a_i = rng.integers(0, len(adjectives), n_part)
    n_i = rng.integers(0, len(nouns), n_part)
    write(out, "part", pa.table({
        "p_partkey": pa.array(range(n_part), type=pa.int64()),
        "p_name": [f"{adjectives[a]} {nouns[b]}" for a, b in zip(a_i, n_i)],
        "p_brand": [f"Brand#{int(x)}" for x in rng.integers(1, 26, n_part)],
        "p_type": pa.array(np.array(types)[rng.integers(0, len(types), n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), type=pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 2100, n_part), 2),
    }))

    # --- orders / lineitem ---------------------------------------------
    statuses = np.array(["F", "O", "P"])
    prios = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
    o_date_us = (rng.integers(0, 2405, n_ord) * DAY_US).astype("int64")
    write(out, "orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), type=pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), type=pa.int64()),
        "o_orderstatus": pa.array(statuses[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 400000, n_ord), 2),
        "o_orderdate": _ts_us("1995-01-01", o_date_us),
        "o_orderpriority": pa.array(prios[rng.integers(0, 5, n_ord)]),
    }))

    flags = np.array(["A", "N", "R"])
    lstat = np.array(["F", "O"])
    l_orderkey = rng.integers(0, n_ord, n_li).astype("int64")
    l_orderkey.sort()
    qty = rng.integers(1, 51, n_li).astype("float64")
    price = np.round(rng.uniform(900, 105000, n_li), 2)
    ship_us = (rng.integers(1, 2500, n_li) * DAY_US).astype("int64")
    write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey, type=pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), type=pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), type=pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), type=pa.int32()),
        "l_quantity": qty,
        "l_extendedprice": price,
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(flags[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(lstat[rng.integers(0, 2, n_li)]),
        "l_shipdate": _ts_us("1995-01-01", ship_us),
    }))

    # --- events ---------------------------------------------------------
    etypes = np.array(["click", "error", "purchase", "signup", "view"])
    span_us = 30 * DAY_US
    ev_ts = np.sort(rng.integers(0, span_us, n_ev).astype("int64"))
    k = rng.integers(0, 100, n_ev)
    write(out, "events", pa.table({
        "event_id": pa.array(range(n_ev), type=pa.int64()),
        "ts": _ts_us("2024-01-01", ev_ts),
        "user_id": pa.array(rng.integers(0, max(1, n_cust // 100), n_ev), type=pa.int64()),
        "event_type": pa.array(etypes[rng.integers(0, 5, n_ev)]),
        "value": np.round(rng.exponential(80.0, n_ev), 2),
        "props": [f'{{"k": {int(x)}}}' for x in k],
    }))

    # --- documents (word-salad with dup/near-dup structure) -------------
    vocab = np.array((
        "spark batch part line column order small sort fast value scan slow "
        "group agg filter query big key window row table stream merge data "
        "hash vector a the index shuffle join broadcast cache disk memory"
    ).split())
    langs = np.array(["en", "en", "en", "en", "de", "es", "fr", "zh"])
    n_base = int(n_doc * 0.97)
    lens = rng.integers(8, 100, n_base)
    texts: list[str] = []
    for ln in lens:
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), ln)]))
    # ~2% exact dups + ~1% near dups (one word substituted), like the
    # shipped sf0.1 vintage (4992 distinct of 5000)
    while len(texts) < n_doc:
        src = texts[int(rng.integers(0, n_base))]
        if rng.random() < 0.6:
            texts.append(src)
        else:
            w = src.split()
            w[int(rng.integers(0, len(w)))] = str(vocab[int(rng.integers(0, len(vocab)))])
            texts.append(" ".join(w))
    order = rng.permutation(n_doc)
    texts = [texts[i] for i in order]
    write(out, "documents", pa.table({
        "doc_id": pa.array(range(n_doc), type=pa.int64()),
        "text": texts,
        "lang": pa.array(langs[rng.integers(0, len(langs), n_doc)]),
        "source": pa.array([f"src{int(x)}" for x in rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    }))

    # --- embeddings (label-clustered, L2-normalized, dim 64) ------------
    dim = 64
    labels = rng.integers(0, 10, n_emb)
    centers = rng.normal(0, 1, (10, dim))
    vecs = centers[labels] + rng.normal(0, 0.35, (n_emb, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    write(out, "embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), type=pa.int64()),
        "embedding": pa.array(
            [v for v in vecs.astype(np.float32)],
            type=pa.list_(pa.float32()),
        ),
        "label": pa.array(labels, type=pa.int32()),
    }))


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    default_out = os.path.join(repo, "testdata_local", f"sf{sf:g}")
    out = sys.argv[2] if len(sys.argv) > 2 else default_out
    print(f"generating sf={sf} -> {out}", file=sys.stderr)
    gen(sf, out)


if __name__ == "__main__":
    main()
