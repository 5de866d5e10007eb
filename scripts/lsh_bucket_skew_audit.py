"""LSH band-bucket skew audit (r13 item 8, guide §2.5).

The LSH pair joins shuffle on (band_idx, band_key) — a viral bucket (one
boilerplate page repeated across the corpus) lands every member on ONE
task.  This audit measures the top bucket sizes and the candidate-pair
mass they own for the minhash, simhash, and fuzzy bucket paths at a given
SF, so the salt-or-not decision is data, not vibes: a bucket of n docs
contributes n*(n-1)/2 of the pair-stage work.

Prints one JSON line per path: top-10 bucket sizes, p50/p99/max, total
buckets, and the share of pair work owned by the largest bucket.

Usage: python scripts/lsh_bucket_skew_audit.py [sf_dir]
       (default: testdata_local/sf10)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from substreams_sink_graph_load_spark.session import get_spark


def bucket_stats(df, keys: list[str]) -> dict:
    counts = (
        df.groupBy(*keys).count().select("count").toPandas()["count"]
    )
    import numpy as np

    c = np.sort(counts.to_numpy())[::-1]
    pairs = c.astype("float64") * (c - 1) / 2
    total_pairs = float(pairs.sum())
    return {
        "n_buckets": int(len(c)),
        "top10": [int(x) for x in c[:10]],
        "p50": int(np.percentile(c, 50)),
        "p99": int(np.percentile(c, 99)),
        "max": int(c[0]) if len(c) else 0,
        "max_over_median": round(float(c[0]) / max(float(np.median(c)), 1), 1)
        if len(c)
        else 0.0,
        "total_pair_work": int(total_pairs),
        "top1_pair_share": round(float(pairs[0]) / total_pairs, 4)
        if total_pairs
        else 0.0,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testdata_local",
        "sf10",
    )
    spark = get_spark(app_name="lsh_bucket_skew_audit")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    from substreams_sink_graph_load_spark.operators.dedup import (
        minhash_sketch,
        simhash_sketch,
    )

    out = {}

    # minhash: pair join key is (band_idx, band_key)
    sk = minhash_sketch(docs).select(
        F.posexplode(
            F.array(*[F.col(f"band_{b}") for b in range(4)])
        ).alias("band_idx", "band_key")
    )
    out["minhash_band_buckets"] = bucket_stats(sk, ["band_idx", "band_key"])

    # simhash: pair candidates group on the exact 60-bit hash value
    sh = simhash_sketch(docs).select("simhash")
    out["simhash_value_buckets"] = bucket_stats(sh, ["simhash"])

    # fuzzy: join key is (source, length band) exactly as the fuzzy_pairs
    # query builds it (head = first 24 chars, band width = max_dist = 10)
    fz = docs.select(
        "source",
        F.floor(F.length(F.substring("text", 1, 24)) / F.lit(10))
        .cast("long")
        .alias("_band"),
    )
    out["fuzzy_block_buckets"] = bucket_stats(fz, ["source", "_band"])

    print(json.dumps({"sf_dir": sf_dir, **out}))


if __name__ == "__main__":
    main()
