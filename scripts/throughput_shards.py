"""Shard-export throughput at $SPARK_GRAFT_SF_DIR (default sf0.1).

Measures the full pipeline a training export runs: read documents,
hash-tokenize (JVM codegen), one hash(shard) exchange, per-shard packed
.bin/.idx serialization — and separately the WebDataset tar path.
Prints docs/s and output MB/s; records land in PLANS.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from substreams_sink_graph_load_spark.session import get_spark
from substreams_sink_graph_load_spark.sinks.shards import (
    hash_tokenize,
    write_token_shards,
    write_webdataset_shards,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
OUT = "/tmp/shard_throughput"


def main() -> None:
    spark = get_spark(
        master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .withColumn("shard", F.pmod(F.xxhash64("doc_id"), F.lit(64)))
    )
    n_docs = docs.count()  # also warms the scan cache

    for name, run in [
        (
            "token_bin",
            lambda out: write_token_shards(
                hash_tokenize(docs, vocab_size=32768), out
            ).agg(F.sum("n_tokens")).collect(),
        ),
        (
            "webdataset",
            lambda out: write_webdataset_shards(
                docs, out, {"txt": "text"}
            ).agg(F.sum("n_bytes")).collect(),
        ),
    ]:
        out = os.path.join(OUT, name)
        shutil.rmtree(out, ignore_errors=True)
        best = None
        for _ in range(3):
            t0 = time.time()
            run(out)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out_bytes = sum(
            os.path.getsize(os.path.join(out, f)) for f in os.listdir(out)
        )
        print(
            f"{name}: {n_docs} docs in {best:.2f}s best-of-3 = "
            f"{n_docs / best:,.0f} docs/s, "
            f"{out_bytes / best / 1e6:,.1f} MB/s written "
            f"({out_bytes / 1e6:,.1f} MB, 64 shards)"
        )


if __name__ == "__main__":
    main()
