"""Bundle-partitioned version storage: the as-of read pattern prunes
partitions (SURVEY §4's 'partition pruning gives 90% for free' claim,
verified against the physical plan)."""

import io
import contextlib

from pyspark.sql import functions as F

from substreams_sink_graph_load_spark.operators.bundles import bundle_start_col
from substreams_sink_graph_load_spark.operators.scd2 import (
    scd2_versions,
    state_at_block,
)


def test_asof_read_prunes_bundles(spark, tmp_path):
    events = [
        (f"id{i}", b, i * 100 + b, 1 if b == i % 7 else 2)
        for i in range(50)
        for b in range(i % 7, 7000, 700)
    ]
    df = spark.createDataFrame(
        events, "id string, block_num long, seq long, operation int"
    ).withColumn("v", F.col("block_num") * 2)
    versions = scd2_versions(df, field_cols=["v"]).withColumn(
        "bundle_start", bundle_start_col(F.col("block_range_start"), 1000)
    )
    store = str(tmp_path / "versions")
    versions.write.partitionBy("bundle_start").parquet(store)

    table = spark.read.parquet(store)
    # as-of block 1500: only versions starting at/before 1500 can contain it
    # -> partition predicate bundle_start <= 1000
    asof = state_at_block(
        table.where(F.col("bundle_start") <= 1500 - 1500 % 1000), 1500
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        asof.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "bundle_start" in plan.split("PartitionFilters", 1)[1][:200]

    # pruned read returns exactly the unpruned as-of result (start <= 1500
    # implies bundle_start <= 1000, so no version is lost)
    expect = sorted(
        (r["id"], r["block_range_start"], r["v"])
        for r in state_at_block(table, 1500).collect()
    )
    got = sorted(
        (r["id"], r["block_range_start"], r["v"]) for r in asof.collect()
    )
    assert got == expect and len(got) > 0
