"""End-to-end tocsv throughput: synthesize a lineitem-scale entity-change
JSONL log, run the full pipeline (scan -> typed extract -> SCD-2 -> CSV
render -> bundled write), report events/sec.

Usage: python scripts/throughput_tocsv.py [sf_dir]   (default sf0.1 ~1.2M events)
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from substreams_sink_graph_load_spark.session import get_spark

SDL = """
type Position @entity {
  id: ID!
  owner: String!
  qty: BigInt!
  price: BigDecimal!
  flags: [String!]
  note: String
}
"""


def synthesize(spark, sf_dir: str, out_dir: str, bundle_size: int) -> tuple[int, int]:
    """lineitem -> ordered change-log: each (orderkey, linenumber) id gets a
    CREATE then ~2 partial UPDATEs at later blocks, some DELETE/FINAL —
    written as bundled JSONL through the engine's own bundle writer."""
    from pyspark.sql import functions as F

    from substreams_sink_graph_load_spark.operators.bundles import (
        bundle_start_col,
        write_bundled_lines,
    )

    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.concat_ws("-", "l_orderkey", "l_linenumber").alias("id"),
        (F.col("l_orderkey") % 100_000).alias("base_block"),
        F.col("l_quantity"),
        F.col("l_extendedprice"),
        F.col("l_returnflag"),
        F.col("l_linestatus"),
    )
    # event 0: CREATE at base_block; event 1: UPDATE at +7; event 2:
    # UPDATE/DELETE/FINAL at +23 depending on flags
    ev = l.select(
        "id", "base_block", "l_quantity", "l_extendedprice",
        "l_returnflag", "l_linestatus",
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("step"),
    )
    block = F.col("base_block") + F.element_at(
        F.array(F.lit(0), F.lit(7), F.lit(23)), F.col("step") + 1
    )
    op = (
        F.when(F.col("step") == 0, 1)
        .when(F.col("step") == 1, 2)
        .when(F.col("l_returnflag") == "R", 3)
        .when(F.col("l_linestatus") == "F", 4)
        .otherwise(2)
    )
    fields = F.when(
        F.col("step") == 0,
        F.to_json(
            F.struct(
                F.struct(F.col("l_returnflag").alias("String_")).alias("owner"),
                F.struct(F.round("l_quantity").cast("long").cast("string").alias("Bigint")).alias("qty"),
                F.struct(F.col("l_extendedprice").cast("string").alias("Bigdecimal")).alias("price"),
            )
        ),
    ).otherwise(
        F.to_json(
            F.struct(
                F.struct(
                    F.round(F.col("l_quantity") + F.col("step")).cast("long").cast("string").alias("Bigint")
                ).alias("qty"),
            )
        )
    )
    # assemble the reference JSONL line via string templating (fields is a
    # JSON object {name: {Typed}}, converted to the fields-array layout)
    line = F.concat(
        F.lit('{"entity_change": {"entity": "Position", "id": "'),
        F.col("id"),
        F.lit('", "operation": '),
        op.cast("string"),
        F.lit(', "fields": ['),
        F.when(
            op.isin(1, 2),
            _fields_array(fields),
        ).otherwise(F.lit("")),
        F.lit(']}, "block_num": '),
        block.cast("string"),
        F.lit("}"),
    )
    rows = ev.select(
        line.alias("line"),
        bundle_start_col(block, bundle_size).alias("bundle_start"),
        block.alias("_order_block"),
        (F.col("base_block") * 4 + F.col("step")).alias("_order_seq"),
    )
    dest = os.path.join(out_dir, "position")
    os.makedirs(dest, exist_ok=True)
    stop_block = 100_000 + 23 + 1
    n = rows.count()
    write_bundled_lines(
        spark, rows, dest, header=None, first_block=0,
        stop_block=stop_block, bundle_size=bundle_size,
        order_cols=["_order_block", "_order_seq"], ext="jsonl",
    )
    return n, stop_block


def _fields_array(obj_json):
    """{name: typed_obj} JSON -> fields array entries (driver-free string
    surgery with from_json would be cleaner; a simple map does fine here)."""
    from pyspark.sql import functions as F

    # parse back and rebuild as [{"name": k, "new_value": {"Typed": v}}]
    # using a pandas UDF keeps this generator simple; generation time is
    # excluded from the measured pipeline anyway.
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def rebuild(s: pd.Series) -> pd.Series:
        out = []
        for v in s:
            o = json.loads(v)
            out.append(
                ",".join(
                    json.dumps({"name": k, "new_value": {"Typed": tv}})
                    for k, tv in o.items()
                )
            )
        return pd.Series(out)

    return rebuild(obj_json)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    bundle_size = 1000
    spark = get_spark(app_name="throughput")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="graft_tput_")
    try:
        schema_file = os.path.join(tmp, "schema.graphql")
        with open(schema_file, "w") as fh:
            fh.write(SDL)
        src = os.path.join(tmp, "jsonl")
        n_events, stop_block = synthesize(spark, sf_dir, src, bundle_size)
        total_bytes = sum(
            os.path.getsize(os.path.join(src, "position", f))
            for f in os.listdir(os.path.join(src, "position"))
        )
        from substreams_sink_graph_load_spark.tocsv import tocsv

        t0 = time.perf_counter()
        files = tocsv(
            spark, src, os.path.join(tmp, "csv"), "position", schema_file,
            stop_block=stop_block, bundle_size=bundle_size,
        )
        dt = time.perf_counter() - t0
        out_rows = sum(
            max(0, sum(1 for _ in open(f)) - 1) for f in files
        )
        print(json.dumps({
            "events": n_events,
            "input_mb": round(total_bytes / 1e6, 1),
            "bundles": len(files),
            "version_rows": out_rows,
            "tocsv_sec": round(dt, 2),
            "events_per_sec": int(n_events / dt),
            "mb_per_sec": round(total_bytes / 1e6 / dt, 1),
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
