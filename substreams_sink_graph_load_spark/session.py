"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]``; the config choices below are the ones
that matter at cluster scale too (AQE, adaptive skew handling, broadcast
threshold, Arrow for the pandas-UDF paths).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


_SHIPPED: set[int] = set()


def ship_package(spark: SparkSession) -> None:
    """Make this package importable on Spark Python workers regardless of
    the caller's cwd.

    Custom Python data sources and pandas-UDF closures are cloudpickled by
    name; the worker re-imports the package to unpickle them.  A driver
    that merely sys.path-inserted the repo leaves workers blind to it, so
    ship a zip via ``addPyFile`` once per SparkContext.  Library users get
    this automatically through ``get_spark``; callers who built their own
    session can call it directly.
    """
    key = id(spark.sparkContext)
    if key in _SHIPPED:
        return
    import zipfile

    pkg = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(
        spark.sparkContext._temp_dir, "substreams_sink_graph_load_spark.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        zf.write(
                            full,
                            os.path.relpath(full, os.path.dirname(pkg)),
                        )
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED.add(key)


def get_spark(
    app_name: str = "substreams-sink-graph-load-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    Defaults are chosen for correctness + scale:
    - AQE on: runtime coalescing of shuffle partitions, skew-join splitting.
    - Arrow on: every pandas UDF / mapInPandas path transfers via Arrow.
    - UTC session timezone: deterministic timestamp semantics across engines
      (the DuckDB oracle is timezone-naive).
    """
    # Python data source PLANNER workers (create_data_source /
    # python_streaming_source_runner) unpickle source classes by module
    # name but do not see addPyFile paths (only task workers do) — they
    # inherit PYTHONPATH from the JVM, which inherits it from us.  Must
    # happen before the JVM launches; on a real cluster the same is done
    # with --py-files / spark.executorEnv.PYTHONPATH.
    _parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    _pp = os.environ.get("PYTHONPATH", "")
    if _parent not in _pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{_parent}{os.pathsep}{_pp}" if _pp else _parent
        )
    # transformWithStateInPandas workers import google.protobuf; when the
    # real runtime is absent, put the clean-room shim on PYTHONPATH now,
    # while the JVM (and thus every Python worker) can still inherit it.
    from . import protoshim

    protoshim.activate()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    ship_package(spark)
    return spark
