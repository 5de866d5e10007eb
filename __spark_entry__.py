"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All implementations live in ``substreams_sink_graph_load_spark.plans.queries``
(SURVEY §2.12 operator contract).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_DIR)

from substreams_sink_graph_load_spark.plans import QUERIES, ORACLES, flagship

_SHIPPED: set[int] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make the package importable on Spark Python workers regardless of the
    caller's cwd.

    A handful of operators (typed extraction, BigDecimal normalize, as-of
    join, IVF ANN, multimodal features) serialize closures that reference
    package modules; cloudpickle stores them by name, so the *worker*
    re-imports the package.  A driver that merely sys.path-inserted the repo
    leaves workers blind to it — ship a zip via ``addPyFile`` once per
    SparkContext instead of trusting the environment.
    """
    key = id(spark.sparkContext)
    if key in _SHIPPED:
        return
    import zipfile

    zip_path = os.path.join(
        spark.sparkContext._temp_dir, "substreams_sink_graph_load_spark.zip"
    )
    pkg = os.path.join(_REPO_DIR, "substreams_sink_graph_load_spark")
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg):
                for fn in files:
                    if not fn.endswith(".py"):
                        continue
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, _REPO_DIR))
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED.add(key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ship_package(spark)
    return flagship(spark, "/root/testdata/sf0.001")


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ship_package(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (same column
    names/types).  Ops without an entry get the driver's rows-only check."""
    return dict(ORACLES)
