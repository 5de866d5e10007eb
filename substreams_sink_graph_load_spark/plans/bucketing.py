"""Bucketed-table helpers: co-located storage for shuffle-free joins.

At 100 TB the dominant cost of a fact-to-fact equi-join is the shuffle of
both sides onto the join key.  Spark's native bucketing pays that shuffle
ONCE at write time: each side is hash-partitioned into a fixed number of
buckets on the key (and optionally sorted within buckets), and every
subsequent join or aggregation on that key reads co-located buckets with
NO Exchange — the SortMergeJoin consumes bucket files directly, and the
in-bucket sort order elides the Sort too.

This is the storage-level complement of the AQE runtime gates the query
plans rely on: AQE picks the best strategy per run; bucketing removes the
need to choose at all for the keys a pipeline joins on every day (the
reference's inject pipeline always COPYs per entity-id — the analogous
hot key here).

Pure Spark surface — `DataFrameWriter.bucketBy` + `saveAsTable` — so
bucket pruning, bucketed scans and shuffle elision all come from
Catalyst, not custom code.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    *keys: str,
    sort: bool = True,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (and by default in-bucket-sorted)
    catalog table on ``keys``.

    Both sides of a future join must use the SAME bucket count (Spark
    only elides the shuffle when the partitionings match; with
    ``spark.sql.bucketing.coalesceBucketsInJoin.enabled`` a 2:1 ratio
    also works).  Pick ``buckets`` so one bucket of the LARGER table fits
    an executor core's working memory at target scale — e.g. 100 TB /
    4096 buckets ≈ 24 GB per bucket pre-projection, which a column-pruned
    scan reduces to the joined columns only.
    """
    writer = df.write.format(fmt).mode(mode).bucketBy(buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def bucketed_tables(
    spark: SparkSession,
    database: str,
    location: str,
    frames: dict[str, tuple[DataFrame, int, tuple[str, ...]]],
) -> None:
    """Create ``database`` at ``location`` and write each named frame
    bucketed: ``frames[name] = (df, buckets, keys)``.

    A per-database location keeps bucketed warehouses explicit (no
    implicit cwd `spark-warehouse/`) — on a cluster this is the lake path
    the pipeline owns.
    """
    # SQL is assembled by interpolation (no parameter binding for DDL):
    # constrain the database name to a plain identifier and escape quotes
    # in the location so a hostile or merely unusual path cannot break
    # out of the string literal.
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", database):
        raise ValueError(f"invalid database identifier: {database!r}")
    loc = location.replace("'", "''")
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS {database} LOCATION '{loc}'"
    )
    for name, (df, buckets, keys) in frames.items():
        write_bucketed(df, f"{database}.{name}", buckets, *keys)


# Table property recording the source sf_dir of a bucketed layout.
SF_DIR_PROP = "spark_graft.sf_dir"

# The id-join family's hot keys: the keys these tables are joined /
# windowed / per-id-aggregated on by the registry queries every round.
REGISTRY_BUCKET_KEYS: dict[str, tuple[str, ...]] = {
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
    "events": ("user_id",),
    # DERIVED relation (distinct orders x lineitem purchase pairs, long-
    # encoded, both directions): graph_pagerank joins/aggregates it on
    # the node key five times per run — bucketing+sorting by src removes
    # the data-scaled edge exchange from every iteration (5 -> 3
    # exchanges, 0.82x sf1 -> 0.77x sf10, hash parity:
    # scripts/pagerank_bucketed_ab.py, r10).
    "pagerank_edges": ("src",),
}


def registry_layout(
    spark: SparkSession,
    sf_dir: str,
    database: str,
    location: str,
    buckets: int = 32,
) -> None:
    """Write the registry's id-join tables as a bucketed layout that the
    query harness can consume opt-in (env ``SPARK_GRAFT_BUCKETED_DB``):
    documents by doc_id, embeddings by vec_id, events by user_id.

    With the env var set, ``plans.queries._t`` serves these tables from
    the catalog instead of the raw parquet, and every equi-join /
    window / aggregation keyed on the bucket column rides the write-time
    partitioning with NO Exchange — the end-to-end demonstration of the
    100 TB claim the per-query scale notes make (pay the id shuffle once
    at ingest, never again).  Results are bit-identical either way: the
    layout changes partitioning, not rows (scripts/bucketed_audit.py
    checks both per run).

    ``events`` is written through the same vintage normalization the
    parquet path applies (plans.queries._events), so the bucketed table
    stores the already-normalized microsecond timestamps.
    ``pagerank_edges`` is the one DERIVED member: the long-encoded
    purchase-graph edge relation (plans.queries.pagerank_edges), paid for
    once at layout time so graph_pagerank's five per-iteration edge
    exchanges collapse to bucket-file reads.
    """
    from .queries import _events, pagerank_edges

    frames = {
        "documents": (
            spark.read.parquet(f"{sf_dir}/documents.parquet"),
            buckets,
            REGISTRY_BUCKET_KEYS["documents"],
        ),
        "embeddings": (
            spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
            buckets,
            REGISTRY_BUCKET_KEYS["embeddings"],
        ),
        "events": (
            _events(spark, sf_dir),
            buckets,
            REGISTRY_BUCKET_KEYS["events"],
        ),
        "pagerank_edges": (
            pagerank_edges(spark, sf_dir, allow_bucketed=False),
            buckets,
            REGISTRY_BUCKET_KEYS["pagerank_edges"],
        ),
    }
    bucketed_tables(spark, database, location, frames)
    # Provenance stamp: record WHICH sf_dir each table was built from, so
    # the query harness can refuse to serve wrong-scale data when the env
    # var points a different sf_dir's run at this layout (r8 advice item).
    src = sf_dir.replace("'", "''")
    for name in frames:
        spark.sql(
            f"ALTER TABLE {database}.{name} SET TBLPROPERTIES "
            f"('{SF_DIR_PROP}' = '{src}')"
        )
