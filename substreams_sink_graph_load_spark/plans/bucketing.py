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

import os
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

# Table property recording a content fingerprint of the layout member's
# SOURCE files (r11 advice item 5): the sf_dir path stamp catches a
# layout pointed at the wrong scale, but not source parquet REGENERATED
# in place — same path, different rows — which would leave a derived
# member (pagerank_edges, the IVF-PQ index) silently serving a stale
# snapshot.  The value is self-describing ("file:size:mtime_ns;…") so
# the consumer can re-stat the same files without a mapping table.
# Layouts written before r12 lack the property; consumers skip the check
# for them (the sf_dir stamp still guards scale).
SRC_FP_PROP = "spark_graft.src_fingerprint"

# Source parquet files (relative to sf_dir) each layout member is built
# from — the fingerprint's stat list.
_MEMBER_SOURCES: dict[str, tuple[str, ...]] = {
    "documents": ("documents.parquet",),
    "embeddings": ("embeddings.parquet",),
    "events": ("events.parquet",),
    "pagerank_edges": ("orders.parquet", "lineitem.parquet"),
    "annivfpq_centroids": ("embeddings.parquet",),
    "annivfpq_codebooks": ("embeddings.parquet",),
    "annivfpq_codes": ("embeddings.parquet",),
}


def src_fingerprint(sf_dir: str, names: tuple[str, ...]) -> str:
    """``file:size:mtime_ns;…`` over the named files under ``sf_dir``
    (os.stat — a regenerated parquet file or directory moves its mtime).
    Missing files stat as ``file:absent`` so a comparison still fails
    loudly rather than raising here."""
    parts = []
    for n in names:
        p = os.path.join(sf_dir, n)
        try:
            st = os.stat(p)
            parts.append(f"{n}:{st.st_size}:{st.st_mtime_ns}")
        except OSError:
            parts.append(f"{n}:absent")
    return ";".join(parts)


def check_src_fingerprint(stamp: str, sf_dir: str) -> str | None:
    """Re-stat the files a ``SRC_FP_PROP`` stamp names and return a
    mismatch description, or None when the sources are unchanged."""
    names = tuple(p.split(":", 1)[0] for p in stamp.split(";") if p)
    current = src_fingerprint(sf_dir, names)
    if current != stamp:
        return f"stamped {stamp!r} but sources now {current!r}"
    return None

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

    DERIVED members — relations PAID FOR at layout time so their
    data-scaled derivation cost disappears from every serving run:

    - ``pagerank_edges``: the long-encoded purchase-graph edge relation
      (plans.queries.pagerank_edges), bucketed by src so graph_pagerank's
      five per-iteration edge exchanges collapse to bucket-file reads.
    - ``annivfpq_centroids`` / ``annivfpq_codebooks`` /
      ``annivfpq_codes``: the fitted registry IVF-PQ index
      (plans.queries._ivfpq_fit_registry — the exact fit the inline
      query performs, so served results are hash-identical).  The codes
      table is PARTITIONED BY cell, so a search's probe filter becomes
      PartitionFilters and unprobed cells' files are never read; the
      centroid/codebook tables are kilobytes.  The fit (~60% of the
      query's cold wall at sf1) is the build-once cost.

    Derived members go stale if their SOURCE parquet is regenerated in
    place (same path, new rows) — every member therefore also carries a
    ``SRC_FP_PROP`` content fingerprint (size+mtime of its source files)
    that ``plans.queries._bucketed`` re-checks at serve time and refuses
    to serve on mismatch: rebuild the layout after regenerating testdata.
    """
    from .queries import _events, _ivfpq_fit_registry, pagerank_edges

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

    # The fitted IVF-PQ index members (derived; see docstring).  The fit
    # reads the PLAIN sf_dir parquet — building a layout must never read
    # a (possibly stale) prior layout through the env-var dispatch.
    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cents, books, codes = _ivfpq_fit_registry(e)
    spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(cents)],
        "cell int, centroid array<double>",
    ).coalesce(1).write.format("parquet").mode("overwrite").saveAsTable(
        f"{database}.annivfpq_centroids"
    )
    spark.createDataFrame(
        [
            (s, c, [float(x) for x in books[s, c]])
            for s in range(books.shape[0])
            for c in range(books.shape[1])
        ],
        "sub int, code int, centroid array<double>",
    ).coalesce(1).write.format("parquet").mode("overwrite").saveAsTable(
        f"{database}.annivfpq_codebooks"
    )
    codes.write.format("parquet").mode("overwrite").partitionBy(
        "cell"
    ).saveAsTable(f"{database}.annivfpq_codes")

    # Provenance stamps: WHICH sf_dir each table was built from (so the
    # query harness refuses wrong-scale serves, r8 advice item) plus the
    # source-content fingerprint (so in-place regenerated sources refuse
    # stale serves, r11 advice item 5).
    src = sf_dir.replace("'", "''")
    members = list(frames) + [
        "annivfpq_centroids",
        "annivfpq_codebooks",
        "annivfpq_codes",
    ]
    for name in members:
        fp = src_fingerprint(sf_dir, _MEMBER_SOURCES[name]).replace("'", "''")
        spark.sql(
            f"ALTER TABLE {database}.{name} SET TBLPROPERTIES "
            f"('{SF_DIR_PROP}' = '{src}', '{SRC_FP_PROP}' = '{fp}')"
        )
