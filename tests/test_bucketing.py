"""Bucketed co-located joins: the write-once-shuffle-never storage path.

Proves the two properties that matter at 100 TB: a join of two tables
bucketed on the same key with the same bucket count plans with ZERO
Exchange nodes (the shuffle happened at write time), and the results are
identical to the plain shuffled join.
"""

from __future__ import annotations

import contextlib
import io
import os

import pytest

from pyspark.sql import functions as F

from substreams_sink_graph_load_spark.plans.bucketing import (
    bucketed_tables,
)


@pytest.fixture(scope="module")
def bucketdb(spark, sf_dir, tmp_path_factory):
    loc = tmp_path_factory.mktemp("bucket_warehouse")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    bucketed_tables(
        spark,
        "bucketdb",
        str(loc),
        {
            "orders_b": (orders, 8, ("o_custkey",)),
            "customer_b": (customer, 8, ("c_custkey",)),
        },
    )
    yield "bucketdb"
    spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_elides_all_exchanges(spark, bucketdb):
    """With broadcast disabled (at real scale neither side fits), the
    bucketed join must SortMergeJoin directly over co-located buckets —
    zero Exchange nodes anywhere in the plan."""
    o = spark.table(f"{bucketdb}.orders_b")
    c = spark.table(f"{bucketdb}.customer_b")
    joined = o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_mktsegment"
    )
    conf = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        plan = _explain(joined)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketdb):
    o = spark.table(f"{bucketdb}.orders_b")
    c = spark.table(f"{bucketdb}.customer_b")
    got = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    po = spark.read.parquet(f"{sf_dir}/orders.parquet")
    pc = spark.read.parquet(f"{sf_dir}/customer.parquet")
    want = (
        po.join(pc, po.o_custkey == pc.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_bucketed_aggregation_reuses_bucketing(spark, bucketdb):
    """A groupBy on the bucket key also rides the write-time partitioning:
    no Exchange before the aggregate."""
    o = spark.table(f"{bucketdb}.orders_b")
    agg = o.groupBy("o_custkey").agg(F.count("*").alias("n"))
    plan = _explain(agg)
    assert "Exchange" not in plan, plan


def test_bucketed_tables_rejects_hostile_identifiers(spark, tmp_path):
    from substreams_sink_graph_load_spark.plans.bucketing import bucketed_tables

    with pytest.raises(ValueError, match="invalid database identifier"):
        bucketed_tables(spark, "x; DROP TABLE y", str(tmp_path), {})


def test_bucketed_tables_escapes_quoted_location(spark, tmp_path):
    from substreams_sink_graph_load_spark.plans.bucketing import bucketed_tables

    loc = tmp_path / "it's a path"
    bucketed_tables(spark, "quoted_loc_db", str(loc), {})
    try:
        row = spark.sql("DESCRIBE DATABASE quoted_loc_db").collect()
        info = {r[0]: r[1] for r in row}
        assert info["Location"].endswith("it's%20a%20path") or "it's a path" in info["Location"]
    finally:
        spark.sql("DROP DATABASE IF EXISTS quoted_loc_db CASCADE")


@pytest.fixture(scope="module")
def registry_bucketdb(spark, sf_dir, tmp_path_factory):
    from substreams_sink_graph_load_spark.plans.bucketing import (
        registry_layout,
    )

    loc = tmp_path_factory.mktemp("registry_bucket_wh")
    registry_layout(spark, sf_dir, "registry_bucketdb", str(loc), buckets=8)
    yield "registry_bucketdb"
    spark.sql("DROP DATABASE IF EXISTS registry_bucketdb CASCADE")


def test_registry_layout_elides_id_join_exchanges(
    spark, sf_dir, registry_bucketdb, monkeypatch
):
    """The harness opt-in end-to-end: with SPARK_GRAFT_BUCKETED_DB set,
    the user_id-windowed sessionize plans with ZERO Exchange (the id
    shuffle happened at write time) and the embeddings<->documents id
    join loses its data-scaled exchanges — results bit-identical to the
    plain layout either way."""
    from substreams_sink_graph_load_spark.plans import QUERIES

    conf = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        results = {}
        for layout in ("plain", "bucketed"):
            if layout == "bucketed":
                monkeypatch.setenv("SPARK_GRAFT_BUCKETED_DB", registry_bucketdb)
            else:
                monkeypatch.delenv("SPARK_GRAFT_BUCKETED_DB", raising=False)
            for name in ("events_sessionize", "embedding_drift_by_source"):
                df = QUERIES[name](spark, sf_dir)
                import re as _re

                nex = len(_re.findall(r"\(\d+\) Exchange\b", _explain(df)))
                rows = sorted(map(tuple, df.collect()))
                results[(layout, name)] = (nex, rows)
                spark.catalog.clearCache()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    # parity: identical rows on both layouts
    for name in ("events_sessionize", "embedding_drift_by_source"):
        assert results[("plain", name)][1] == results[("bucketed", name)][1]
    # the user_id window rides the bucketing: zero exchanges
    assert results[("bucketed", "events_sessionize")][0] == 0
    # the id join loses its data-scaled exchanges
    assert (
        results[("bucketed", "embedding_drift_by_source")][0]
        < results[("plain", "embedding_drift_by_source")][0]
    )


def test_bucketed_layout_refuses_wrong_sf_dir(
    spark, sf_dir, registry_bucketdb, monkeypatch
):
    """The layout is stamped with its source sf_dir at write time; a run
    requesting a DIFFERENT sf_dir must raise, not silently serve the
    wrong scale's rows (r8 advice item)."""
    from substreams_sink_graph_load_spark.plans import queries as Q

    monkeypatch.setenv("SPARK_GRAFT_BUCKETED_DB", registry_bucketdb)
    Q._BUCKETED_SF.clear()
    # the stamped sf_dir serves the catalog table
    assert Q._t(spark, sf_dir, "documents").count() > 0
    # a different sf_dir is refused loudly
    with pytest.raises(ValueError, match="was built from"):
        Q._t(spark, "/root/testdata/sf0.1", "documents")
    with pytest.raises(ValueError, match="was built from"):
        Q._events(spark, "/root/testdata/sf0.1")
    # and an equivalent spelling of the same path is accepted
    assert Q._t(spark, sf_dir + "/", "documents").count() > 0


def test_src_fingerprint_detects_in_place_regeneration(tmp_path):
    """Pure-function check of the content fingerprint (r11 advice
    item 5): a source file rewritten in place — same path, new bytes —
    must change the fingerprint; an untouched source must not."""
    from substreams_sink_graph_load_spark.plans.bucketing import (
        check_src_fingerprint,
        src_fingerprint,
    )

    src = tmp_path / "documents.parquet"
    src.write_bytes(b"v1")
    stamp = src_fingerprint(str(tmp_path), ("documents.parquet",))
    assert "documents.parquet:" in stamp
    assert check_src_fingerprint(stamp, str(tmp_path)) is None
    # regenerate in place (force a different mtime_ns)
    src.write_bytes(b"v2-longer")
    os.utime(src, ns=(1, 1))
    mismatch = check_src_fingerprint(stamp, str(tmp_path))
    assert mismatch is not None and "documents.parquet" in mismatch
    # a missing source reads as absent, still a loud mismatch
    src.unlink()
    assert "absent" in src_fingerprint(str(tmp_path), ("documents.parquet",))
    assert check_src_fingerprint(stamp, str(tmp_path)) is not None


def test_bucketed_layout_refuses_stale_sources(
    spark, sf_dir, registry_bucketdb, monkeypatch
):
    """Serve-time staleness gate: a layout member whose stamped source
    fingerprint no longer matches the sf_dir's files must refuse to
    serve (the sf_dir path stamp cannot see in-place regeneration —
    r11 advice item 5).  Simulated by rewriting the stamp to a
    fingerprint the real sources cannot match."""
    from substreams_sink_graph_load_spark.plans import queries as Q
    from substreams_sink_graph_load_spark.plans.bucketing import (
        SRC_FP_PROP,
        _MEMBER_SOURCES,
        src_fingerprint,
    )

    monkeypatch.setenv("SPARK_GRAFT_BUCKETED_DB", registry_bucketdb)
    Q._BUCKETED_SF.clear()
    try:
        spark.sql(
            f"ALTER TABLE {registry_bucketdb}.annivfpq_codes SET "
            f"TBLPROPERTIES ('{SRC_FP_PROP}' = 'embeddings.parquet:1:1')"
        )
        with pytest.raises(ValueError, match="STALE"):
            Q._bucketed(spark, sf_dir, "annivfpq_codes")
    finally:
        good = src_fingerprint(
            sf_dir, _MEMBER_SOURCES["annivfpq_codes"]
        ).replace("'", "''")
        spark.sql(
            f"ALTER TABLE {registry_bucketdb}.annivfpq_codes SET "
            f"TBLPROPERTIES ('{SRC_FP_PROP}' = '{good}')"
        )
        Q._BUCKETED_SF.clear()
    # with the true fingerprint restored, the member serves again
    assert Q._bucketed(spark, sf_dir, "annivfpq_codes") is not None


def test_ivfpq_served_index_partition_prunes_and_matches(
    spark, sf_dir, registry_bucketdb, monkeypatch
):
    """The served IVF-PQ index (r11 verdict item 2): with the layout
    present, ann_ivf_pq_topk must (a) skip the inline fit and read the
    fitted index members, (b) show the probe filter as PartitionFilters
    on the cell-partitioned codes scan — unprobed cells' files are never
    read — and (c) return rows hash-identical to the self-contained
    inline fit."""
    import re as _re

    from substreams_sink_graph_load_spark.plans import QUERIES
    from substreams_sink_graph_load_spark.plans import queries as Q

    monkeypatch.delenv("SPARK_GRAFT_BUCKETED_DB", raising=False)
    inline = sorted(
        map(tuple, QUERIES["ann_ivf_pq_topk"](spark, sf_dir).collect())
    )
    spark.catalog.clearCache()

    monkeypatch.setenv("SPARK_GRAFT_BUCKETED_DB", registry_bucketdb)
    Q._BUCKETED_SF.clear()
    df = QUERIES["ann_ivf_pq_topk"](spark, sf_dir)
    plan = _explain(df)
    pf = _re.findall(r"PartitionFilters: \[[^\]]*cell[^\]]*\bIN\b[^\]]*\]", plan)
    assert pf, plan
    served = sorted(map(tuple, df.collect()))
    spark.catalog.clearCache()
    assert served == inline and len(served) > 0
