"""Every registry query vs its DuckDB oracle — the same comparison the
driver runs (row count + column names + order-insensitive values), executed
locally at sf0.001 so mismatches surface before the driver's sf0.01 gate."""

import math

import duckdb
import pandas as pd
import pytest

from substreams_sink_graph_load_spark.plans import QUERIES, ORACLES

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, ddb, name):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    odf = ddb.execute(ORACLES[name]).df()

    assert len(sdf) == len(odf), f"{name}: row count {len(sdf)} vs {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: columns {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    )
    s, o = canon(sdf), canon(odf)
    for c in s.columns:
        sv, ov = s[c].tolist(), o[c].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                assert a == b, f"{name}.{c}[{i}]: {a!r} != {b!r}"
            else:
                assert str(a) == str(b), f"{name}.{c}[{i}]: {a!r} != {b!r}"


def test_all_queries_have_callable():
    assert len(QUERIES) >= 25
    for name, fn in QUERIES.items():
        assert callable(fn), name


def test_approx_distinct_within_rsd(spark, sf_dir):
    """The registry entry's sketch-contract boolean holds and its exact
    cardinality column really is countDistinct (the hash-oracle design:
    the HLL estimate is checked against the in-plan exact value)."""
    from pyspark.sql import functions as F

    from substreams_sink_graph_load_spark.plans import QUERIES

    rows = {
        r["event_type"]: r
        for r in QUERIES["agg_approx_distinct"](spark, sf_dir).collect()
    }
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert rows[k]["exact_users"] == n
        assert rows[k]["approx_within_5pct"] is True


def test_approx_percentile_rank_bound(spark, sf_dir):
    """approx_percentile(accuracy=10000) must return values whose
    empirical CDF brackets the requested quantile within 2% rank error
    (the sketch's guarantee is n/accuracy, far tighter at test sizes)."""
    import numpy as np

    from substreams_sink_graph_load_spark.plans import QUERIES

    got = {
        r["l_returnflag"]: (r["p25"], r["p50"], r["p75"])
        for r in QUERIES["agg_approx_percentile"](spark, sf_dir).collect()
    }
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    data = {}
    for r in l.select("l_returnflag", "l_quantity").collect():
        data.setdefault(r["l_returnflag"], []).append(r["l_quantity"])
    for flag, (p25, p50, p75) in got.items():
        xs = np.sort(np.array(data[flag], dtype=float))
        n = len(xs)
        for q, v in ((0.25, p25), (0.5, p50), (0.75, p75)):
            # fraction of data strictly below / at-or-below the returned
            # value must bracket q (within 2% rank slack)
            lo = np.searchsorted(xs, v, side="left") / n
            hi = np.searchsorted(xs, v, side="right") / n
            assert lo - 0.02 <= q <= hi + 0.02, (flag, q, v, lo, hi)
