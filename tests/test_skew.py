"""Salted aggregation/join must be result-identical to the plain versions."""

import pytest

from pyspark.sql import functions as F

from substreams_sink_graph_load_spark.operators.skew import salted_agg, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90%), a few cold ones
    return spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(
            F.concat(F.lit("cold"), (F.col("id") % 7).cast("string"))
        ).alias("k"),
        (F.col("id") % 100).alias("v"),
    )


def test_salted_agg_matches_plain(spark, skewed):
    plain = {
        r["k"]: (r["s"], r["n"], r["mn"], r["mx"])
        for r in skewed.groupBy("k").agg(
            F.sum("v").alias("s"), F.count("v").alias("n"),
            F.min("v").alias("mn"), F.max("v").alias("mx"),
        ).collect()
    }
    salted = {
        r["k"]: (r["s"], r["n"], r["mn"], r["mx"])
        for r in salted_agg(
            skewed, ["k"],
            {"s": ("sum", "v"), "n": ("count", "v"),
             "mn": ("min", "v"), "mx": ("max", "v")},
            salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_agg_rejects_nonmergeable(skewed):
    with pytest.raises(ValueError, match="non-mergeable"):
        salted_agg(skewed, ["k"], {"a": ("avg", "v")})


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", 1), ("cold0", 2), ("cold3", 3)], "k string, w int"
    )
    plain = sorted(
        (r["k"], r["v"], r["w"]) for r in skewed.join(dim, "k").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["w"])
        for r in salted_join(skewed, dim, ["k"], salts=4).collect()
    )
    assert salted == plain
