"""Text-analysis expression semantics (functions/text.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from substreams_sink_graph_load_spark.functions.text import (
    quality_score_ppm,
    rolling_fingerprint,
    token_split,
    word_shingles,
)


@pytest.fixture(scope="module")
def one(spark):
    def run(text, expr):
        df = spark.createDataFrame([(text,)], "text string")
        return df.select(expr.alias("v")).collect()[0]["v"]

    return run


def test_word_shingles(one):
    assert sorted(one("a b c d", word_shingles(F.col("text"), 2))) == [
        "a b", "b c", "c d",
    ]
    # distinct: repeated grams collapse
    assert one("x y x y x y", word_shingles(F.col("text"), 2)) == ["x y", "y x"]
    # shorter than k: whole text is the single shingle
    assert one("solo", word_shingles(F.col("text"), 3)) == ["solo"]


def test_token_split(one):
    assert one("ab 12 c!d", token_split(F.col("text"))) == [
        "ab", "12", "c", "!", "d",
    ]


def test_rolling_fingerprint_order_sensitive(one):
    fp = lambda t: one(t, rolling_fingerprint(F.col("text")))
    assert fp("a b c") == fp("a b c")
    assert fp("a b c") != fp("c b a")  # order matters (vs MinHash)
    assert 0 <= fp("anything at all") < (1 << 31)


def test_quality_score_bounds(one):
    q = lambda t: one(t, quality_score_ppm(F.col("text"), ["data", "row"]))
    assert 0 <= q("data row data row") <= 1_000_000
    assert q("data row unique words here") > q("!!! ??? !!! ???")
