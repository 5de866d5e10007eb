"""Misra-Gries heavy hitters + SimHash Hamming pairs (operators/sketch.py
and the simhash_hamming_pairs / heavy_hitters_phrases registry queries)."""

from __future__ import annotations

from collections import Counter

import pytest

from pyspark.sql import functions as F

from substreams_sink_graph_load_spark.operators.sketch import (
    heavy_hitters_exact,
    misra_gries_candidates,
)

SF_DIR = "/root/testdata/sf0.001"


def _stream(spark, words, partitions):
    return spark.createDataFrame(
        [(w,) for w in words], "term string"
    ).repartition(partitions)


def test_mg_candidates_superset(spark):
    # skewed stream: 'hot' has freq 60 of n=160 >> n/(cap+1); tail of 100
    # distinct singletons forces evictions at capacity 8
    words = ["hot"] * 60 + [f"t{i}" for i in range(100)]
    cands = set(
        r["term"]
        for r in misra_gries_candidates(
            _stream(spark, words, 4), "term", capacity=8
        ).collect()
    )
    assert "hot" in cands
    # summary size bound: <= capacity per partition
    per_part = (
        misra_gries_candidates(_stream(spark, words, 4), "term", capacity=8)
        .groupBy(F.spark_partition_id().alias("p"))
        .count()
        .collect()
    )
    assert all(r["count"] <= 8 for r in per_part)


@pytest.mark.parametrize("partitions", [1, 3, 7])
def test_heavy_hitters_exact_any_partitioning(spark, partitions):
    # exact answer must be partitioning-invariant: the MG pass only
    # over-approximates, the recount trims to {term: freq*k > n}
    words = (
        ["a"] * 50 + ["b"] * 30 + ["c"] * 11 + [f"t{i}" for i in range(109)]
    )
    n, k = len(words), 20  # threshold n/k = 10
    truth = {t: c for t, c in Counter(words).items() if c * k > n}
    got = {
        r["term"]: r["freq"]
        for r in heavy_hitters_exact(
            _stream(spark, words, partitions), "term", k=k, capacity=32
        ).collect()
    }
    assert got == truth == {"a": 50, "b": 30, "c": 11}


def test_heavy_hitters_capacity_guard(spark):
    with pytest.raises(ValueError, match="superset"):
        heavy_hitters_exact(_stream(spark, ["x"], 1), "term", k=10, capacity=5)
    with pytest.raises(ValueError, match="capacity"):
        misra_gries_candidates(_stream(spark, ["x"], 1), "term", capacity=0)


def test_heavy_hitters_phrases_planted_boilerplate(spark):
    from substreams_sink_graph_load_spark.plans.queries import (
        _BOILER_SQL,
        heavy_hitters_phrases,
    )

    rows = heavy_hitters_phrases(spark, SF_DIR).collect()
    ws = _BOILER_SQL.split(" ")
    interior = {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
    assert {r["gram"] for r in rows} == interior
    # every planted doc contributes each interior gram exactly once
    n_planted = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .where(F.col("doc_id") % 20 == 0)
        .count()
    )
    assert {r["freq"] for r in rows} == {n_planted}


def test_minhash_recall_eval_tier_split(spark):
    # the measured identity the eval exists for: MinHash-LSH recall is
    # exactly 1.0 on SimHash-ball pairs with true Jaccard >= 0.2, and the
    # misses are all profile-collisions below the threshold
    from substreams_sink_graph_load_spark.plans.queries import (
        minhash_recall_eval,
    )

    rows = minhash_recall_eval(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        if r["jaccard_ppm"] >= 200_000:
            assert r["found"] == 1, (r["doc_a"], r["doc_b"])
        assert r["hamming"] <= 3
        assert (r["n_shared_bands"] > 0) == (r["found"] == 1)


def test_simhash_hamming_pairs_vs_bruteforce(spark):
    # pigeonhole recall: banded plan == quadratic scan, exactly
    from substreams_sink_graph_load_spark.operators.dedup import (
        simhash_sketch,
    )
    from substreams_sink_graph_load_spark.plans.queries import (
        simhash_hamming_pairs,
    )

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sims = {
        r["doc_id"]: r["simhash"]
        for r in simhash_sketch(d, "doc_id", "text").collect()
    }
    ids = sorted(sims)
    truth = {
        (a, b, bin(sims[a] ^ sims[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sims[a] ^ sims[b]).count("1") <= 3
    }
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_hamming_pairs(spark, SF_DIR).collect()
    }
    assert got == truth
    assert len(got) > 0  # fixture has exact dups -> Hamming-0 pairs exist
