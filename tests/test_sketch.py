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


def test_heavy_hitters_property(spark):
    # randomized streams: MG candidates + exact recount == Counter truth,
    # under an adversarial partitioning, for every (k, capacity) tried
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(
        st.lists(
            st.sampled_from([f"w{i}" for i in range(12)]),
            min_size=1,
            max_size=400,
        ),
        st.integers(min_value=2, max_value=12),
    )
    def check(words, k):
        n = len(words)
        truth = {t: c for t, c in Counter(words).items() if c * k > n}
        got = {
            r["term"]: r["freq"]
            for r in heavy_hitters_exact(
                _stream(spark, words, 3), "term", k=k, capacity=k
            ).collect()
        }
        assert got == truth

    check()


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


def test_winnow_fingerprints_vs_python_reference(spark):
    # independent pure-Python winnower (rightmost-min per window, the
    # SIGMOD'03 selection) vs the single-window-pass integer-key plan
    import hashlib

    from substreams_sink_graph_load_spark.operators.dedup import (
        winnow_fingerprints,
    )

    def h60_py(s):
        return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big") >> 4

    def ref_fps(text, k=3, w=4):
        ws = text.split(" ")
        hs = [
            h60_py(" ".join(ws[i : i + k])) for i in range(len(ws) - k + 1)
        ]
        m = len(hs)
        out = set()
        for p in range(0, max(m - w, 0) + (1 if m else 0)):
            win = range(p, min(p + w, m))
            best = min(win, key=lambda q: (hs[q], -q))
            out.add((best, hs[best]))
        return out

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got: dict[int, set] = {}
    for r in winnow_fingerprints(d).collect():
        got.setdefault(r["doc_id"], set()).add((r["fp_pos"], r["fp_hash"]))
    for r in d.select("doc_id", "text").collect():
        assert got.get(r["doc_id"], set()) == ref_fps(r["text"]), r["doc_id"]


def test_winnow_local_guarantee(spark):
    # the SIGMOD'03 guarantee: a shared run of >= w+k-1 = 6 words yields
    # a shared fingerprint — two synthetic docs sharing exactly one
    # 6-word passage must pair up
    from substreams_sink_graph_load_spark.operators.dedup import (
        winnow_shared_pairs,
    )

    passage = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, f"one two three {passage} four five six"),
        (2, f"seven eight nine ten {passage} eleven"),
        (3, "twelve thirteen fourteen fifteen sixteen seventeen eighteen"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in winnow_shared_pairs(d, min_shared=1).collect()
    }
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_winnow_guard(spark):
    from substreams_sink_graph_load_spark.operators.dedup import (
        winnow_fingerprints,
    )

    d = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="mod-4"):
        winnow_fingerprints(d, w=5)


def test_winnow_remove_planted_passage(spark):
    # the removal twin of the local guarantee: a >= 6-word passage shared
    # by two docs loses at least one 3-gram span from BOTH copies, a
    # clean doc is byte-identical — checked against an independent
    # pure-Python reference of the whole removal pipeline
    import hashlib

    from substreams_sink_graph_load_spark.operators.dedup import (
        winnow_remove,
    )

    passage = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, f"one two three {passage} four five six"),
        (2, f"seven eight nine ten {passage} eleven"),
        (3, "twelve thirteen fourteen fifteen sixteen seventeen eighteen"),
    ]

    def h60_py(s):
        return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big") >> 4

    def ref_fps(text, k=3, w=4):
        ws = text.split(" ")
        hs = [h60_py(" ".join(ws[i : i + k])) for i in range(len(ws) - k + 1)]
        m = len(hs)
        out = set()
        for p in range(0, max(m - w, 0) + (1 if m else 0)):
            win = range(p, min(p + w, m))
            best = min(win, key=lambda q: (hs[q], -q))
            out.add((best, hs[best]))
        return out

    k = 3
    fps = {i: ref_fps(t) for i, t in rows}
    byval: dict[int, set] = {}
    for i, s in fps.items():
        for _, h in s:
            byval.setdefault(h, set()).add(i)
    dup = {h for h, docs in byval.items() if len(docs) >= 2}
    expect = {}
    for i, t in rows:
        ws = t.split(" ")
        cut = set()
        for pos, h in fps[i]:
            if h in dup:
                cut.update(range(pos, pos + k))
        kept = [w for p, w in enumerate(ws) if p not in cut]
        expect[i] = (
            len(ws),
            len(ws) - len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )

    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_words"], r["n_removed"], r["kept_md5"])
        for r in winnow_remove(d).collect()
    }
    assert got == expect
    assert got[1][1] >= k and got[2][1] >= k  # both copies lose a span
    assert got[3][1] == 0  # clean doc untouched
    assert got[3][2] == hashlib.md5(rows[2][1].encode()).hexdigest()


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


def test_text_grams_matches_generic_composition(spark):
    """heavy_hitters_text_grams (gram generation folded into the passes)
    must equal heavy_hitters_exact over the explicitly exploded
    occurrence stream — the r9 fold is a physical change only."""
    import pyspark.sql.functions as F

    from substreams_sink_graph_load_spark.operators.sketch import (
        heavy_hitters_exact,
        heavy_hitters_text_grams,
    )

    rows = [("a b c a b c a b c",)] * 30 + [("x y z w v u",)] * 5 + [
        ("q",),          # < k_gram words: contributes nothing
        (" a b",),       # empty leading token
    ]
    df = spark.createDataFrame(rows, "text string")
    occurrences = (
        df.where(F.size(F.split("text", " ")) >= 3)
        .select(
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(0), F.size(F.split("text", " ")) - 3
                    ),
                    lambda i: F.concat_ws(
                        " ",
                        F.get(F.split("text", " "), i),
                        F.get(F.split("text", " "), i + 1),
                        F.get(F.split("text", " "), i + 2),
                    ),
                )
            ).alias("gram")
        )
    )
    for k in (3, 10):
        exp = {
            (r["gram"], r["freq"])
            for r in heavy_hitters_exact(occurrences, "gram", k=k).collect()
        }
        got = {
            (r["gram"], r["freq"])
            for r in heavy_hitters_text_grams(
                df, "text", k_gram=3, k=k
            ).collect()
        }
        assert got == exp
