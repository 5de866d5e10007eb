"""Dedup operator semantics: MinHash/LSH, SimHash, Jaccard, embedding LSH.

Property-style checks on tiny literal corpora (exact expectations, no
oracle round-trip — scripts/oracle_check.py covers engine parity).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from substreams_sink_graph_load_spark.functions.hashing import (
    PRIME31,
    perm_params,
)
from substreams_sink_graph_load_spark.operators.dedup import (
    embedding_neardup_pairs,
    minhash_candidate_pairs,
    minhash_sketch,
    ngram_jaccard_pairs,
    simhash_sketch,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog", "a"),
    (2, "the quick brown fox jumps over the lazy dog", "a"),  # exact dup
    (3, "the quick brown fox leaps over the lazy dog", "a"),  # near dup
    (4, "completely different words entirely unrelated text here", "a"),
    (5, "the quick brown fox jumps over the lazy dog", "b"),  # dup, other bucket
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, source string")


def test_perm_params_deterministic():
    assert perm_params(4) == perm_params(4)
    assert all(a != 0 and 0 <= b < PRIME31 for a, b in perm_params(16))


def test_minhash_identical_docs_identical_sketch(docs, spark):
    sk = minhash_sketch(docs, "doc_id", "text").collect()
    by_id = {r["doc_id"]: r for r in sk}
    assert by_id[1]["sig"] == by_id[2]["sig"] == by_id[5]["sig"]
    for b in range(4):
        assert by_id[1][f"band_{b}"] == by_id[2][f"band_{b}"]
    # near-dup shares most signature positions, disjoint doc shares few
    agree = lambda x, y: sum(a == b for a, b in zip(by_id[x]["sig"], by_id[y]["sig"]))
    assert agree(1, 3) > agree(1, 4)


def test_minhash_pairs_find_dups(docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r
        for r in minhash_candidate_pairs(docs, "doc_id", "text").collect()
    }
    assert pairs[(1, 2)]["n_sig_agree"] == 16
    assert pairs[(1, 2)]["n_shared_bands"] == 4
    assert (1, 4) not in pairs  # unrelated docs never collide on a band


def test_minhash_max_bucket_caps_skew(spark):
    # 30 copies of one doc: bucket cap excludes the hot bucket entirely
    rows = [(i, "same text repeated everywhere", "s") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    capped = minhash_candidate_pairs(df, "doc_id", "text", max_bucket=10)
    assert capped.count() == 0
    uncapped = minhash_candidate_pairs(df, "doc_id", "text")
    assert uncapped.count() == 30 * 29 // 2


def test_simhash_properties(docs, spark):
    out = {
        r["doc_id"]: r["simhash"]
        for r in simhash_sketch(docs, "doc_id", "text").collect()
    }
    assert out[1] == out[2]  # identical text -> identical simhash
    assert 0 <= out[1] < (1 << 60)
    ham = lambda x, y: bin(x ^ y).count("1")
    assert ham(out[1], out[3]) < ham(out[1], out[4])  # near-dup closer


def test_ngram_jaccard_blocking(docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard_ppm"]
        for r in ngram_jaccard_pairs(
            docs, bucket_cols=("source",), min_jaccard_ppm=0
        ).collect()
    }
    assert pairs[(1, 2)] == 1_000_000  # identical -> jaccard 1.0
    assert (1, 5) not in pairs  # different source bucket: never compared
    assert 0 < pairs[(1, 3)] < 1_000_000


def test_embedding_neardup(spark):
    import math

    base = [math.sin(i * 0.7) for i in range(16)]
    near = [x + 0.01 for x in base]
    anti = [-x for x in base]
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, anti)], "vec_id long, embedding array<double>"
    )
    pairs = {
        (r["vec_a"], r["vec_b"]): r["cos_ppm"]
        for r in embedding_neardup_pairs(
            df, dim=16, min_cos_ppm=900_000
        ).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] > 990_000
    assert (1, 3) not in pairs  # antipodal: opposite signs, no band collision


def test_minhash_signature_expression_matches_sketch(spark, docs):
    """The library array-expression formulation (functions.hashing.
    minhash_signature — correct but interpreted; kept for column-level
    composition) must produce the identical signature the production
    explode+agg sketch computes."""
    from pyspark.sql import functions as F

    from substreams_sink_graph_load_spark.functions.hashing import (
        minhash_signature,
    )
    from substreams_sink_graph_load_spark.functions.text import word_shingles

    expr = {
        r["doc_id"]: r["sig"]
        for r in docs.select(
            "doc_id",
            minhash_signature(word_shingles(F.col("text"), 2), 16).alias("sig"),
        ).collect()
    }
    sketch = {
        r["doc_id"]: r["sig"] for r in minhash_sketch(docs, "doc_id", "text").collect()
    }
    assert expr == sketch


def test_ngram_jaccard_max_bucket(spark):
    """A hot blocking bucket (boilerplate repeated past the cap) is dropped
    BEFORE the self-join -- same guard as minhash_candidate_pairs; the cold
    bucket's pairs are unaffected."""
    rows = [(i, "hot boilerplate page text", "hot") for i in range(10)]
    rows += [(100, "the quick brown fox", "cold"), (101, "the quick brown fox", "cold")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    capped = ngram_jaccard_pairs(
        df, bucket_cols=("source",), min_jaccard_ppm=0, max_bucket=5
    ).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in capped}
    assert got == {(100, 101)}  # 45 hot pairs routed away, cold survives
    uncapped = ngram_jaccard_pairs(
        df, bucket_cols=("source",), min_jaccard_ppm=0
    ).count()
    assert uncapped == 45 + 1


def test_connected_components_paths_agree(spark):
    """The driver union-find and the distributed min-label loop produce the
    same (id, cluster_id) labeling; cluster_id is the component's min id,
    including across a 4-hop chain."""
    from substreams_sink_graph_load_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (30, 31), (31, 32)],
        "src long, dst long",
    )
    want = {
        (1, 1), (2, 1), (3, 1), (4, 1), (5, 1),
        (10, 10), (11, 10),
        (30, 30), (31, 30), (32, 30),
    }
    small = {
        (r["id"], r["cluster_id"])
        for r in connected_components(pairs).collect()
    }
    big = {
        (r["id"], r["cluster_id"])
        for r in connected_components(pairs, small_graph_rows=0).collect()
    }
    assert small == want
    assert big == want


def test_connected_components_deep_chain_and_random(spark):
    """The distributed star-contraction path must match union-find on (a) a
    64-hop chain — deeper than the round cap, where per-round label
    propagation would NOT converge — and (b) a seeded random graph."""
    import random

    from substreams_sink_graph_load_spark.operators.dedup import (
        connected_components,
    )

    chain = [(i, i + 1) for i in range(100, 164)]
    rng = random.Random(11)
    rand = [
        (rng.randrange(0, 60), rng.randrange(0, 60)) for _ in range(80)
    ]
    rand = [(a, b) for a, b in rand if a != b]
    pairs = spark.createDataFrame(chain + rand, "src long, dst long")
    small = {
        (r["id"], r["cluster_id"])
        for r in connected_components(pairs).collect()
    }
    big = {
        (r["id"], r["cluster_id"])
        for r in connected_components(pairs, small_graph_rows=0).collect()
    }
    assert small == big
    # the whole chain collapses to its minimum
    assert all(small_lbl == 100 for (n, small_lbl) in small if n >= 100)


def test_connected_components_self_loops_are_singletons(spark):
    """Self-loop-only nodes survive as singleton clusters on BOTH paths
    (the star path filters self-loops for contraction but must not lose
    the nodes)."""
    from substreams_sink_graph_load_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (5, 5), (7, 7), (2, 2)], "src long, dst long"
    )
    want = {(1, 1), (2, 1), (5, 5), (7, 7)}
    for thr in (5_000_000, 0):
        got = {
            (r["id"], r["cluster_id"])
            for r in connected_components(pairs, small_graph_rows=thr).collect()
        }
        assert got == want, (thr, sorted(got))
    only_selfs = spark.createDataFrame([(3, 3), (9, 9)], "src long, dst long")
    for thr in (5_000_000, 0):
        got = {
            (r["id"], r["cluster_id"])
            for r in connected_components(
                only_selfs, small_graph_rows=thr
            ).collect()
        }
        assert got == {(3, 3), (9, 9)}, (thr, sorted(got))


def test_fuzzy_pairs_match_bruteforce(spark):
    """Length-band blocking is lossless and exactly-once: on a mixed-length
    single-source corpus, fuzzy_candidate_pairs == the naive O(n^2)
    Levenshtein self-join (band-emit must neither drop a cross-band pair
    nor double-count an equal-band one)."""
    import random

    from substreams_sink_graph_load_spark.operators.dedup import (
        fuzzy_candidate_pairs,
    )

    rng = random.Random(7)
    alpha = "abcdef"
    rows = [
        (i, "".join(rng.choice(alpha) for _ in range(rng.randrange(1, 25))), "s")
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, head string, source string")
    got = {
        (r["doc_a"], r["doc_b"], r["dist"])
        for r in fuzzy_candidate_pairs(
            df, text_col="head", max_dist=4
        ).collect()
    }
    a, b = df.alias("a"), df.alias("b")
    lev = F.levenshtein(F.col("a.head"), F.col("b.head"))
    want = {
        (r["doc_a"], r["doc_b"], r["dist"])
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .where(lev <= 4)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            lev.cast("int").alias("dist"),
        )
        .collect()
    }
    assert got == want and len(got) > 0
    # exactly-once also as a multiset property
    n_rows = fuzzy_candidate_pairs(df, text_col="head", max_dist=4).count()
    assert n_rows == len(got)


def test_fuzzy_max_bucket_drops_hot_band_only(spark):
    """The cap counts docs per TRUE band before the explode: a hot band is
    dropped wholesale, while a cold neighboring band keeps its own
    equal-band pairs (the post-explode cap this replaced dropped them,
    because the k-bucket mixed the hot band's overlap emissions in)."""
    from substreams_sink_graph_load_spark.operators.dedup import (
        fuzzy_candidate_pairs,
    )

    # max_dist=4 -> band = floor(len/4). Band 1 (len 4..7) hot: 10 docs.
    # Band 2 (len 8..11) cold: two docs within edit distance 4.
    rows = [(i, "abcde", "s") for i in range(10)]
    rows += [(100, "abcdefgh", "s"), (101, "abcdefgg", "s")]
    df = spark.createDataFrame(rows, "doc_id long, head string, source string")
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in fuzzy_candidate_pairs(
            df, text_col="head", max_dist=4, max_bucket=5
        ).collect()
    }
    assert capped == {(100, 101)}  # hot band routed away, cold band intact
    uncapped = fuzzy_candidate_pairs(df, text_col="head", max_dist=4).count()
    assert uncapped == 45 + 10 * 2 + 1  # hot pairs + cross-band + cold pair


def test_connected_components_raises_without_fixpoint(spark):
    """A distributed run that exhausts max_rounds before the star fixpoint
    must RAISE, never return labels computed from a half-contracted edge
    set (one component silently splitting into several cluster_ids)."""
    from substreams_sink_graph_load_spark.operators.dedup import (
        connected_components,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(200, 264)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="fixpoint"):
        connected_components(
            chain, small_graph_rows=0, max_rounds=1
        ).collect()
    # the same graph converges comfortably inside the default cap
    got = {
        (r["id"], r["cluster_id"])
        for r in connected_components(chain, small_graph_rows=0).collect()
    }
    assert all(lbl == 200 for _n, lbl in got)


def test_connected_components_rejects_string_ids(spark):
    """The driver-collect gate assumes 16 B/edge (two longs); string ids
    would break that budget silently, so they error loudly instead."""
    import pytest

    from substreams_sink_graph_load_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    with pytest.raises(TypeError, match="integral node ids"):
        connected_components(pairs)


def test_gram_sets_matches_word_shingles_expression(spark, docs):
    """Cross-implementation differential for the r9 doc-local builder:
    gram_sets' Python shingling must equal the word_shingles Column
    expression as a SET per doc, and hashed=True must equal h60 applied
    to those same grams."""
    from substreams_sink_graph_load_spark.functions.hashing import h60
    from substreams_sink_graph_load_spark.functions.text import word_shingles
    from substreams_sink_graph_load_spark.operators.dedup import gram_sets

    edge = spark.createDataFrame(
        DOCS
        + [
            (6, "single", "a"),            # < k words: whole-text fallback
            (7, "", "a"),                  # empty string
            (8, " leading  double", "a"),  # empty tokens kept
        ],
        "doc_id long, text string, source string",
    )
    exp = {
        r["doc_id"]: set(r["g"])
        for r in edge.select(
            "doc_id", word_shingles(F.col("text"), 2).alias("g")
        ).collect()
    }
    got = {
        r["doc_id"]: set(r["grams"])
        for r in gram_sets(edge, "doc_id", "text", 2).collect()
    }
    assert got == exp
    exp_h = {
        r["doc_id"]: set(r["g"])
        for r in edge.select(
            "doc_id",
            F.transform(word_shingles(F.col("text"), 2), h60).alias("g"),
        ).collect()
    }
    got_h = {
        r["doc_id"]: set(r["grams"])
        for r in gram_sets(edge, "doc_id", "text", 2, hashed=True).collect()
    }
    assert got_h == exp_h


def test_text_folds_on_randomized_corpus(spark):
    """Seeded randomized corpus with adversarial token shapes (empty
    strings, leading/trailing/consecutive spaces, unicode, single
    words): the doc-local Python folds must agree with the JVM column
    expressions — gram_sets vs word_shingles, minhash_sketch vs
    minhash_signature — over ALL of it in one job."""
    import random

    from substreams_sink_graph_load_spark.functions.hashing import h60
    from substreams_sink_graph_load_spark.functions.text import word_shingles
    from substreams_sink_graph_load_spark.operators.dedup import (
        gram_sets,
        minhash_sketch,
    )
    from substreams_sink_graph_load_spark.functions.hashing import (
        minhash_signature,
    )

    rng = random.Random(20260816)
    words = ["a", "bb", "ccc", "", "δοκ", "日本", "x" * 50, "0"]
    texts = []
    for _ in range(200):
        n = rng.randrange(0, 12)
        texts.append(" ".join(rng.choice(words) for _ in range(n)))
    texts += ["", " ", "  ", "one", "δοκ 日本 δοκ"]
    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )

    exp = {
        r["doc_id"]: set(r["g"])
        for r in corpus.select(
            "doc_id", word_shingles(F.col("text"), 2).alias("g")
        ).collect()
    }
    got = {
        r["doc_id"]: set(r["grams"])
        for r in gram_sets(corpus, "doc_id", "text", 2).collect()
    }
    assert got == exp

    exp_sig = {
        r["doc_id"]: list(r["sig"])
        for r in corpus.select(
            "doc_id",
            minhash_signature(word_shingles(F.col("text"), 2), 16).alias(
                "sig"
            ),
        ).collect()
    }
    got_sig = {
        r["doc_id"]: list(r["sig"])
        for r in minhash_sketch(corpus, "doc_id", "text").collect()
    }
    assert got_sig == exp_sig
