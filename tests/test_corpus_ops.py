"""Semantic unit tests for the round-5 corpus operators on crafted
inputs where the expected output is hand-computable: exact-substring
removal (dedup_substring_remove), the corpus bigram-LM quality signal
(quality_lm_bigram), and the cohort retention matrix (events_retention).
Cross-engine parity at testdata scale is pinned separately by
test_oracle_parity; these pin the SEMANTICS."""

from __future__ import annotations

import datetime
import hashlib

import pytest

from substreams_sink_graph_load_spark.plans.queries import QUERIES


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


@pytest.fixture()
def doc_dir(spark, tmp_path):
    """A documents.parquet with the driver schema and a corpus whose
    duplicated-8-gram structure is hand-checkable."""
    rows = [
        # docs 1 and 2 share the 8-gram "a b c d e f g h" at position 0:
        # words 0..7 are covered in both, the 3-word tails survive
        (1, "a b c d e f g h x y z", "en", "s0"),
        (2, "a b c d e f g h p q r", "en", "s0"),
        # 7 words: no 8-gram exists, nothing can be removed
        (3, "one two three four five six seven", "en", "s0"),
        # within-doc repeat: the gram at pos 0 recurs at pos 8, so BOTH
        # spans are covered and the whole doc is cut
        (4, "r1 r2 r3 r4 r5 r6 r7 r8 r1 r2 r3 r4 r5 r6 r7 r8", "en", "s0"),
    ]
    df = spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_substring_remove_semantics(spark, doc_dir):
    out = {
        r["doc_id"]: r
        for r in QUERIES["dedup_substring_remove"](spark, doc_dir).collect()
    }
    assert out[1]["n_words"] == 11 and out[1]["n_removed"] == 8
    assert out[1]["kept_md5"] == _md5("x y z")
    assert out[2]["n_words"] == 11 and out[2]["n_removed"] == 8
    assert out[2]["kept_md5"] == _md5("p q r")
    # too short for any 8-gram: untouched
    assert out[3]["n_removed"] == 0
    assert out[3]["kept_md5"] == _md5("one two three four five six seven")
    # within-doc duplication counts: everything removed
    assert out[4]["n_words"] == 16 and out[4]["n_removed"] == 16
    assert out[4]["kept_md5"] == _md5("")


@pytest.fixture()
def lm_dir(spark, tmp_path):
    rows = [
        (1, "the cat sat", "en", "s0"),
        (2, "the cat ran", "en", "s0"),
        (3, "dog", "en", "s0"),  # 1 word: no bigram, absent from output
    ]
    spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_lm_bigram_semantics(spark, lm_dir):
    out = {
        r["doc_id"]: r
        for r in QUERIES["quality_lm_bigram"](spark, lm_dir).collect()
    }
    # corpus frequencies: "the cat"=2, "cat sat"=1, "cat ran"=1
    assert set(out) == {1, 2}
    for d in (1, 2):
        assert out[d]["n_bigrams"] == 2
        assert out[d]["oov_bigrams"] == 1
        # floor(log2(2)) + floor(log2(1)) = 1
        assert out[d]["sum_log2_freq"] == 1


@pytest.fixture()
def events_dir(spark, tmp_path):
    def ts(day, hour=0):
        return datetime.datetime(2024, 1, day, hour)

    rows = [
        # user 1: first day Jan 1 (two events that day), then Jan 2, Jan 4
        (0, ts(1, 1), 1, "view", 1.0, "{}"),
        (1, ts(1, 9), 1, "click", 1.0, "{}"),
        (2, ts(2), 1, "view", 1.0, "{}"),
        (3, ts(4), 1, "view", 1.0, "{}"),
        # user 2: first day Jan 2, then Jan 4
        (4, ts(2), 2, "view", 1.0, "{}"),
        (5, ts(4), 2, "purchase", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def test_retention_semantics(spark, events_dir):
    out = {
        (r["cohort_day"], r["day_offset"]): r["n_users"]
        for r in QUERIES["events_retention"](spark, events_dir).collect()
    }
    assert out == {
        ("2024-01-01", 0): 1,  # user 1, multiple same-day events count once
        ("2024-01-01", 1): 1,
        ("2024-01-01", 3): 1,
        ("2024-01-02", 0): 1,  # user 2
        ("2024-01-02", 2): 1,
    }


def test_substring_remove_matches_python_reference(spark, tmp_path):
    """Randomized differential: 80 docs over a 12-word vocabulary (heavy
    gram collisions by construction) vs a direct Python replay of the
    rule — any word covered by a corpus-duplicated 8-gram is cut."""
    import random

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(12)]
    docs = {}
    for d in range(80):
        n = rng.randint(0, 30)
        docs[d] = " ".join(rng.choice(vocab) for _ in range(n))
    # plant guaranteed cross-doc duplicate spans
    span = "a b c d e f g h"
    docs[80] = f"{span} tail80"
    docs[81] = f"head81 {span}"

    spark.createDataFrame(
        [(d, t, "en", "s0", len(t)) for d, t in docs.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )

    from collections import Counter

    k = 8
    words = {d: t.split(" ") for d, t in docs.items()}
    grams = Counter()
    for ws in words.values():
        for i in range(len(ws) - k + 1):
            grams[" ".join(ws[i : i + k])] += 1
    want = {}
    for d, ws in words.items():
        cov = [False] * len(ws)
        for i in range(len(ws) - k + 1):
            if grams[" ".join(ws[i : i + k])] > 1:
                for j in range(i, i + k):
                    cov[j] = True
        kept = " ".join(w for w, c in zip(ws, cov) if not c)
        want[d] = (len(ws), sum(cov), _md5(kept))

    got = {
        r["doc_id"]: (r["n_words"], r["n_removed"], r["kept_md5"])
        for r in QUERIES["dedup_substring_remove"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == want


def test_gapfill_semantics(spark, tmp_path):
    """Crafted gaps: missing hours materialize with cnt=0 and carry the
    last observed value forward; hours before a type's first observation
    fill 0 (grid spans the CORPUS hour range, not per-type)."""
    import datetime as dt

    rows = [
        # "view": hours 0 and 3 observed; 1-2 are gaps
        (0, dt.datetime(2024, 1, 1, 0, 15), 1, "view", 1.50, "{}"),
        (1, dt.datetime(2024, 1, 1, 3, 5), 1, "view", 2.25, "{}"),
        # "click": first observed at hour 2 — hours 0-1 must fill 0
        (2, dt.datetime(2024, 1, 1, 2, 40), 2, "click", 4.00, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = {
        (r["event_type"], r["hour"]): (r["cnt"], r["filled_cents"])
        for r in QUERIES["events_gapfill"](spark, str(tmp_path)).collect()
    }
    assert out == {
        ("view", "2024-01-01 00:00:00"): (1, 150),
        ("view", "2024-01-01 01:00:00"): (0, 150),   # gap: LOCF
        ("view", "2024-01-01 02:00:00"): (0, 150),
        ("view", "2024-01-01 03:00:00"): (1, 225),
        ("click", "2024-01-01 00:00:00"): (0, 0),    # before first obs
        ("click", "2024-01-01 01:00:00"): (0, 0),
        ("click", "2024-01-01 02:00:00"): (1, 400),
        ("click", "2024-01-01 03:00:00"): (0, 400),
    }


def test_semantic_clusters_semantics(spark, tmp_path):
    """Planted embedding near-dup groups must cluster to their lowest
    vec_id; unrelated vectors must not appear in the output."""
    import numpy as np

    rng = np.random.default_rng(3)
    rows = []
    # two planted groups: ids (0,1,2) share one direction, (10,11) another
    base_a = rng.normal(size=64)
    base_b = rng.normal(size=64)
    for vid, base in [(0, base_a), (1, base_a), (2, base_a),
                      (10, base_b), (11, base_b)]:
        v = base + rng.normal(scale=0.01, size=64)
        v = v / np.linalg.norm(v)
        rows.append((vid, [float(x) for x in v], 0))
    # 30 isolated random vectors (pairwise cosine ~N(0, 1/8) — far
    # below the 0.4 threshold)
    for vid in range(100, 130):
        v = rng.normal(size=64)
        v = v / np.linalg.norm(v)
        rows.append((vid, [float(x) for x in v], 1))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    out = {
        r["vec_id"]: r["keep_id"]
        for r in QUERIES["dedup_semantic_clusters"](
            spark, str(tmp_path)
        ).collect()
    }
    # the registry shape unions exact copies of every 10th vector at
    # +1,000,000 (the planted-fixture oracle contract): group A absorbs
    # copy(0), group B absorbs copy(10), and each copied ISOLATED vector
    # forms a 2-clique with its twin keeping the original id
    assert out[0] == 0 and out[1] == 0 and out[2] == 0
    assert out[1_000_000] == 0
    assert out[10] == 10 and out[11] == 10 and out[1_000_010] == 10
    for v in (100, 110, 120):
        assert out[v] == v and out[1_000_000 + v] == v
    # non-copied isolated vectors never entered the candidate graph
    expected = {0, 1, 2, 1_000_000, 10, 11, 1_000_010} | {
        x for v in (100, 110, 120) for x in (v, 1_000_000 + v)
    }
    assert set(out) == expected
