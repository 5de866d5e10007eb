"""Round-6 additions: RAG chunking, BM25 ranking, epoch mixing, PageRank.

Each test pins hand-computed semantics on a tiny fixture (the DuckDB
oracle parity at the driver SFs runs separately via oracle_check)."""

from __future__ import annotations

import hashlib
import math

import pytest

from substreams_sink_graph_load_spark.plans.queries import (
    QUERIES,
    _MIX_EPOCH_SQL,
)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, t, "en", src, len(t)) for i, t, src in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


# ---------------------------------------------------------------------------
# docs_chunk_overlap
# ---------------------------------------------------------------------------


def test_chunk_overlap_semantics(spark, tmp_path):
    """W=32/stride=24: a 40-word doc gives chunks [0..31] and [24..39];
    a short doc gives exactly one whole-text chunk."""
    long_words = [f"w{i}" for i in range(40)]
    sf = _write_docs(
        spark,
        tmp_path,
        [(1, " ".join(long_words), "src0"), (2, "tiny doc", "src1")],
    )
    out = {
        (r.doc_id, r.chunk_id): r
        for r in QUERIES["docs_chunk_overlap"](spark, sf).collect()
    }
    assert set(out) == {(1, 0), (1, 1), (2, 0)}
    assert out[(1, 0)].n_words == 32
    assert out[(1, 0)].chunk_md5 == _md5(" ".join(long_words[:32]))
    assert out[(1, 1)].n_words == 16
    assert out[(1, 1)].chunk_md5 == _md5(" ".join(long_words[24:40]))
    assert out[(2, 0)].n_words == 2
    assert out[(2, 0)].chunk_md5 == _md5("tiny doc")


def test_chunk_overlap_exact_multiple_boundary(spark, tmp_path):
    """n == stride emits ONE chunk (no empty tail chunk at start == n)."""
    words = [f"x{i}" for i in range(24)]
    sf = _write_docs(spark, tmp_path, [(7, " ".join(words), "src0")])
    rows = QUERIES["docs_chunk_overlap"](spark, sf).collect()
    assert len(rows) == 1 and rows[0].n_words == 24


# ---------------------------------------------------------------------------
# bm25_search
# ---------------------------------------------------------------------------


def test_bm25_ranking_semantics(spark, tmp_path):
    """Hand-computed BM25 on a 3-doc corpus: higher tf wins within a
    term; shorter docs outrank longer ones at equal tf; non-probe terms
    never appear."""
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "table table table filler filler filler", "src0"),
            (2, "table filler", "src1"),
            (3, "filler filler filler filler", "src2"),
        ],
    )
    rows = QUERIES["bm25_search"](spark, sf).collect()
    assert {r.term for r in rows} == {"table"}
    by_rank = sorted(rows, key=lambda r: r.rank)
    assert [r.doc_id for r in by_rank] == [1, 2]

    # replay doc 1's score: N=3, df=2, tf=3, dl=6, avgdl=4
    idf = (3 - 2 + 0.5) / (2 + 0.5)
    norm = (3 * 2.2) / (3 + 1.2 * (0.25 + 0.75 * (6 / 4)))
    assert by_rank[0].score_milli == round(idf * norm * 1000)
    assert by_rank[0].tf == 3 and by_rank[0].dl == 6


def test_bm25_salted_topk_equals_plain_topk(spark, sf_dir):
    """The salted two-phase top-5 must deliver exactly 5 contiguous
    ranks per probe term on the real corpus (every probe matches >5
    docs there, so a salt-bucket leak would surface as a gap or a
    missing rank)."""
    from pyspark.sql import functions as F

    full = QUERIES["bm25_search"](spark, sf_dir)
    per_term = full.groupBy("term").agg(
        F.count("*").alias("n"), F.collect_list("rank").alias("ranks")
    )
    for r in per_term.collect():
        assert r.n == 5
        assert sorted(r.ranks) == [1, 2, 3, 4, 5]


# ---------------------------------------------------------------------------
# mix_epochs
# ---------------------------------------------------------------------------


def test_mix_epochs_copy_counts(spark, tmp_path):
    """Group recipe: g0=1.5 epochs, g1=0.5 (downsample), g2=2.0, g3=2.75;
    the extra copy fires iff the doc's multiplicative-hash bucket is
    under the fractional threshold."""
    rows = [
        (i, f"doc {i} text", f"src{g}") for i, g in enumerate([0, 1, 2, 3] * 8)
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = QUERIES["mix_epochs"](spark, sf).collect()
    got = {}
    for r in out:
        got.setdefault(r.doc_id, []).append(r.copy_idx)
    n_full = {0: 1, 1: 0, 2: 2, 3: 2}
    thresh = {0: 32768, 1: 32768, 2: 0, 3: 49152}
    for doc_id, g in ((i, g) for i, g in enumerate([0, 1, 2, 3] * 8)):
        bucket = (doc_id * 2654435761) % 65536
        expect = n_full[g] + (1 if bucket < thresh[g] else 0)
        copies = sorted(got.get(doc_id, []))
        assert copies == list(range(expect)), (doc_id, g, bucket)
    # every copy key is unique (replicas never collide downstream)
    keys = [r.sample_key for r in out]
    assert len(keys) == len(set(keys))


def test_mix_epochs_is_repartition_invariant(spark, sf_dir):
    df = QUERIES["mix_epochs"](spark, sf_dir)
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, df.repartition(7).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# graph_pagerank
# ---------------------------------------------------------------------------


def test_pagerank_hand_computed_path_graph(spark):
    """3-node path a-b-c (undirected): replay the integer recursion."""
    from substreams_sink_graph_load_spark.operators.graph import pagerank_ppm

    und = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")]
    edges = spark.createDataFrame(und, "src string, dst string")
    got = {
        r.node: (r.deg, r.rank_ppm)
        for r in pagerank_ppm(edges, iterations=5).collect()
    }
    # python replay of the exact integer recursion
    deg = {"a": 1, "b": 2, "c": 1}
    rank = {n: 1_000_000 for n in deg}
    for _ in range(5):
        nxt = {n: 150_000 for n in deg}
        for u, v in und:
            nxt[v] += (rank[u] * 85) // (100 * deg[u])
        rank = nxt
    assert got == {n: (deg[n], rank[n]) for n in deg}


def test_pagerank_mass_and_hub_ordering(spark):
    """A star graph: the hub outranks every leaf; in-degree-0 nodes get
    exactly the base mass."""
    from substreams_sink_graph_load_spark.operators.graph import pagerank_ppm

    leaves = [f"l{i}" for i in range(6)]
    und = [("hub", l) for l in leaves] + [(l, "hub") for l in leaves]
    und.append(("lonely", "hub"))  # directed-only: nothing flows back
    edges = spark.createDataFrame(und, "src string, dst string")
    got = {r.node: r.rank_ppm for r in pagerank_ppm(edges, iterations=5).collect()}
    assert all(got["hub"] > got[l] for l in leaves)
    assert got["lonely"] == 150_000


def test_pagerank_rejects_bad_damping(spark):
    from substreams_sink_graph_load_spark.operators.graph import pagerank_ppm

    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        pagerank_ppm(edges, damping_pct=0)


# ---------------------------------------------------------------------------
# join_interval_bins
# ---------------------------------------------------------------------------


def test_interval_bins_hand_computed(spark, tmp_path):
    """Three hand-built sessions: within-hour, hour-crossing, and a
    zero-width single-event session."""
    from datetime import datetime

    def ev(eid, uid, h, m):
        return (eid, datetime(2024, 1, 1, h, m), uid, "view", 1.0, "{}")

    rows = [
        ev(1, 1, 10, 30), ev(2, 1, 10, 40),   # u1: [10:30,10:40] in hour 10
        ev(3, 2, 10, 50), ev(4, 2, 11, 10),   # u2: [10:50,11:10] spans 10+11
        ev(5, 3, 12, 5),                       # u3: zero-width in hour 12
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = {
        r.hour_us: r
        for r in QUERIES["join_interval_bins"](spark, str(tmp_path)).collect()
    }
    H = 3_600_000_000
    base = int(datetime(2024, 1, 1).timestamp()) * 1_000_000  # UTC session tz
    h10, h11, h12 = base + 10 * H, base + 11 * H, base + 12 * H
    assert set(out) == {h10, h11, h12}
    assert (out[h10].n_sessions, out[h10].n_users) == (2, 2)
    assert out[h10].busy_us == 10 * 60_000_000 + 10 * 60_000_000
    assert (out[h11].n_sessions, out[h11].busy_us) == (1, 10 * 60_000_000)
    assert (out[h12].n_sessions, out[h12].busy_us) == (1, 0)


# ---------------------------------------------------------------------------
# curriculum_order
# ---------------------------------------------------------------------------


def test_curriculum_order_invariants(spark, sf_dir):
    """Bands follow the fixed thresholds; positions are contiguous
    1..n per (band, bucket) and ordered by score desc, doc_id asc."""
    rows = QUERIES["curriculum_order"](spark, sf_dir).collect()
    # independent score/band replay from the raw documents
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    score = {
        d.doc_id: min(1_000_000, (len(d.text.split(" ")) * 1_000_000) // 100)
        for d in docs
    }

    def band_of(s):
        return 3 if s >= 600_000 else 2 if s >= 400_000 else 1 if s >= 200_000 else 0

    groups = {}
    for r in rows:
        assert r.band == band_of(score[r.doc_id])
        assert (r.doc_id * 2654435761) % 64 == r.bucket
        groups.setdefault((r.band, r.bucket), []).append(r)
    for g in groups.values():
        g.sort(key=lambda r: r.pos_in_bucket)
        assert [r.pos_in_bucket for r in g] == list(range(1, len(g) + 1))
        order = [(-score[r.doc_id], r.doc_id) for r in g]
        assert order == sorted(order)


# ---------------------------------------------------------------------------
# events_anomaly_mad / sessions_attribution
# ---------------------------------------------------------------------------


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def test_anomaly_mad_flags_only_the_spike(spark, tmp_path):
    """10 steady hours (5 events) + one 50-event spike: MAD is 0, the
    0.5 floor keeps steady hours silent, only the spike flags."""
    from datetime import datetime, timedelta

    rows, eid = [], 0
    base = datetime(2024, 1, 1)
    for h in range(11):
        n = 50 if h == 10 else 5
        for i in range(n):
            rows.append(
                (eid, base + timedelta(hours=h, minutes=i % 60), eid % 7,
                 "view", 1.0, "{}")
            )
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    out = QUERIES["events_anomaly_mad"](spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.event_type, r.cnt, r.med, r.mad) == ("view", 50, 5.0, 0.0)


def test_attribution_first_touch_semantics(spark, tmp_path):
    """Purchases credit the event type that opened their session,
    including a purchase that opens its own session."""
    from datetime import datetime

    T = datetime
    rows = [
        # u1: view opens, two purchases in-session
        (1, T(2024, 1, 1, 10, 0), 1, "view", 0.0, "{}"),
        (2, T(2024, 1, 1, 10, 5), 1, "purchase", 10.50, "{}"),
        (3, T(2024, 1, 1, 10, 10), 1, "purchase", 2.25, "{}"),
        # u1: NEW session (>30 min gap) opened by click, one purchase
        (4, T(2024, 1, 1, 12, 0), 1, "click", 0.0, "{}"),
        (5, T(2024, 1, 1, 12, 1), 1, "purchase", 1.00, "{}"),
        # u2: purchase opens its own session
        (6, T(2024, 1, 1, 9, 0), 2, "purchase", 5.00, "{}"),
        # u3: view-only session — no purchase, no row
        (7, T(2024, 1, 1, 9, 0), 3, "view", 0.0, "{}"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = {
        r.first_touch: (r.n_purchases, r.revenue_cents)
        for r in QUERIES["sessions_attribution"](spark, sf).collect()
    }
    assert out == {
        "view": (2, 1275),
        "click": (1, 100),
        "purchase": (1, 500),
    }
