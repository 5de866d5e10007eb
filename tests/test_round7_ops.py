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
