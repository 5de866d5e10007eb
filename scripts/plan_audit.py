"""Physical-plan audit: shuffle/broadcast/pushdown counts per headline query
(feeds PLANS.md).  Formatted-mode explain lists each node twice (tree +
details), so raw counts are halved."""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from substreams_sink_graph_load_spark.session import get_spark
from substreams_sink_graph_load_spark.plans import QUERIES

AUDIT = [
    "q1_pricing_summary", "q5_region_revenue", "q3_shipping_priority",
    "scd2_versions", "join_asof", "join_range", "similarity_topk",
    "ann_ivf_topk", "dedup_minhash", "dedup_minhash_pairs",
    # round-2 additions
    "q4_order_priority", "join_correlated_min", "agg_pivot",
    "tfidf_top_terms", "sample_stratified", "join_runtime_minmax",
    # round-5 continuation: the new corpus/time-series operators
    "dedup_substring_remove", "quality_lm_bigram", "events_retention",
    "events_gapfill",
    # round-6: the oracle-exact ANN rerank shapes
    "ann_topk_matmul", "ann_pq_topk", "ann_ivf_pq_topk", "dedup_embedding",
    # round-6 late: retrieval / mixing / graph additions
    "docs_chunk_overlap", "bm25_search", "mix_epochs", "graph_pagerank",
    "join_interval_bins", "curriculum_order",
    "events_anomaly_mad", "sessions_attribution",
    # round-7: quota sampling / leakage-safe split / DSIR weighting
    "sample_domain_cap", "split_leakage_safe", "dsir_importance",
    "embedding_quantize_int8", "dataset_card_stats",
    "ann_ivf_recall_eval",
    "ann_ivf_nprobe4_topk",
    # round-7 continuation: rebalance sampling / Z-order layout / covariance
    "sample_lang_rebalance", "layout_zorder_stats", "embedding_covariance",
    "minhash_precision_eval", "bpe_pair_counts", "embedding_pca_power",
    "minhash_precision_tuned", "embedding_drift_by_source",
    "embedding_pc1_outliers",
    # round-7 continuation: pair materializers / sketch / skew / winnowing
    "simhash_hamming_pairs", "heavy_hitters_phrases", "join_salted_skew",
    "minhash_recall_eval", "winnow_fingerprints", "winnow_plagiarism_pairs",
    # round-8: the winnowing tier's removal transformation
    "winnow_remove",
]


def main() -> None:
    spark = get_spark(app_name="plan-audit", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for name in sys.argv[1:] or AUDIT:
        df = QUERIES[name](spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        s = buf.getvalue()
        exch = len(re.findall(r"\bExchange\b", s)) // 2
        bc = len(re.findall(r"\bBroadcastExchange\b", s)) // 2
        bnlj = len(re.findall(r"BroadcastNestedLoopJoin", s)) // 2
        pushed = sorted({p for p in re.findall(r"PushedFilters: \[([^\]]*)\]", s) if p})
        print(f"{name}: shuffles={exch} broadcasts={bc} bnlj={bnlj} pushed_filters={len(pushed)}")
        for p in pushed[:3]:
            print(f"    {p[:110]}")


if __name__ == "__main__":
    main()
