"""sf1 ratio-tripwire semantics (bench.classify_sf1_ratios): the flag
list must stay a real anomaly detector — bounded-contract baselines are
annotated, sub-second ratios are recorded as noise, and only a >12x
ratio WITH a >=2s absolute sf1 wall flags."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (
    BOUNDED_CONTRACT,
    carry_forward_sf1,
    classify_sf1_ratios,
    compare_sf1_cross_round,
    loadavg_sample,
)


def test_genuine_anomaly_flags():
    out = classify_sf1_ratios({"q_bad": 15.0}, {"q_bad": 30.0})
    assert out["flagged_over_12x"] == {"q_bad": 15.0}
    assert not out["ratio_noise_subsecond"]
    assert not out["bounded_contract"]


def test_subsecond_ratio_is_noise_not_flag():
    # the r9 pg_csv_format shape: huge in-sweep ratio, sub-second wall
    out = classify_sf1_ratios({"pg_csv_format": 40.1}, {"pg_csv_format": 0.9})
    assert not out["flagged_over_12x"]
    assert out["ratio_noise_subsecond"]["pg_csv_format"] == {
        "ratio": 40.1,
        "sf1_wall": 0.9,
    }


def test_bounded_contract_is_annotated_not_flagged():
    out = classify_sf1_ratios({"similarity_topk": 17.0}, {"similarity_topk": 8.6})
    assert not out["flagged_over_12x"]
    entry = out["bounded_contract"]["similarity_topk"]
    assert entry["ratio"] == 17.0
    assert entry["contract"] == BOUNDED_CONTRACT["similarity_topk"]["contract"]
    assert not out["bounded_contract_exceeded"]


def test_bounded_contract_ceiling_catches_regression():
    # r10 advice item 1: the contract exemption must not mask a genuine
    # regression — a wall past the recorded ceiling routes to the
    # anomaly bucket, not the annotated one
    out = classify_sf1_ratios(
        {"similarity_topk": 100.0}, {"similarity_topk": 80.0}
    )
    assert not out["bounded_contract"]
    entry = out["bounded_contract_exceeded"]["similarity_topk"]
    assert entry["sf1_wall"] == 80.0
    assert entry["ceiling"] == BOUNDED_CONTRACT["similarity_topk"][
        "sf1_wall_ceiling"
    ]


def test_classify_total_over_missing_sf1_key():
    # r10 advice item 2: the pure function must not KeyError when a
    # ratios key is absent from sf1_timings
    out = classify_sf1_ratios({"q": 20.0}, {})
    assert out["ratio_noise_subsecond"]["q"] == {"ratio": 20.0, "sf1_wall": 0.0}


def test_cross_round_drift_flags_growth():
    # the r10 shape: pagerank 17.4 -> 48.0s across committed records
    out = compare_sf1_cross_round(
        {"graph_pagerank": 48.0, "flat": 10.0, "small": 1.9},
        {"graph_pagerank": 17.4, "flat": 9.5, "small": 0.5},
    )
    assert out == {
        "graph_pagerank": {
            "sf1_wall": 48.0,
            "prior_wall": 17.4,
            "ratio": 2.76,
        }
    }


def test_cross_round_drift_skips_failures_and_new_queries():
    out = compare_sf1_cross_round(
        {"failed": -1.0, "brand_new": 30.0, "prior_failed": 30.0},
        {"failed": 5.0, "prior_failed": -1.0},
    )
    assert not out


def test_under_threshold_ratios_report_nothing():
    out = classify_sf1_ratios(
        {"a": 11.9, "similarity_topk": 12.0}, {"a": 50.0, "similarity_topk": 50.0}
    )
    assert not any(out.values())


def test_wall_floor_boundary_inclusive():
    out = classify_sf1_ratios({"q": 12.1}, {"q": 2.0})
    assert out["flagged_over_12x"] == {"q": 12.1}


def test_bounded_contract_names_exist_in_registry():
    from substreams_sink_graph_load_spark.plans import QUERIES

    for name in BOUNDED_CONTRACT:
        assert name in QUERIES, name


def test_loadavg_sample_shape():
    # r11 verdict item 3: host-load evidence lives IN the bench record —
    # a sample is a timestamp plus the three /proc/loadavg floats
    s = loadavg_sample()
    assert isinstance(s["t"], float)
    assert len(s["loadavg"]) == 3
    assert all(isinstance(x, float) and x >= 0.0 for x in s["loadavg"])


def test_loadavg_sample_carries_steal_counters():
    # r12: loadavg is ambiguous during a pass (the bench IS load); the
    # cumulative /proc/stat steal counter is the one signal the bench
    # cannot have caused itself.  On Linux with >= 8 cpu fields the
    # sample must carry both counters; deltas between samples give the
    # interval's steal share.
    s = loadavg_sample()
    assert "steal_jiffies" in s and "cpu_jiffies" in s
    assert isinstance(s["steal_jiffies"], int)
    assert isinstance(s["cpu_jiffies"], int)
    assert 0 <= s["steal_jiffies"] <= s["cpu_jiffies"]
    # cumulative counters are monotone non-decreasing across samples
    s2 = loadavg_sample()
    assert s2["steal_jiffies"] >= s["steal_jiffies"]
    assert s2["cpu_jiffies"] >= s["cpu_jiffies"]


def test_cross_round_drift_carries_load_evidence():
    out = compare_sf1_cross_round(
        {"graph_pagerank": 48.0},
        {"graph_pagerank": 17.4},
        new_loads={"graph_pagerank": 7.25},
    )
    assert out["graph_pagerank"]["load_1m"] == 7.25
    # no loads supplied -> flag entries simply omit the field
    out = compare_sf1_cross_round(
        {"graph_pagerank": 48.0}, {"graph_pagerank": 17.4}
    )
    assert "load_1m" not in out["graph_pagerank"]


def test_carry_forward_sf1_marks_and_preserves():
    # r11 advice item 2: a run without the sf1 sweep must not erase the
    # committed drift baseline
    prior = {"sf1": {"queries": {"q": 10.0}, "total": 10.0}}
    carried = carry_forward_sf1(prior)
    assert carried["carried_forward"] is True
    assert carried["queries"] == {"q": 10.0}
    # the prior record's own section is not mutated
    assert "carried_forward" not in prior["sf1"]
    assert carry_forward_sf1({}) is None
    assert carry_forward_sf1({"sf1": {}}) is None
