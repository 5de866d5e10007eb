"""Registry export-order invariants (the driver verifies a ~50-query
prefix per round, so ordering IS coverage — see plans/queries.py
_driver_rounds / _export_order)."""

from __future__ import annotations

import glob
import json
import os
import re

from substreams_sink_graph_load_spark.plans import queries as Q

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUDGET = 50


def _reports() -> dict[int, dict]:
    out = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path) as fh:
            out[rnd] = json.load(fh)
    return out


def test_never_checked_queries_lead():
    newest = Q._driver_rounds(oracled=set(Q.ORACLES))
    names = list(Q.QUERIES)
    never = [n for n in names if n not in newest]
    assert names[: len(never)] == sorted(
        never, key=lambda n: Q._COST.get(n, 99.0)
    )


def test_core_tier_inside_budget():
    names = list(Q.QUERIES)
    for core in Q._CORE:
        assert names.index(core) < BUDGET, core


def test_error_rows_do_not_count_as_coverage():
    """A query whose newest report row errored must keep its last PASSING
    round — i.e. sort back into the budget until re-witnessed."""
    reports = _reports()
    if not reports:
        return
    latest = max(reports)
    newest = Q._driver_rounds()
    names = list(Q.QUERIES)
    for name, row in reports[latest].items():
        errored = row.get("err") not in (None, "no_oracle")
        if errored and name in names:
            assert newest.get(name, 0) < latest, name
            assert names.index(name) < BUDGET, name


def test_stale_before_fresh():
    """Outside the never-checked + core head, export order is
    oldest-passing-round first."""
    newest = Q._driver_rounds(oracled=set(Q.ORACLES))
    names = list(Q.QUERIES)
    head = {n for n in names if n not in newest} | set(Q._CORE)
    tail_rounds = [newest.get(n, 0) for n in names if n not in head]
    assert tail_rounds == sorted(tail_rounds)


def test_rewitness_voids_pre_change_rows():
    """A query listed in _REWITNESS with only rows OLDER than its change
    round must sort into the never-verified front of the budget: those
    rows witnessed a different query definition (r9: the MinHash pairs
    tier's move to 32/4)."""
    newest = Q._driver_rounds(oracled=set(Q.ORACLES))
    names = list(Q.QUERIES)
    for name, min_round in Q._REWITNESS.items():
        assert name in Q.QUERIES
        recorded = newest.get(name)
        if recorded is None:
            # voided: it must lead the export, inside the driver budget
            assert names.index(name) < BUDGET, name
        else:
            # a fresh row exists — the void must NOT apply
            assert recorded >= min_round, (name, recorded)
