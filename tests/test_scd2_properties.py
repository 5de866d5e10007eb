"""Property-based SCD-2 checks (hypothesis): the window composition must
agree with a literal sequential replay of the reference state machine
(ref csvprocessor/processor.go:237-307) on arbitrary event streams, and
every output must satisfy the interval invariants.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from substreams_sink_graph_load_spark.operators.scd2 import (
    OP_CREATE,
    OP_DELETE,
    OP_FINAL,
    OP_UPDATE,
    scd2_versions,
)

IDS = ["a", "b", "c"]
FIELDS = ["f1", "f2"]


@st.composite
def event_streams(draw):
    """Block-ordered streams with per-id op validity (create-before-mutate),
    mirroring the driver fixture constraints (FIXTURES.md F1)."""
    n = draw(st.integers(min_value=1, max_value=18))
    live: set[str] = set()
    events = []
    block = 0
    for seq in range(n):
        block += draw(st.integers(min_value=0, max_value=3))  # same-block runs
        id_ = draw(st.sampled_from(IDS))
        if id_ in live:
            # CREATE on a live id is in the pool: the reference treats it
            # as fatal (processor.go:238-241, validate_ops reports it) but
            # every tolerant path here must agree on its fold — the window
            # and the streaming folds diverged on exactly this case until
            # r9 (open-range vs closed-at-create), hidden because this
            # generator never produced it
            op = draw(st.sampled_from(
                [OP_UPDATE, OP_DELETE, OP_FINAL, OP_UPDATE, OP_CREATE]
            ))
        else:
            # UPDATE on unseen id is tolerated-as-create (processor.go:267-275)
            op = draw(st.sampled_from([OP_CREATE, OP_UPDATE]))
        if op in (OP_DELETE, OP_FINAL):
            live.discard(id_)
        else:
            live.add(id_)
        fields = {
            f: draw(st.one_of(st.none(), st.integers(min_value=0, max_value=9)))
            for f in FIELDS
        }
        if op in (OP_CREATE, OP_UPDATE) and all(v is None for v in fields.values()):
            fields[FIELDS[0]] = 0  # starters carry at least one field
        events.append((id_, block, seq, op, fields["f1"], fields["f2"]))
    return events


def reference_fold(events):
    """Sequential replay of processor.go:237-307 (mutable entity)."""
    state: dict[str, dict] = {}
    out = []
    for id_, block, seq, op, f1, f2 in events:
        ev = {k: v for k, v in (("f1", f1), ("f2", f2)) if v is not None}
        if op in (OP_CREATE, OP_UPDATE):
            if id_ in state:
                prev = state[id_]
                out.append((id_, prev["start"], block, prev.get("f1"), prev.get("f2")))
                merged = {**{k: prev.get(k) for k in FIELDS if prev.get(k) is not None}, **ev}
                state[id_] = {"start": block, **merged}
            else:
                state[id_] = {"start": block, **ev}
        elif op == OP_DELETE:
            if id_ in state:
                prev = state.pop(id_)
                out.append((id_, prev["start"], block, prev.get("f1"), prev.get("f2")))
        elif op == OP_FINAL:
            if id_ in state:
                prev = state.pop(id_)
                out.append((id_, prev["start"], None, prev.get("f1"), prev.get("f2")))
    for id_, prev in state.items():  # end-of-log flush: open ranges
        out.append((id_, prev["start"], None, prev.get("f1"), prev.get("f2")))
    return sorted(out, key=lambda r: (r[0], r[1], r[2] is None, r[2] or 0))


@given(event_streams())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_scd2_matches_reference_fold(spark, events):
    df = spark.createDataFrame(
        events, "id string, block_num long, seq long, operation int, f1 int, f2 int"
    )
    got = sorted(
        (
            (r["id"], r["block_range_start"], r["block_range_end"], r["f1"], r["f2"])
            for r in scd2_versions(df, field_cols=["f1", "f2"]).collect()
        ),
        key=lambda r: (r[0], r[1], r[2] is None, r[2] or 0),
    )
    want = reference_fold(events)
    assert got == want

    # interval invariants per id: CLOSED ranges are mutually non-overlapping
    # and ordered.  (FINAL emits an open range and evicts — a re-created id
    # may legally overlap that open tail, exactly like the reference.)
    by_id: dict[str, list] = {}
    for id_, s, e, *_ in got:
        if e is not None:
            by_id.setdefault(id_, []).append((s, e))
    for spans in by_id.values():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert s1 <= e1, "range must not be inverted"
            assert e1 <= s2, "closed ranges must not overlap"
