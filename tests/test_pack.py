"""Sequence packing (operators/pack.py): differential vs a pure-Python
reference of the concat-and-chunk layout, grouping-constant invariance,
and the structural invariants every packed layout must satisfy."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from substreams_sink_graph_load_spark.operators.pack import pack_chunks


def _reference(docs: list[tuple[int, str]], L: int) -> dict[int, tuple]:
    """Sequential concat-and-chunk over (doc_id, text) in doc_id order:
    chunk_id -> (n_docs, n_starts, head_doc_id, n_tokens)."""
    out: dict[int, list] = {}
    pos = 0
    for doc_id, text in sorted(docs):
        n = len(text.split(" ")) + 1  # words + EOS
        start, last = pos, pos + n - 1
        for c in range(start // L, last // L + 1):
            row = out.setdefault(c, [0, 0, doc_id, 0])
            row[0] += 1
            row[1] += 1 if start // L == c else 0
            row[2] = min(row[2], doc_id)
            row[3] += min((c + 1) * L, start + n) - max(c * L, start)
        pos += n
    return {c: tuple(v) for c, v in out.items()}


def _collect(df) -> dict[int, tuple]:
    return {
        r["chunk_id"]: (
            r["n_docs"],
            r["n_starts"],
            r["head_doc_id"],
            r["n_tokens"],
        )
        for r in df.collect()
    }


@pytest.fixture(scope="module")
def corpus():
    # Mixed lengths: short docs that pack many-per-chunk, one long doc
    # spanning several chunks, and an empty-string doc (splits to [''],
    # so n = 2 — the same contract both engines apply).
    docs = []
    for i in range(40):
        docs.append((i, " ".join(f"w{i}_{j}" for j in range(3 + (i * 7) % 11))))
    docs.append((40, " ".join(f"long{j}" for j in range(75))))
    docs.append((41, ""))
    for i in range(42, 60):
        docs.append((i, " ".join(f"t{i}_{j}" for j in range(1 + (i * 3) % 9))))
    return docs


def test_pack_matches_sequential_reference(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = _collect(pack_chunks(df, seq_len=16, docs_per_group=7))
    assert got == _reference(corpus, 16)


def test_pack_grouping_constant_is_invisible(spark, corpus):
    # The two-pass prefix scan's group width tunes scan granularity only;
    # any width must produce the identical layout (the claim that lets a
    # 100 TB run pick G for its cluster without a correctness question).
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    base = _collect(pack_chunks(df, seq_len=16, docs_per_group=1))
    for g in (3, 10, 1000):
        assert _collect(pack_chunks(df, seq_len=16, docs_per_group=g)) == base


def test_pack_invariants(spark, corpus):
    # Every chunk but the last is exactly full; chunk ids are contiguous
    # from 0; per-chunk doc counts decompose as boundary starts plus the
    # (single) carried-over straddler; n_starts totals the corpus.
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    rows = sorted(_collect(pack_chunks(df, seq_len=16)).items())
    ids = [c for c, _ in rows]
    assert ids == list(range(len(ids)))
    assert all(v[3] == 16 for _, v in rows[:-1])
    assert 0 < rows[-1][1][3] <= 16
    total = sum(len(t.split(" ")) + 1 for _, t in corpus)
    assert sum(v[3] for _, v in rows) == total
    assert sum(v[1] for _, v in rows) == len(corpus)
    for _, (n_docs, n_starts, _, _) in rows:
        # at most one doc carries over a chunk's left boundary (zero when
        # the boundary lands exactly between two docs)
        assert n_docs >= 1 and 0 <= n_docs - n_starts <= 1


def test_pack_empty_and_bad_args(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert pack_chunks(empty).count() == 0
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        pack_chunks(df, seq_len=0)
    with pytest.raises(ValueError):
        pack_chunks(df, docs_per_group=0)


@st.composite
def corpora(draw):
    # sparse doc_ids (gaps exercise group-id ranges with missing docs),
    # word counts spanning sub-chunk to multi-chunk docs
    ids = draw(
        st.lists(st.integers(0, 500), min_size=1, max_size=40, unique=True)
    )
    return [
        (i, " ".join("w" for _ in range(draw(st.integers(0, 40)))))
        for i in sorted(ids)
    ]


@given(corpora(), st.integers(1, 20), st.integers(1, 13))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_pack_property_matches_reference(spark, corpus, L, g):
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = _collect(pack_chunks(df, seq_len=L, docs_per_group=g))
    assert got == _reference(corpus, L)
