"""Physical shard writers: round-trip, byte determinism, overflow guard."""

from __future__ import annotations

import glob
import hashlib
import os
import tarfile

import numpy as np
import pytest

from pyspark.sql import functions as F

from substreams_sink_graph_load_spark.sinks.shards import (
    hash_tokenize,
    read_token_shard,
    write_token_shards,
    write_webdataset_shards,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"doc {i} body word{i % 7} tail " * (1 + i % 5), bytes([i % 256]) * 4)
        for i in range(40)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, payload binary"
    ).withColumn("shard", F.col("doc_id") % 3)


def _manifest(df):
    return {r["shard"]: r.asDict() for r in df.collect()}


def test_token_shards_roundtrip(spark, docs, tmp_path):
    out = str(tmp_path / "tok")
    tok = hash_tokenize(docs, vocab_size=50000, out_col="tokens")
    man = _manifest(
        write_token_shards(tok, out, dtype="uint16")
    )
    assert set(man) == {0, 1, 2}
    expected = {
        r["doc_id"]: r["tokens"]
        for r in tok.select("doc_id", "tokens").collect()
    }
    seen = 0
    for shard, m in man.items():
        base = os.path.join(out, f"shard_{shard:05d}")
        seqs = read_token_shard(base)
        assert len(seqs) == m["n_seqs"]
        assert sum(len(t) for _, t in seqs) == m["n_tokens"]
        # manifest sha is the sha of the bytes on disk (auditable export)
        with open(base + ".bin", "rb") as f:
            assert hashlib.sha256(f.read()).hexdigest() == m["sha256_bin"]
        # ids sorted within the shard; every sequence byte-exact
        ids = [sid for sid, _ in seqs]
        assert ids == sorted(ids)
        for sid, toks in seqs:
            assert toks.tolist() == expected[sid]
            seen += 1
    assert seen == 40


def test_token_shards_bytes_partitioning_independent(spark, docs, tmp_path):
    tok = hash_tokenize(docs, vocab_size=50000, out_col="tokens")
    a = _manifest(
        write_token_shards(tok.repartition(1), str(tmp_path / "a"))
    )
    b = _manifest(
        write_token_shards(tok.repartition(7, "doc_id"), str(tmp_path / "b"))
    )
    assert a == b


def test_token_shards_overflow_raises(spark, docs, tmp_path):
    tok = hash_tokenize(docs, vocab_size=70000, out_col="tokens")
    with pytest.raises(Exception, match="uint16 range|token id outside"):
        write_token_shards(tok, str(tmp_path / "of"), dtype="uint16").collect()


def test_webdataset_roundtrip_and_determinism(spark, docs, tmp_path):
    out = str(tmp_path / "wds")
    members = {"txt": "text", "bin": "payload"}
    man = _manifest(write_webdataset_shards(docs, out, members))
    assert set(man) == {0, 1, 2}
    expected = {
        r["doc_id"]: (r["text"], bytes(r["payload"]))
        for r in docs.collect()
    }
    n = 0
    for shard, m in man.items():
        path = os.path.join(out, f"shard_{shard:05d}.tar")
        with open(path, "rb") as f:
            assert hashlib.sha256(f.read()).hexdigest() == m["sha256"]
        with tarfile.open(path) as tar:
            names = tar.getnames()
            # grouped by key, (key, ext) sorted — the WebDataset contract
            assert names == sorted(names)
            for key in {nm.split(".")[0] for nm in names}:
                doc_id = int(key)
                txt = tar.extractfile(f"{key}.txt").read().decode()
                raw = tar.extractfile(f"{key}.bin").read()
                assert (txt, raw) == expected[doc_id]
                n += 1
    assert n == 40
    # partitioning-independent tar bytes
    man2 = _manifest(
        write_webdataset_shards(
            docs.repartition(5, "text"), str(tmp_path / "wds2"), members
        )
    )
    assert {s: m["sha256"] for s, m in man.items()} == {
        s: m["sha256"] for s, m in man2.items()
    }


def test_shard_write_plan_single_exchange(spark, docs, tmp_path):
    """The 100 TB contract: ONE hash(shard) exchange feeds the per-shard
    serialization; no second shuffle, no sort-merge join anywhere."""
    tok = hash_tokenize(docs, vocab_size=50000, out_col="tokens")
    man = write_token_shards(tok, str(tmp_path / "plan"))
    plan = man._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "SortMergeJoin" not in plan


def test_token_shards_empty_sequences(spark, tmp_path):
    """Docs that tokenize to zero tokens still occupy an index slot
    (zero-length span), so loaders see every sequence id."""
    d = spark.createDataFrame(
        [(0, "", 0), (1, "one two", 0), (2, "", 0)],
        "doc_id long, text string, shard long",
    )
    tok = hash_tokenize(d, vocab_size=1000)
    man = _manifest(write_token_shards(tok, str(tmp_path / "e")))
    assert man[0]["n_seqs"] == 3
    seqs = read_token_shard(str(tmp_path / "e" / "shard_00000"))
    lens = {sid: len(t) for sid, t in seqs}
    assert lens == {0: 0, 1: 2, 2: 0}


def test_webdataset_string_keys(spark, tmp_path):
    d = spark.createDataFrame(
        [("h_abc", "alpha", 0), ("h_def", "beta", 0)],
        "k string, text string, shard long",
    )
    man = _manifest(
        write_webdataset_shards(
            d, str(tmp_path / "sk"), {"txt": "text"}, key_col="k"
        )
    )
    with tarfile.open(str(tmp_path / "sk" / "shard_00000.tar")) as tar:
        assert tar.getnames() == ["h_abc.txt", "h_def.txt"]
    assert man[0]["n_keys"] == 2


def test_token_shards_null_tokens_rejected(spark, tmp_path):
    d = spark.createDataFrame(
        [(0, ["a"], 0), (1, None, 0)],
        "doc_id long, tokens array<string>, shard long",
    ).selectExpr(
        "doc_id", "transform(tokens, t -> 1) as tokens", "shard"
    )
    with pytest.raises(Exception, match="NULL tokens"):
        write_token_shards(d, str(tmp_path / "n")).collect()


def test_webdataset_scalar_members_ascii_and_null_rejected(spark, tmp_path):
    d = spark.createDataFrame(
        [(0, "alpha", 5, 0), (1, "beta", 9, 0)],
        "doc_id long, text string, label long, shard long",
    )
    _manifest(
        write_webdataset_shards(
            d, str(tmp_path / "cls"), {"txt": "text", "cls": "label"}
        )
    )
    with tarfile.open(str(tmp_path / "cls" / "shard_00000.tar")) as tar:
        # scalar members serialize as ASCII text, never raw bytes(n)
        assert tar.extractfile("000000000000.cls").read() == b"5"
        assert tar.extractfile("000000000001.cls").read() == b"9"
    bad = spark.createDataFrame(
        [(0, "alpha", None, 0)],
        "doc_id long, text string, label string, shard long",
    )
    with pytest.raises(Exception, match="NULL member"):
        write_webdataset_shards(
            bad, str(tmp_path / "cls2"), {"txt": "text", "cls": "label"}
        ).collect()


# --- property-based round-trip (hypothesis) --------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def token_corpora(draw):
    n_docs = draw(st.integers(min_value=1, max_value=12))
    docs = []
    for i in range(n_docs):
        toks = draw(
            st.lists(st.integers(min_value=0, max_value=65535), max_size=40)
        )
        shard = draw(st.integers(min_value=0, max_value=2))
        docs.append((i, toks, shard))
    return docs


@given(token_corpora())
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_token_shards_roundtrip_property(spark, tmp_path_factory, corpus):
    """For ANY corpus (empty docs, max-dtype ids, ragged shards): write ->
    read restores every (seq_id, tokens) exactly, and per-shard totals
    equal the manifest."""
    out = str(tmp_path_factory.mktemp("prop"))
    df = spark.createDataFrame(
        corpus, "doc_id long, tokens array<int>, shard long"
    )
    man = _manifest(write_token_shards(df, out))
    expected = {d: t for d, t, _ in corpus}
    shards_of = {}
    for d, _, s in corpus:
        shards_of.setdefault(s, []).append(d)
    assert set(man) == set(shards_of)
    for s, m in man.items():
        seqs = read_token_shard(os.path.join(out, f"shard_{s:05d}"))
        assert [sid for sid, _ in seqs] == sorted(shards_of[s])
        assert sum(len(t) for _, t in seqs) == m["n_tokens"]
        for sid, toks in seqs:
            assert toks.tolist() == expected[sid]
