"""Multimodal column plumbing: binary payloads, mapInPandas batch contract,
stubbed decode, frame sampling fan-out."""

from __future__ import annotations

import pytest

from substreams_sink_graph_load_spark.operators.multimodal import (
    attach_binary,
    decode_payload,
    extract_features,
    sample_frames,
)


@pytest.fixture(scope="module")
def payloads(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "x" * 300), (3, "")],
        "doc_id long, text string",
    )
    return attach_binary(df, "doc_id", "text")


def test_attach_binary_shape(payloads):
    rows = {r["doc_id"]: r for r in payloads.collect()}
    assert bytes(rows[1]["payload"]) == b"hello world"
    assert rows[1]["mime"] == "text/plain"
    assert rows[1]["meta"]["n_bytes"] == 11
    assert rows[2]["meta"]["n_bytes"] == 300
    assert len(rows[1]["meta"]["checksum"]) == 32  # md5 hex


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_payload(b"\x89PNG", "image/png")
    assert decode_payload(b"abc", "text/plain", fake=True) == b"abc"


def test_extract_features(payloads):
    rows = {r["doc_id"]: r for r in extract_features(payloads).collect()}
    assert rows[1]["n_bytes"] == 11
    assert rows[1]["first_byte"] == ord("h")
    assert rows[1]["head_sum"] == sum(b"hello world"[:16])
    assert rows[3]["first_byte"] == -1  # empty payload sentinel


def test_sample_frames_fanout(payloads):
    frames = sample_frames(payloads, frame_size=64, every_n=2).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 300 bytes -> 4 frames of 64 (last partial), every 2nd kept -> idx 0, 2
    assert sorted(r["frame_idx"] for r in by_doc[2]) == [0, 2]
    assert bytes(by_doc[2][0]["frame"]) == b"x" * 64
    # short doc -> single frame 0
    assert [r["frame_idx"] for r in by_doc[1]] == [0]
