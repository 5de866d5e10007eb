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


def test_resize_payload_shape(payloads):
    from substreams_sink_graph_load_spark.operators.multimodal import (
        resize_payload,
    )

    rows = {r["doc_id"]: r for r in resize_payload(payloads, 64).collect()}
    assert rows[1]["n_bytes"] == 11  # smaller than target: pass-through
    assert bytes(rows[1]["payload"]) == b"hello world"
    assert rows[2]["n_bytes"] == 64  # 300 bytes resampled down
    assert bytes(rows[2]["payload"]) == b"x" * 64  # uniform source
    assert rows[3]["n_bytes"] == 0  # empty stays empty

    # deterministic: same input -> same bytes
    again = {
        r["doc_id"]: bytes(r["payload"])
        for r in resize_payload(payloads, 64).collect()
    }
    assert again == {k: bytes(v["payload"]) for k, v in rows.items()}


def test_audio_windows_overlap_and_energy(payloads):
    from substreams_sink_graph_load_spark.operators.multimodal import (
        audio_windows,
    )

    rows = audio_windows(payloads, window_bytes=8, hop_bytes=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 11 bytes, w=8 h=4 -> starts 0 and 4 (trailing partial kept)
    d1 = sorted(by_doc[1], key=lambda r: r["win_idx"])
    assert [r["win_idx"] for r in d1] == [0, 1]
    assert bytes(d1[0]["win"]) == b"hello wo"
    assert bytes(d1[1]["win"]) == b"o world"  # 7-byte trailing window
    assert d1[0]["energy"] == sum(b"hello wo")
    # overlap: consecutive windows share w-h bytes
    assert bytes(d1[0]["win"])[4:] == bytes(d1[1]["win"])[:4]
    # doc 2: 300 bytes -> (300-8)//4 + 1 = 74 windows
    assert len(by_doc[2]) == 74
    # doc 3: empty payload -> one empty window with zero energy
    assert len(by_doc[3]) == 1 and by_doc[3][0]["energy"] == 0


def test_audio_windows_validates_params(payloads):
    from substreams_sink_graph_load_spark.operators.multimodal import (
        audio_windows,
    )

    with pytest.raises(ValueError):
        audio_windows(payloads, window_bytes=8, hop_bytes=0).collect()
