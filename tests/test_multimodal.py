"""Multimodal column plumbing: binary payloads, mapInPandas batch contract,
real PNG/WAV decode + the stub boundary for other mimes, frame sampling
fan-out."""

from __future__ import annotations

import io
import struct
import wave
import zlib

import pytest

from substreams_sink_graph_load_spark.operators.multimodal import (
    attach_binary,
    decode_payload,
    decode_png,
    decode_wav,
    extract_features,
    sample_frames,
)


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if pa <= pb and pa <= pc else (b if pb <= pc else c)


def make_png(w: int, h: int, channels: int, filters: list[int]) -> tuple[bytes, bytes]:
    """Forward-filter deterministic pixels with the given per-row filter
    types and wrap as a real PNG; returns (png_bytes, raw_pixel_bytes)."""
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = w * channels
    pixels = [
        bytes(((x * 37 + y * 11 + c * 7) % 256) for x in range(w) for c in range(channels))
        for y in range(h)
    ]
    rows = []
    for y in range(h):
        f = filters[y % len(filters)]
        cur, prev = pixels[y], (pixels[y - 1] if y > 0 else bytes(stride))
        out = bytearray([f])
        for i in range(stride):
            left = cur[i - channels] if i >= channels else 0
            up = prev[i]
            ul = prev[i - channels] if i >= channels else 0
            raw = cur[i]
            if f == 0:
                out.append(raw)
            elif f == 1:
                out.append((raw - left) & 0xFF)
            elif f == 2:
                out.append((raw - up) & 0xFF)
            elif f == 3:
                out.append((raw - (left + up) // 2) & 0xFF)
            else:
                out.append((raw - _paeth(left, up, ul)) & 0xFF)
        rows.append(bytes(out))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _png_chunk(b"IEND", b"")
    )
    return png, b"".join(pixels)


def make_wav(n: int = 64, channels: int = 1, sampwidth: int = 2) -> tuple[bytes, bytes]:
    pcm = struct.pack(f"<{n * channels}h", *((i * 257 - 1000) % 32768 - 16384 for i in range(n * channels)))
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(sampwidth)
        wf.setframerate(16000)
        wf.writeframes(pcm)
    return buf.getvalue(), pcm


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


def test_decode_stub_boundary():
    # mimes without a stdlib codec keep the documented stub contract
    with pytest.raises(NotImplementedError):
        decode_payload(b"\x00\x00\x00\x18ftyp", "video/mp4")
    assert decode_payload(b"abc", "text/plain", fake=True) == b"abc"


def test_decode_png_all_filters_all_colortypes():
    # every scanline filter type (0-4) and every supported channel count
    for channels in (1, 2, 3, 4):
        png, raw = make_png(7, 5, channels, filters=[0, 1, 2, 3, 4])
        assert decode_png(png) == raw
    # decode_payload dispatches by mime — no fake flag needed
    png, raw = make_png(3, 3, 3, filters=[4])
    assert decode_payload(png, "image/png") == raw


def test_decode_png_rejects_malformed():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\x89PNG")
    png, _ = make_png(3, 3, 3, filters=[0])
    # cut past IEND (12 bytes) into the IDAT body so the declared chunk
    # length overruns the buffer
    with pytest.raises(ValueError, match="truncated"):
        decode_png(png[:-18])
    # palette color type (3) is out of scope, loudly
    pal = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 6))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="color type"):
        decode_png(pal)


def test_decode_wav_roundtrip():
    for channels, width in ((1, 2), (2, 2)):
        wav, pcm = make_wav(48, channels, width)
        assert decode_wav(wav) == pcm
        assert decode_payload(wav, "audio/wav") == pcm
        assert decode_payload(wav, "audio/x-wav") == pcm


def test_extract_features_real_codecs(spark):
    """End-to-end: real PNG + WAV payloads through the Spark mapInPandas
    path with fake=False — features computed on the DECODED bytes."""
    png, praw = make_png(8, 4, 3, filters=[0, 1, 2, 3])
    wav, pcm = make_wav(32)
    df = spark.createDataFrame(
        [
            (1, "image/png", bytearray(png), (len(png), "x")),
            (2, "audio/wav", bytearray(wav), (len(wav), "y")),
        ],
        "doc_id long, mime string, payload binary, meta struct<n_bytes:long,checksum:string>",
    )
    rows = {r["doc_id"]: r for r in extract_features(df, fake=False).collect()}
    assert rows[1]["n_bytes"] == len(praw) == 8 * 4 * 3
    assert rows[1]["first_byte"] == praw[0]
    assert rows[1]["head_sum"] == sum(praw[:16])
    assert rows[2]["n_bytes"] == len(pcm)
    assert rows[2]["head_sum"] == sum(pcm[:16])


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
