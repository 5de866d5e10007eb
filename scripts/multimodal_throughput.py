#!/usr/bin/env python
"""Single-core codec throughput for the multimodal tier (r11 verdict
item 6): the one number a 100 TB planner needs per codec path — decoded
payload MB/s per core — measured directly on the from-spec codecs over
REAL sf1 document texts, single-threaded (one core by construction, so
no executor-count estimate pollutes the number).  Cluster sizing is then
``bytes / (MB/s/core x cores)``; the Spark-side sf1 sweep walls in
BENCH_DETAIL.json bound the end-to-end overhead on top (Arrow transfer,
scan, scheduling).

Also measures the frame-sampling stride lever (every_n) on the MJPEG
path: decode cost is ~1/every_n of full decode, the contract that makes
video feasible at scale.

Usage: python scripts/multimodal_throughput.py [sf_dir] [--docs N]
       (defaults: testdata_local/sf1, 2000 docs)

Prints one JSON line per (codec, op) with payload MB, wall, MB/s/core.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
import wave

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from substreams_sink_graph_load_spark.operators.multimodal import (
    decode_avi_mjpeg,
    decode_jpeg,
    decode_png,
    decode_wav,
    encode_avi_mjpeg,
    encode_const_jpeg,
    encode_mp3_stub,
    encode_mp4_stub,
    encode_png,
    parse_mp3_meta,
    parse_mp4_meta,
)


def _texts(sf_dir: str, n: int) -> list[bytes]:
    import duckdb

    rows = duckdb.connect().execute(
        "SELECT text FROM read_parquet(?) WHERE strlen(text) > 0 "
        "ORDER BY doc_id LIMIT ?",
        [os.path.join(sf_dir, "documents.parquet"), n],
    ).fetchall()
    return [r[0].encode("utf-8") for r in rows]


def _report(codec: str, op: str, payload_bytes: int, wall: float, extra=None):
    out = {
        "codec": codec,
        "op": op,
        "payload_mb": round(payload_bytes / 1e6, 2),
        "wall_sec": round(wall, 3),
        "mb_per_sec_core": round(payload_bytes / 1e6 / wall, 2) if wall else None,
    }
    if extra:
        out.update(extra)
    print(json.dumps(out), flush=True)
    return out


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "testdata_local/sf1"
    n_docs = 2000
    for a in sys.argv[1:]:
        if a.startswith("--docs="):
            n_docs = int(a.split("=", 1)[1])
    texts = _texts(sf_dir, n_docs)
    total = sum(len(t) for t in texts)
    print(
        f"# {len(texts)} docs, {total / 1e6:.2f} MB of payload, "
        f"single-threaded",
        file=sys.stderr,
    )

    # PNG: each text as a 1-row grayscale image (the png_roundtrip shape)
    t0 = time.perf_counter()
    pngs = [encode_png(t, len(t), 1) for t in texts]
    _report("png", "encode", total, time.perf_counter() - t0)
    t0 = time.perf_counter()
    for p in pngs:
        decode_png(p)
    _report("png", "decode", total, time.perf_counter() - t0)

    # WAV: 8-bit mono PCM, samples ARE the bytes (the wav_windows shape)
    def _wav(raw: bytes) -> bytes:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(1)
            wf.setframerate(16000)
            wf.writeframes(raw)
        return buf.getvalue()

    t0 = time.perf_counter()
    wavs = [_wav(t) for t in texts]
    _report("wav", "encode", total, time.perf_counter() - t0)
    t0 = time.perf_counter()
    for w in wavs:
        decode_wav(w)
    _report("wav", "decode", total, time.perf_counter() - t0)

    # JPEG 8x8 baseline blocks + MJPEG AVI container (the frame-sample
    # shape: 24 frames/doc, one 8x8 block per byte).  Throughput is per
    # DECODED JPEG byte — the cost driver at scale.
    t0 = time.perf_counter()
    avis = []
    for t in texts:
        frames = [encode_const_jpeg(b) for b in t[:24]]
        avis.append(encode_avi_mjpeg(frames, 8, 8))
    avi_bytes = sum(len(a) for a in avis)
    _report("mjpeg_avi", "encode", avi_bytes, time.perf_counter() - t0)

    for every_n in (1, 3):
        t0 = time.perf_counter()
        decoded = 0
        for a in avis:
            _, _, frames = decode_avi_mjpeg(a)
            for f in frames[::every_n]:
                decode_jpeg(f)
                decoded += len(f)
        _report(
            "mjpeg_avi",
            f"decode_every_{every_n}",
            decoded,
            time.perf_counter() - t0,
            {"stride": every_n},
        )

    # MP4 / MP3: metadata PROBES — container walk only, no media decode.
    t0 = time.perf_counter()
    mp4s = [
        encode_mp4_stub(
            16 * ((t[0] % 16) + 1), 144, n_samples=len(t),
            duration_ms=40 * len(t),
        )
        for t in texts
    ]
    mp4_bytes = sum(len(m) for m in mp4s)
    _report("mp4", "encode_skeleton", mp4_bytes, time.perf_counter() - t0)
    t0 = time.perf_counter()
    for m in mp4s:
        parse_mp4_meta(m)
    _report("mp4", "probe", mp4_bytes, time.perf_counter() - t0)

    t0 = time.perf_counter()
    mp3s = [
        encode_mp3_stub(max(1, len(t) // 100), 9, True) for t in texts
    ]
    mp3_bytes = sum(len(m) for m in mp3s)
    _report("mp3", "encode_skeleton", mp3_bytes, time.perf_counter() - t0)
    t0 = time.perf_counter()
    for m in mp3s:
        parse_mp3_meta(m)
    _report("mp3", "probe", mp3_bytes, time.perf_counter() - t0)


if __name__ == "__main__":
    main()
