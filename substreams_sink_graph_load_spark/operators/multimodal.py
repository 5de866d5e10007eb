"""Multimodal column plumbing (SURVEY §2.12 LLM-pipeline extensions).

Images / audio / video travel as opaque ``binary`` payload columns with a
typed metadata struct; decode / feature-extract / frame-sample run as
Arrow-batched pandas functions over ``mapInPandas`` so each task processes
whole record batches without JVM<->Python per-row overhead.

The decode boundary is REAL for two formats with stdlib-only codecs,
both implemented from their public file-format specs:

- ``image/png`` — chunk parse + zlib inflate + scanline unfilter
  (filters 0-4 incl. Paeth), 8-bit gray/RGB/graya/RGBA, non-interlaced;
  returns the raw pixel bytes (PNG spec, RFC 2083).
- ``audio/wav`` / ``audio/x-wav`` — RIFF parse via the stdlib ``wave``
  module; returns the raw PCM sample bytes.

Every other mime still hits the documented stub: ``decode_payload``
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic byte-level identity "decode" runs instead — the Spark-side
contract (schema, partitioning, UDF signature, batch shape) is real and
tested for all mimes; only the exotic-codec call is fake.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("first_byte", LongType()),
        StructField("head_sum", LongType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def attach_binary(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mime: str = "text/plain",
) -> DataFrame:
    """Wrap a source column as an opaque payload + metadata struct —
    the canonical multimodal row shape: (id, mime, payload, meta)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        F.lit(mime).alias("mime"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.md5(payload).alias("checksum"),
        ).alias("meta"),
    )


def _paeth(a: int, b: int, c: int) -> int:
    # PNG spec 6.6: predictor closest to p = a + b - c, ties left/up/upleft
    pp = a + b - c
    pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> bytes:
    """Pure-stdlib PNG decode (public spec, RFC 2083): chunk walk, zlib
    inflate, per-scanline unfilter (types 0-4).  Supports the 8-bit
    non-interlaced color types (gray / RGB / gray+alpha / RGBA); palette
    and sub-byte depths raise — this is a training-pipeline feature
    extractor, not a general image library.  Returns raw pixel bytes,
    row-major, ``w*h*channels`` long."""
    import struct
    import zlib

    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG: bad signature")
    pos, idat = 8, bytearray()
    w = h = depth = color = interlace = None
    while pos + 8 <= len(data):
        ln = int.from_bytes(data[pos : pos + 4], "big")
        typ = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + ln]
        if len(chunk) != ln:
            raise ValueError("truncated PNG chunk")
        pos += 12 + ln  # 4 len + 4 type + data + 4 crc
        if typ == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8 or interlace != 0:
        raise NotImplementedError("only 8-bit non-interlaced PNG supported")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise NotImplementedError(f"PNG color type {color} not supported")
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) != (stride + 1) * h:
        raise ValueError("PNG pixel data length mismatch")
    out = bytearray(stride * h)
    prev_start = -1
    for row in range(h):
        fpos = row * (stride + 1)
        ftype = raw[fpos]
        line = bytearray(raw[fpos + 1 : fpos + 1 + stride])
        start = row * stride
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            if prev_start >= 0:
                for i in range(stride):
                    line[i] = (line[i] + out[prev_start + i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                up = out[prev_start + i] if prev_start >= 0 else 0
                line[i] = (line[i] + (left + up) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                up = out[prev_start + i] if prev_start >= 0 else 0
                upleft = (
                    out[prev_start + i - channels]
                    if prev_start >= 0 and i >= channels
                    else 0
                )
                line[i] = (line[i] + _paeth(left, up, upleft)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[start : start + stride] = line
        prev_start = start
    return bytes(out)


def decode_wav(data: bytes) -> bytes:
    """RIFF/WAVE decode via the stdlib ``wave`` module: raw PCM sample
    bytes (frames x channels x sampwidth)."""
    import io
    import wave

    with wave.open(io.BytesIO(data)) as wf:
        return wf.readframes(wf.getnframes())


_REAL_DECODERS = {
    "image/png": decode_png,
    "audio/wav": decode_wav,
    "audio/x-wav": decode_wav,
}


def decode_payload(payload: bytes, mime: str, fake: bool = False) -> bytes:
    """Codec boundary.  PNG and WAV decode for real (stdlib-only, from the
    public specs); other mimes need a codec this container lacks (PIL /
    soundfile / av) — callers opt into the deterministic fake for
    plumbing tests of those."""
    real = _REAL_DECODERS.get(mime)
    if real is not None:
        return real(payload)
    if not fake:
        raise NotImplementedError(
            f"no codec available for {mime}; install a decoder or pass fake=True"
        )
    return payload  # identity "decode": bytes in, bytes out


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Per-payload feature extraction via ``mapInPandas``.

    Batch shape: one pandas DataFrame per Arrow batch; output is a plain
    numeric feature row per payload (no binary back-transfer).  Partitioning
    is inherited — no shuffle.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [
                decode_payload(bytes(p), m, fake=fake)
                for p, m in zip(pdf["payload"], pdf["mime"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "mime": pdf["mime"],
                    "n_bytes": [len(b) for b in decoded],
                    "first_byte": [b[0] if b else -1 for b in decoded],
                    "head_sum": [sum(b[:16]) for b in decoded],
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)

WINDOW_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("win_idx", LongType()),
        StructField("win", BinaryType()),
        StructField("energy", LongType()),
    ]
)


def resize_payload(
    df: DataFrame, target_bytes: int = 64, fake: bool = True
) -> DataFrame:
    """Image-resize plumbing: decode -> resample to a fixed-size
    representation -> re-emit as binary.  With real codecs this is
    decode/PIL-thumbnail/encode; the deterministic stand-in resamples the
    decoded BYTE stream to ``target_bytes`` by even-stride selection, so
    output size, dtype, and batch shape match what a real resize emits.

    Scale: mapInPandas over Arrow batches, 1:1 rows, partitioning
    inherited — no shuffle; binary goes Python-side ONCE per batch (the
    decode boundary is the documented Python-unavoidable step).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, outs, sizes = [], [], []
            for doc_id, payload, mime in zip(
                pdf["doc_id"], pdf["payload"], pdf["mime"]
            ):
                raw = decode_payload(bytes(payload), mime, fake=fake)
                if len(raw) <= target_bytes:
                    small = raw
                else:
                    # even-stride resample: index i -> floor(i*len/target)
                    small = bytes(
                        raw[(i * len(raw)) // target_bytes]
                        for i in range(target_bytes)
                    )
                ids.append(int(doc_id))
                outs.append(small)
                sizes.append(len(small))
            yield pd.DataFrame(
                {"doc_id": ids, "payload": outs, "n_bytes": sizes}
            )

    return df.mapInPandas(batches, RESIZE_SCHEMA)


def audio_windows(
    df: DataFrame,
    window_bytes: int = 32,
    hop_bytes: int = 16,
    fake: bool = True,
) -> DataFrame:
    """Audio-style overlapping windows over the decoded byte stream (the
    STFT-frame shape: window w, hop h -> windows overlap by w-h), each
    with an integer energy (sum of byte values) — the feature a real
    pipeline thresholds for silence trimming.

    Output fans out 1->N like sample_frames; a payload of n bytes emits
    ceil(max(n - w, 0)/h) + 1 windows (the trailing partial window is
    kept, as torchaudio/librosa do with their padding modes).
    """
    if hop_bytes <= 0 or window_bytes <= 0:
        raise ValueError("window_bytes and hop_bytes must be positive")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, wins, energies = [], [], [], []
            for doc_id, payload, mime in zip(
                pdf["doc_id"], pdf["payload"], pdf["mime"]
            ):
                raw = decode_payload(bytes(payload), mime, fake=fake)
                starts = list(
                    range(0, max(len(raw) - window_bytes, 0) + 1, hop_bytes)
                ) or [0]
                if starts[-1] + window_bytes < len(raw):
                    starts.append(starts[-1] + hop_bytes)  # trailing partial
                for wi, start in enumerate(starts):
                    chunk = raw[start : start + window_bytes]
                    ids.append(int(doc_id))
                    idxs.append(wi)
                    wins.append(chunk)
                    energies.append(int(sum(chunk)))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "win_idx": idxs,
                    "win": wins,
                    "energy": energies,
                }
            )

    return df.mapInPandas(batches, WINDOW_SCHEMA)


def sample_frames(
    df: DataFrame, frame_size: int = 64, every_n: int = 4, fake: bool = True
) -> DataFrame:
    """Frame sampling for video-ish payloads: split the decoded byte stream
    into fixed-size frames and keep every ``every_n``-th.  Output explodes
    rows (one per kept frame) — mapInPandas handles the 1->N fan-out that a
    scalar pandas UDF cannot."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for doc_id, payload, mime in zip(
                pdf["doc_id"], pdf["payload"], pdf["mime"]
            ):
                raw = decode_payload(bytes(payload), mime, fake=fake)
                n_frames = max(1, len(raw) // frame_size)
                for i in range(0, n_frames, every_n):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    frames.append(raw[i * frame_size : (i + 1) * frame_size])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.mapInPandas(batches, FRAME_SCHEMA)
