"""Multimodal column plumbing (SURVEY §2.12 LLM-pipeline extensions).

Images / audio / video travel as opaque ``binary`` payload columns with a
typed metadata struct; decode / feature-extract / frame-sample run as
Arrow-batched pandas functions over ``mapInPandas`` so each task processes
whole record batches without JVM<->Python per-row overhead.

The container has no image/audio codecs, so the decode step is STUBBED:
``decode_payload`` raises ``NotImplementedError`` unless ``fake=True``, in
which case a deterministic byte-level "decode" runs instead — the Spark-side
contract (schema, partitioning, UDF signature, batch shape) is real and
tested; only the codec call is fake.
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


def decode_payload(payload: bytes, mime: str, fake: bool = False) -> bytes:
    """Codec boundary.  Real decoders (PIL / soundfile / av) are not in this
    container — callers opt into the deterministic fake for plumbing tests."""
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
