"""The r13 fused encode->probe pipelines must emit EXACTLY the rows the
chained attach_* -> probe/sample/feature operator pairs emit — fusion
removes the payload's JVM<->Python round trip, never a codec half (the
writer and the independent reader both still run per row)."""

import pytest

from pyspark.sql import functions as F

from substreams_sink_graph_load_spark.operators.multimodal import (
    attach_avi,
    attach_mp3,
    attach_mp4,
    attach_png,
    attach_wav,
    audio_windows,
    avi_frame_sample_fused,
    extract_features,
    mp3_probe_fused,
    mp4_probe_fused,
    png_features_fused,
    probe_mp3_metadata,
    probe_video_metadata,
    sample_video_frames,
    wav_windows_fused,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_mp3_probe_fused_equals_chained(docs):
    chained = probe_mp3_metadata(attach_mp3(docs, "doc_id", "text"))
    fused = mp3_probe_fused(docs, "doc_id", "text")
    assert _rows(fused) == _rows(chained)


def test_mp4_probe_fused_equals_chained(docs):
    chained = probe_video_metadata(attach_mp4(docs, "doc_id", "text"))
    fused = mp4_probe_fused(docs, "doc_id", "text")
    assert _rows(fused) == _rows(chained)


def test_png_features_fused_equals_chained(docs):
    chained = extract_features(attach_png(docs, "doc_id", "text"), fake=False)
    fused = png_features_fused(docs, "doc_id", "text")
    assert _rows(fused) == _rows(chained)


def test_avi_frame_sample_fused_equals_chained(docs):
    chained = sample_video_frames(
        attach_avi(docs, "doc_id", "text", max_frames=24),
        every_n=3,
        fake=False,
    )
    fused = avi_frame_sample_fused(
        docs, "doc_id", "text", max_frames=24, every_n=3
    )
    assert _rows(fused) == _rows(chained)


def test_wav_windows_fused_equals_chained(docs):
    chained = audio_windows(
        attach_wav(docs, "doc_id", "text"),
        window_bytes=16,
        hop_bytes=8,
        fake=False,
    ).select(
        "doc_id",
        "win_idx",
        F.octet_length("win").cast("long").alias("win_bytes"),
        "energy",
    )
    fused = wav_windows_fused(
        docs, "doc_id", "text", window_bytes=16, hop_bytes=8
    )
    assert _rows(fused) == _rows(chained)
    assert fused.schema == chained.schema


def test_fused_plans_have_single_python_stage(docs):
    """The point of fusion: ONE Python evaluation node, no binary
    payload column between two of them."""
    for df in (
        mp3_probe_fused(docs),
        mp4_probe_fused(docs),
        png_features_fused(docs),
        avi_frame_sample_fused(docs),
        wav_windows_fused(docs),
    ):
        plan = df._jdf.queryExecution().explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"
            )
        )
        n_py = (
            plan.count("MapInArrow")
            + plan.count("MapInPandas")
            + plan.count("ArrowEvalPython")
            + plan.count("BatchEvalPython")
        )
        assert n_py == 1, plan
