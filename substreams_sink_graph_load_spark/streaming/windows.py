"""Watermarked event-time windows over streaming sources (SURVEY §2.12
streaming contract: tumbling/sliding windows + watermark on events.ts).

The batch queries (events_tumbling_hour etc.) prove the window semantics
against the DuckDB oracle; these wrappers prove the same expressions run
under ``readStream`` with a watermark bounding state. One definition serves
both modes — the functions take any DataFrame, batch or streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` is given) count+sum per
    (window, event_type).  On a stream the watermark lets Spark drop window
    state once event time passes window_end + watermark — bounded state at
    any scale; late events beyond it are discarded (the reference never
    faces this: its source is strictly ordered, T1)."""
    w = (
        F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    )
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return src.groupBy(w.alias("win"), "event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_cents"),
    ).select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        "event_type",
        "n_events",
        "sum_value_cents",
    )


def sessionized_event_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of
    inactivity.  ``F.session_window`` keeps per-key open-session state;
    the watermark bounds it — sessions whose end passed the watermark
    finalize and evict (streaming merge semantics are Spark-native)."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window(ts_col, gap).alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )
