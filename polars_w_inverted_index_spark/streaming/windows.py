"""Streaming window aggregations over the events schema.

The reference is batch-only (SURVEY.md §2.7); this is the Structured
Streaming extension path: the same logical aggregations as the batch
``sql_events_hourly`` / ``sql_events_sessionize`` queries, expressed so the
SAME code works on a batch DataFrame or a ``readStream`` one (Spark's
unified API — the plan differs only in sink/trigger).

Scale notes:
- watermarks bound state: an aggregation over a 100 TB/day stream holds
  only windows younger than the watermark; late rows beyond it are dropped
  deterministically.
- ``session_window`` is the native sessionization operator (no custom
  state): gap-based windows merge as events arrive, state per (user,
  open session) only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.timeutil import ensure_event_time


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window counts/sums per event_type with a watermark.

    Streaming: emits finalized windows once the watermark passes.
    Batch: identical results, watermark is a no-op.
    """
    df = events
    if df.isStreaming:
        df = ensure_event_time(df, ts_col).withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_event_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user gap-based sessions via the native ``session_window``.

    Equivalent of the batch lag-window sessionization
    (registry_ext.q_events_sessions) but incremental: one row per closed
    session with its span and event count.
    """
    df = events
    if df.isStreaming:
        df = ensure_event_time(df, ts_col).withWatermark(ts_col, watermark)
    return (
        df.groupBy(
            F.session_window(ts_col, gap).alias("sess"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
        )
    )
