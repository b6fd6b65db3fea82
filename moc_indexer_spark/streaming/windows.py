"""Event-time windowed aggregation with watermarking.

The reference has no event-time windows (SURVEY.md §2.9 note) — its
per-block Price/MocState histories are 1-block tumbling windows in
disguise. Here both forms exist Spark-natively:

- `tumbling_agg`: batch form — `window(ts, width)` group-by, used by the
  oracle-checked `hourly_window_agg` query.
- `streaming_tumbling_agg`: the same aggregation under Structured
  Streaming with `withWatermark` — late rows beyond the watermark are
  dropped, finalized windows emit exactly once (append mode). This is the
  T1 confirmation-lag idea expressed in event time.

Batch/stream parity: both call the same `_agg` projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ensure_event_time(df: DataFrame, *cols: str) -> DataFrame:
    """Normalize event-time columns to TIMESTAMP (with local time zone).

    Streaming file sources infer parquet timestamps as TIMESTAMP_NTZ, which
    `withWatermark` rejects; batch reads of the same files may yield LTZ.
    Casting is a no-op when already LTZ, so every streaming entry point can
    call this unconditionally for batch/stream parity."""
    for c in cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def _agg(grouped):
    return grouped.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("decimal(18,4)")
        .cast("double")
        .alias("total_value"),
    )


def tumbling_agg(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Batch tumbling window: (window_start, event_type) aggregates."""
    g = events.groupBy(
        F.window("ts", width).alias("w"), F.col("event_type")
    )
    return _agg(g).select(
        F.col("w.start").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )


def session_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Batch session windows: per-user sessions closed by a `gap` of
    inactivity (`session_window` — dynamic-width windows the registry's
    `user_sessions_native` query cross-checks against a lag-based SQL
    formulation)."""
    g = events.groupBy(
        F.session_window("ts", gap).alias("w"), F.col("user_id")
    )
    return _agg(g).select(
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "user_id",
        "n_events",
        "total_value",
    )


def streaming_session_agg(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming session windows. Spark merges overlapping in-progress
    sessions in the state store; a session finalizes (append mode) once the
    watermark passes its end + gap — the event-time generalization of the
    reference's stale-tx timeout (T4): keyed state that closes after
    inactivity. State per key is bounded by the watermark horizon."""
    g = (
        ensure_event_time(events_stream, "ts")
        .withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
    )
    return _agg(g).select(
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "user_id",
        "n_events",
        "total_value",
    )


def streaming_tumbling_agg(
    events_stream: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming form: watermarked event-time windows; append-mode output
    emits a window only once its watermark passes (deterministic finals,
    late data beyond `watermark` dropped)."""
    g = (
        ensure_event_time(events_stream, "ts")
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), F.col("event_type"))
    )
    return _agg(g).select(
        F.col("w.start").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )
