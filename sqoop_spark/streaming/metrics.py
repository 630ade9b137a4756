"""Streaming tail observability: windowed change-rate metrics with late data.

``change_rate_stream`` aggregates the CDC tail into per-repo, per-window
event counts using an event-time watermark — the Structured Streaming
late-data contract: rows later than ``late_threshold`` behind the max seen
``event_ts`` are dropped from their window, everything newer updates it.
This is the streaming face of the engine's PerfCounters-style reporting
(ReplayReport.summary_line): same numbers, continuous.

Batch parity: ``change_rate_batch`` computes the identical aggregation with
a plain groupBy(window(...)) so tests can check the streaming result equals
the batch result when nothing is late.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _agg(df: DataFrame, window_duration: str) -> DataFrame:
    return (
        df.groupBy(F.window("event_ts", window_duration).alias("w"), F.col("repo"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("op") == "delete", 1).otherwise(0)).alias("n_deletes"),
            F.max("event_seq").alias("max_seq"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "repo",
            "n_events",
            "n_deletes",
            "max_seq",
        )
    )


def change_rate_stream(
    stream: DataFrame,
    window_duration: str = "1 minute",
    late_threshold: str = "2 minutes",
) -> DataFrame:
    """Watermarked windowed aggregation over a streaming change tail."""
    if not stream.isStreaming:
        raise ValueError("change_rate_stream requires a streaming DataFrame")
    return _agg(stream.withWatermark("event_ts", late_threshold), window_duration)


def change_rate_batch(df: DataFrame, window_duration: str = "1 minute") -> DataFrame:
    """The batch twin of ``change_rate_stream`` (test oracle)."""
    return _agg(df, window_duration)
