"""Watermarked windowed aggregation over event/turn streams.

Streaming counterpart of the batch hourly rollup (__spark_entry__
q_events_hourly): tumbling windows + watermark bound the state the same
way syncDistance bounds the reference's recovery window
(/root/reference/src/wcli.cpp:109-112).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """→ (window_start, window_end, key, n_events) with bounded state:
    windows older than the watermark are finalized and dropped."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
        )
    )


def turns_per_conversation_rate(
    stream: DataFrame,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming per-conversation turn counts (ingest monitoring)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes").alias("w"), "conv_id")
        .agg(F.count(F.lit(1)).alias("n_turns"), F.max("turn_idx").alias("max_turn_idx"))
        .select(F.col("w.start").alias("window_start"), "conv_id", "n_turns", "max_turn_idx")
    )
