"""Streaming dedup — the reference's batch semantics under
Structured Streaming.

The reference is strictly batch; its incremental-resume design (WAL +
syncDistance, /root/reference/src/wprof.cpp:258-284) is the closest
analog to streaming micro-batches: bounded work, committed progress,
replay on restart.  Here that becomes ``readStream → dropDuplicates
[WithinWatermark] → writeStream`` with checkpointLocation as the WAL.

Two operators:
* ``stream_exact_dedup``   — turn-level exact dedup on content
  fingerprint, unbounded state (exact parity with batch semantics).
* ``stream_windowed_dedup`` — watermarked variant: duplicates are only
  suppressed within the watermark horizon; state is bounded — the
  scale-correct choice for 10^12-turn ingest where late data past the
  horizon is re-admitted by a downstream batch sweep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_fingerprint(turns: DataFrame) -> DataFrame:
    """Stable per-turn content key: conversation, position, and text —
    the input_hint invariant (per-turn text equality under stable
    ordering)."""
    return turns.withColumn(
        "fp", F.sha2(F.concat_ws("\x1e", "conv_id", "turn_idx", "text"), 256)
    )


def stream_exact_dedup(turns: DataFrame) -> DataFrame:
    """Exactly-once turn stream: drops re-deliveries of the same turn.
    Unbounded state — use only where the key space is bounded."""
    return with_fingerprint(turns).dropDuplicates(["fp"])


def stream_windowed_dedup(turns: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Watermarked dedup: state bounded to the watermark horizon
    (dropDuplicatesWithinWatermark), late duplicates beyond the horizon
    pass through — resolved by the batch pipeline's exact stage."""
    return (
        with_fingerprint(turns)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )
