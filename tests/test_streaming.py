"""Structured-streaming dedup tests (availableNow trigger → memory sink)."""

import pandas as pd
import pytest

from wdedup_spark import synth
from wdedup_spark.streaming.dedup_stream import stream_exact_dedup, stream_windowed_dedup


@pytest.fixture()
def turn_stream(spark, tmp_path, tiny):
    """File-source stream over the tiny fixture with duplicated deliveries."""
    df = tiny.transcripts
    doubled = pd.concat([df.head(300), df.head(300), df.iloc[300:600]], ignore_index=True)
    src = str(tmp_path / "stream-src")
    synth.to_spark(spark, synth.SynthResult(doubled, tiny.oracle_pairs)).coalesce(2).write.parquet(src)
    schema = spark.read.parquet(src).schema
    return spark.readStream.schema(schema).parquet(src), doubled


def _run(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_stream_exact_dedup(spark, turn_stream):
    stream, doubled = turn_stream
    out = _run(spark, stream_exact_dedup(stream), "dedup_exact_sink")
    n_distinct = doubled.drop_duplicates(["conv_id", "turn_idx", "text"]).shape[0]
    assert out.count() == n_distinct
    assert out.select("fp").distinct().count() == n_distinct


def test_stream_windowed_dedup(spark, turn_stream):
    stream, doubled = turn_stream
    out = _run(spark, stream_windowed_dedup(stream, "2 hours"), "dedup_wm_sink")
    # duplicates land at identical ts → always within the watermark horizon
    n_distinct = doubled.drop_duplicates(["conv_id", "turn_idx", "text"]).shape[0]
    assert out.count() == n_distinct
