"""Watermarked windowed aggregation streaming tests."""

from wdedup_spark import synth
from wdedup_spark.streaming.windows import turns_per_conversation_rate, windowed_counts


def test_windowed_counts_matches_batch(spark, tiny, tmp_path):
    src = str(tmp_path / "ev-src")
    synth.to_spark(spark, tiny).coalesce(2).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    # complete mode: append would hold back windows still inside the
    # watermark when the bounded stream ends
    q = (
        windowed_counts(stream, ts_col="ts", key_col="role", window="1 hour")
        .writeStream.format("memory")
        .queryName("win_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["role"]): r["n_events"]
        for r in spark.sql("SELECT * FROM win_sink").collect()
    }
    # batch oracle over the same data
    from pyspark.sql import functions as F

    batch = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "1 hour").alias("w"), "role")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "role", "n")
    )
    want = {(r["ws"], r["role"]): r["n"] for r in batch.collect()}
    assert got == want and len(got) > 0


def test_turns_per_conversation_rate(spark, tiny, tmp_path):
    src = str(tmp_path / "rate-src")
    synth.to_spark(spark, tiny).coalesce(2).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        turns_per_conversation_rate(stream)
        .writeStream.format("memory")
        .queryName("rate_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT sum(n_turns) AS total FROM rate_sink"
    ).collect()
    assert rows[0]["total"] == len(tiny.transcripts)
