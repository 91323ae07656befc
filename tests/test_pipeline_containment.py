"""Containment channel in the batch pipeline: a conversation quoting the
MIDDLE of a longer one (not a prefix, under the substring span floor,
Jaccard ~0.2) clusters with its source only when the channel is on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wdedup_spark.plans.pipeline import PipelineConfig, run_pipeline, run_incremental


@pytest.fixture(scope="module")
def turns_with_quote(spark):
    from wdedup_spark import synth

    base = synth.to_spark(
        spark,
        synth.generate_transcripts(n_base=60, seed=13, min_tokens=20, max_tokens=40),
    )
    src = (
        base.groupBy("conv_id").count().filter(F.col("count") >= 8).limit(1)
    ).collect()[0]["conv_id"]
    # middle turns 3-4: NOT a byte prefix (prefix channel blind), 40-80
    # tokens (substring floor blind), shingle Jaccard ~0.2 (MinHash
    # verify rejects) — only containment (~0.95, two boundary shingles
    # differ through the turn-separator junction) can see it
    quote = (
        base.filter((F.col("conv_id") == src) & F.col("turn_idx").isin(3, 4))
        .withColumn("conv_id", F.lit("quote-conv"))
        .withColumn("turn_idx", F.col("turn_idx") - 3)
    )
    return base.unionByName(quote).localCheckpoint(eager=True), src


def _cluster_of(out, conv_id):
    return {r["conv_id"]: r["cluster_id"] for r in out["clusters"].collect()}[conv_id]


def test_containment_channel_clusters_quote(spark, turns_with_quote, tmp_path):
    turns, src = turns_with_quote
    cfg = PipelineConfig(enable_containment=True)
    out = run_pipeline(spark, turns, str(tmp_path / "on"), cfg)
    assert _cluster_of(out, "quote-conv") == _cluster_of(out, src)
    pairs = {(r.conv_a, r.conv_b) for r in out["containment_pairs"].collect()}
    assert any("quote-conv" in p for p in pairs)


def test_without_channel_quote_is_singleton(spark, turns_with_quote, tmp_path):
    turns, src = turns_with_quote
    out = run_pipeline(spark, turns, str(tmp_path / "off"), PipelineConfig())
    assert _cluster_of(out, "quote-conv") != _cluster_of(out, src)


def test_incremental_refuses_containment(spark, turns_with_quote, tmp_path):
    turns, _ = turns_with_quote
    with pytest.raises(NotImplementedError):
        run_incremental(
            spark, turns, str(tmp_path / "b"), str(tmp_path / "i"),
            PipelineConfig(enable_containment=True),
        )
