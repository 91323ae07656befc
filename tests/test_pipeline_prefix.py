"""Prefix channel in the batch pipeline: a truncated-retry conversation
(byte prefix of a longer one) must cluster with its extension when
enable_prefix is on — and demonstrably does NOT via the similarity
channels alone (the channel's reason to exist)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wdedup_spark.plans.pipeline import PipelineConfig, run_pipeline, run_incremental


@pytest.fixture(scope="module")
def turns_with_prefix(spark):
    """A small corpus plus a retry stub: the first 2 turns of a long
    conversation under a new conv_id (assembled text is a proper byte
    prefix because assembly concatenates turn-wise).  Short turns
    (20-40 tokens) keep the 2-turn stub under the substring channel's
    100-token span floor, so ONLY the prefix channel can see it."""
    from wdedup_spark import synth

    base = synth.to_spark(
        spark,
        synth.generate_transcripts(n_base=60, seed=9, min_tokens=20, max_tokens=40),
    )
    counts = (
        base.groupBy("conv_id").count().filter(F.col("count") >= 8).limit(1)
    ).collect()
    src = counts[0]["conv_id"]
    stub = (
        base.filter((F.col("conv_id") == src) & (F.col("turn_idx") < 2))
        .withColumn("conv_id", F.lit("retry-stub"))
    )
    return base.unionByName(stub).localCheckpoint(eager=True), src


def _cluster_of(out, conv_id):
    return {
        r["conv_id"]: r["cluster_id"] for r in out["clusters"].collect()
    }[conv_id]


def test_prefix_channel_clusters_retry_stub(spark, turns_with_prefix, tmp_path):
    turns, src = turns_with_prefix
    cfg = PipelineConfig(enable_prefix=True)
    out = run_pipeline(spark, turns, str(tmp_path / "on"), cfg)
    assert _cluster_of(out, "retry-stub") == _cluster_of(out, src)
    # the committed edge names the extension as witness
    edges = {(r.conv_a, r.conv_b) for r in out["prefix_edges"].collect()}
    assert ("retry-stub" in {b for _, b in edges})


def test_without_prefix_channel_stub_is_singleton(spark, turns_with_prefix, tmp_path):
    # guards that the test isn't vacuous: a 2-of-8+ turn prefix has
    # shingle Jaccard far below threshold, so no other channel finds it
    turns, src = turns_with_prefix
    out = run_pipeline(spark, turns, str(tmp_path / "off"), PipelineConfig())
    assert _cluster_of(out, "retry-stub") != _cluster_of(out, src)


def test_incremental_refuses_prefix_channel(spark, tiny_turns, tmp_path):
    with pytest.raises(NotImplementedError):
        run_incremental(
            spark, tiny_turns, str(tmp_path / "base"), str(tmp_path / "inc"),
            PipelineConfig(enable_prefix=True),
        )
