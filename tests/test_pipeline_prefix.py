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


# ---------------------------------------------------------------------------
# Cross-day prefix channel: probes into the chain's pinned sorted runs
# ---------------------------------------------------------------------------

_SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string, ts long"


def _one_turn_df(spark, docs: dict[str, str]):
    return spark.createDataFrame(
        [(cid, 0, "user", text, None, 0) for cid, text in docs.items()], _SCHEMA
    )


_DAY0 = {
    "long1": "alpha bravo charlie delta echo",
    "mid": "mmm nnn ooo ppp",
    "keep1": "zulu yankee xray",
}
_DAY1 = {
    "stub-old": "alpha bravo",               # proper prefix of committed long1
    "ext-old": "mmm nnn ooo ppp qqq rrr",    # extends committed mid
    "new-a": "fff ggg",                      # within-batch prefix pair
    "new-b": "fff ggg hhh iii",
    "solo": "solo text here",
}
_DAY2 = {
    "ext-d1": "solo text here plus more",    # extends DAY-1 doc (chain read)
    "mid-d1": "fff ggg hhh",                 # extends day-1 new-a AND prefixes new-b
}


def test_incremental_prefix_cross_day_and_chain(spark, tmp_path):
    cfg = PipelineConfig(enable_prefix=True)
    base_dir, d1_dir, d2_dir = (str(tmp_path / d) for d in ("day0", "day1", "day2"))
    run_pipeline(spark, _one_turn_df(spark, _DAY0), base_dir, cfg)

    inc1 = run_incremental(spark, _one_turn_df(spark, _DAY1), base_dir, d1_dir, cfg)
    by1 = {r.conv_id: r.cluster_id for r in inc1["clusters"].collect()}
    assert by1["stub-old"] == by1["long1"]   # new-over-old probe
    assert by1["ext-old"] == by1["mid"]      # old-under-new probe
    assert by1["new-a"] == by1["new-b"]      # within-batch run scan
    assert by1["solo"] != by1["long1"] and by1["keep1"] not in (
        by1["long1"], by1["mid"], by1["new-a"]
    )
    edges1 = {(r.conv_a, r.conv_b) for r in inc1["prefix_edges"].collect()}
    assert edges1 == {
        ("long1", "stub-old"), ("ext-old", "mid"), ("new-b", "new-a")
    }
    # exact parity with the full recompute here (no early-witness
    # ambiguity in this fixture)
    full1 = run_pipeline(
        spark, _one_turn_df(spark, {**_DAY0, **_DAY1}), str(tmp_path / "f1"), cfg
    )
    want1 = sorted((r.conv_id, r.cluster_id) for r in full1["clusters"].collect())
    assert sorted(by1.items()) == want1

    # day 2 chained on day 1: probes read BOTH runs along the chain
    inc2 = run_incremental(spark, _one_turn_df(spark, _DAY2), d1_dir, d2_dir, cfg)
    by2 = {r.conv_id: r.cluster_id for r in inc2["clusters"].collect()}
    assert by2["ext-d1"] == by2["solo"]
    assert by2["mid-d1"] == by2["new-a"] == by2["new-b"]
    edges2 = {(r.conv_a, r.conv_b) for r in inc2["prefix_edges"].collect()}
    assert edges2 == {("ext-d1", "solo"), ("mid-d1", "new-a"), ("new-b", "mid-d1")}


def test_incremental_prefix_requires_chain_channel(spark, tmp_path):
    # base day ran WITHOUT the channel → old prefix pairs were never
    # flagged; the increment must refuse, not silently hole
    base_dir = str(tmp_path / "base")
    run_pipeline(spark, _one_turn_df(spark, _DAY0), base_dir, PipelineConfig())
    with pytest.raises(ValueError, match="no committed prefix stage"):
        run_incremental(
            spark, _one_turn_df(spark, _DAY1), base_dir, str(tmp_path / "inc"),
            PipelineConfig(enable_prefix=True),
        )


def test_incremental_prefix_requires_retained_corpus(spark, tmp_path):
    # base ran the channel but gc reclaimed the pinned sorted run → the
    # probes have nothing to read; refuse like the sign-stage check
    from wdedup_spark.sources.ledger import StageLedger

    base_dir = str(tmp_path / "base")
    run_pipeline(
        spark, _one_turn_df(spark, _DAY0), base_dir,
        PipelineConfig(enable_prefix=True),
    )
    StageLedger(base_dir, config_fence="", spark=spark).gc("prefix_corpus")
    with pytest.raises(ValueError, match="retained 'prefix_corpus'"):
        run_incremental(
            spark, _one_turn_df(spark, _DAY1), base_dir, str(tmp_path / "inc"),
            PipelineConfig(enable_prefix=True),
        )
