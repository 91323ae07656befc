"""Repetition stats (Gopher-style) and quality-aware cluster keepers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wdedup_spark.operators.quality import (
    cluster_keepers,
    repetition_stats,
    soft_dedup_weights,
)


def _df(spark, rows, cols):
    return spark.createDataFrame(rows, list(cols))


def test_repetition_stats_loop_doc(spark):
    # "spam ham" repeated 5 times: bigram occurrences = 9, "spam ham" x5,
    # "ham spam" x4 -> top 5/9, all grams duplicated -> dup 1.0
    text = " ".join(["spam", "ham"] * 5)
    r = repetition_stats(_df(spark, [(1, text)], ("doc_id", "text")), n=2).head()
    assert r["n_grams"] == 9
    assert r["top_gram_n"] == 5
    assert r["top_gram_frac"] == round(5 / 9, 6)
    assert r["dup_gram_frac"] == 1.0
    assert bool(r["flagged"]) is True


def test_repetition_stats_diverse_doc(spark):
    r = repetition_stats(
        _df(spark, [(1, "a b c d e f")], ("doc_id", "text")), n=2
    ).head()
    assert r["n_grams"] == 5
    assert r["top_gram_n"] == 1
    assert r["dup_gram_frac"] == 0.0
    assert bool(r["flagged"]) is False


def test_repetition_stats_short_doc_excluded(spark):
    out = repetition_stats(
        _df(spark, [(1, "solo"), (2, "two tokens")], ("doc_id", "text")), n=2
    )
    assert [r["id"] for r in out.collect()] == [2]


def test_repetition_counts_all_occurrences_not_distinct(spark):
    # one sentence repeated: the signal must approach 1.0 even though
    # the distinct-gram set is tiny
    text = " ".join(["x"] * 50)
    r = repetition_stats(_df(spark, [(1, text)], ("doc_id", "text")), n=2).head()
    assert r["top_gram_frac"] == 1.0 and r["dup_gram_frac"] == 1.0


def test_cluster_keepers_argmax_quality_min_id_ties(spark):
    clusters = _df(
        spark,
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)],
        ("doc_id", "cluster_id"),
    )
    quality = _df(
        spark,
        [(1, 0.2), (2, 0.9), (3, 0.9), (7, 0.5), (8, 0.5)],
        ("doc_id", "quality"),
    )
    out = {r["cluster_id"]: r for r in cluster_keepers(clusters, quality).collect()}
    # cluster 1: quality tie 0.9 between 2,3 -> min id 2
    assert out[1]["keeper_id"] == 2 and out[1]["n_members"] == 3
    assert out[1]["best_quality"] == 0.9
    # cluster 7: tie -> 7
    assert out[7]["keeper_id"] == 7 and out[7]["n_members"] == 2


def test_cluster_keepers_constant_quality_is_min_id(spark):
    # reduces to the reference's first-occurrence argmin
    # (src/wfindfirst.cpp:48-57) when quality is constant
    clusters = _df(spark, [(5, 1), (3, 1), (9, 1)], ("doc_id", "cluster_id"))
    quality = _df(spark, [(5, 1.0), (3, 1.0), (9, 1.0)], ("doc_id", "quality"))
    assert cluster_keepers(clusters, quality).head()["keeper_id"] == 3


def test_cluster_keepers_single_aggregate_no_window(spark):
    """Plan contract: keeper selection is one hash aggregate pair over
    the join — no Window (sort-per-cluster) operator."""
    clusters = _df(spark, [(1, 1), (2, 1)], ("doc_id", "cluster_id"))
    quality = _df(spark, [(1, 0.1), (2, 0.2)], ("doc_id", "quality"))
    plan = (
        cluster_keepers(clusters, quality)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan


def test_soft_dedup_weights_per_cluster(spark):
    clusters = _df(
        spark,
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7), (9, 9)],
        ("doc_id", "cluster_id"),
    )
    out = {r["id"]: r for r in soft_dedup_weights(clusters).collect()}
    assert len(out) == 6
    # 3-member cluster: each weight 1/3
    for d in (1, 2, 3):
        assert out[d]["n_members"] == 3
        assert out[d]["weight"] == round(1 / 3, 6)
    # pair cluster
    assert out[7]["weight"] == 0.5 and out[8]["weight"] == 0.5
    # singleton: weight exactly 1.0 -> applying to a deduped corpus is a no-op
    assert out[9]["n_members"] == 1 and out[9]["weight"] == 1.0


def test_soft_dedup_weights_mass_sums_to_one_per_cluster(spark):
    clusters = _df(
        spark, [(i, i % 4) for i in range(20)], ("doc_id", "cluster_id")
    )
    mass = (
        soft_dedup_weights(clusters)
        .groupBy("cluster_id")
        .agg(F.round(F.sum("weight"), 4).alias("m"))
        .collect()
    )
    assert all(r["m"] == 1.0 for r in mass)
    assert len(mass) == 4


def test_soft_dedup_weights_no_window(spark):
    """Plan contract: sizes come from a hash aggregate + join, not a
    per-cluster Window sort (a giant boilerplate cluster must not buffer
    in one partition's window frame)."""
    clusters = _df(spark, [(1, 1), (2, 1)], ("doc_id", "cluster_id"))
    plan = (
        soft_dedup_weights(clusters)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
