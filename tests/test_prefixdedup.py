"""Prefix-subsumption dedup vs a transparent O(n²) Python oracle,
including forced cross-partition boundaries and equal-text runs."""

from __future__ import annotations

import random

from wdedup_spark.operators.prefixdedup import (
    prefix_edges,
    prefix_subsumed,
    remove_prefix_subsumed,
)


def oracle(docs: list[tuple[int, str]]) -> dict[int, tuple[bool, int | None]]:
    """subsumed + witness: min-(text, id) proper extension."""
    out = {}
    for i, t in docs:
        exts = [
            (t2, j) for j, t2 in docs if len(t2) > len(t) and t2.startswith(t)
        ]
        out[i] = (True, min(exts)[1]) if exts else (False, None)
    return out


def _check(spark, docs, n_partitions):
    df = spark.createDataFrame(docs, ["conv_id", "doc"])
    got = {
        r.id: (r.subsumed, r.witness)
        for r in prefix_subsumed(df, n_partitions=n_partitions).collect()
    }
    assert got == oracle(docs)


def test_basic_prefix_chain(spark):
    docs = [
        (1, "a b c"),
        (2, "a b c d e"),      # extends 1
        (3, "a b c d e"),      # exact dup of 2 — NOT subsumed by 2
        (4, "a b c d e f"),    # extends 2/3 -> 2 and 3 ARE subsumed
        (5, "z z z"),
        (6, "q"),
    ]
    _check(spark, docs, n_partitions=2)


def test_equal_run_not_subsumed_without_extension(spark):
    docs = [(1, "x y"), (2, "x y"), (3, "x y"), (4, "other")]
    _check(spark, docs, n_partitions=3)


def test_boundary_stitch_across_partitions(spark):
    # many partitions over few rows forces runs and their extensions into
    # different range slices; equal runs spanning whole partitions
    # exercise the skip-equal-slices walk
    docs = [(i, "p q r") for i in range(20)] + [(100, "p q r s"), (101, "a")]
    _check(spark, docs, n_partitions=8)


def test_randomized_vs_oracle(spark):
    rng = random.Random(11)
    vocab = ["a", "b", "c"]
    docs = []
    texts = []
    for i in range(120):
        if texts and rng.random() < 0.4:
            base = rng.choice(texts)
            ext = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 3)))
            t = (base + " " + ext).strip() if ext else base  # prefix, dup, or extension
        else:
            t = " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 6)))
        texts.append(t)
        docs.append((i, t))
    for parts in (2, 5, 13):
        _check(spark, docs, parts)


def test_prefix_edges_connect_chains(spark):
    docs = [(1, "a b"), (2, "a b c"), (3, "a b c d"), (4, "z")]
    edges = {
        (r.conv_a, r.conv_b)
        for r in prefix_edges(spark.createDataFrame(docs, ["conv_id", "doc"])).collect()
    }
    # 1's smallest extension is 2; 2's is 3 — the chain connects transitively
    assert edges == {(2, 1), (3, 2)}


def test_null_text_is_answered_not_crashed(spark):
    docs = [(1, "a b"), (2, "a b c"), (3, None)]
    df = spark.createDataFrame(docs, "conv_id long, doc string")
    got = {r.id: (r.subsumed, r.witness) for r in prefix_subsumed(df).collect()}
    assert got == {1: (True, 2), 2: (False, None), 3: (False, None)}


def test_remove_prefix_subsumed_keeps_other_columns(spark):
    docs = [(1, "a b", "s1"), (2, "a b c", "s2"), (3, "z", "s3")]
    df = spark.createDataFrame(docs, ["conv_id", "doc", "source"])
    kept = remove_prefix_subsumed(df).orderBy("conv_id").collect()
    assert [(r.conv_id, r.source) for r in kept] == [(2, "s2"), (3, "s3")]
