"""Conversation assembly (stable turn ordering) + exact dedup tests —
fixtures D0 (exact copy), D4 (row-shuffled), D4X (permuted indices)."""

from pyspark.sql import functions as F

from wdedup_spark.operators.assemble import assemble_conversations
from wdedup_spark.operators.exact import (
    deduplicate_exact,
    exact_dup_clusters,
    exact_dup_pairs,
)


def test_assembly_stable_under_row_order(spark, tiny, tiny_turns):
    conv = assemble_conversations(tiny_turns).cache()
    docs = {r["conv_id"]: r["doc"] for r in conv.collect()}
    pairs = tiny.oracle_pairs
    # D0 exact copies and D4 shuffled-row copies assemble identically
    for _, row in pairs[pairs.dup_class.isin(["D0", "D4"])].iterrows():
        assert docs[row.conv_a] == docs[row.conv_b], row.dup_class
    # D1/D2 near-dups must NOT be byte-identical
    for _, row in pairs[pairs.dup_class.isin(["D1", "D2"])].iterrows():
        assert docs[row.conv_a] != docs[row.conv_b], row.dup_class


def test_exact_pairs_match_planted(spark, tiny, tiny_turns):
    conv = assemble_conversations(tiny_turns)
    got = {
        (r["conv_a"], r["conv_b"])
        for r in exact_dup_pairs(conv, "doc", "conv_id").collect()
    }
    planted = tiny.oracle_pairs
    expected_direct = {
        (min(a, b), max(a, b))
        for a, b, c in planted.itertuples(index=False)
        if c in ("D0", "D4")
    }
    # exact pairs are emitted as star edges around the min id; planted
    # D0/D4 pairs share the base conv, so direct pairs == star edges here
    # unless two copies of the same base exist → compare via cluster closure
    clusters: dict[str, set] = {}
    for a, b in got:
        s = clusters.setdefault(a, {a})
        s.add(b)
    covered = set()
    for a, b in expected_direct:
        ok = any(a in s and b in s for s in clusters.values())
        if ok:
            covered.add((a, b))
    assert covered == expected_direct


def test_deduplicate_exact_keeps_min_id(spark, tiny_turns):
    conv = assemble_conversations(tiny_turns)
    deduped = deduplicate_exact(conv, "doc", "conv_id")
    total = conv.count()
    kept = deduped.count()
    clusters = exact_dup_clusters(conv, "doc", "conv_id")
    assert kept == clusters.count()
    dups = clusters.filter(F.col("n_members") > 1).count()
    assert kept < total and dups > 0
    # representative is the min id of each group
    reps = {r["rep_id"] for r in clusters.collect()}
    kept_ids = {r["conv_id"] for r in deduped.collect()}
    assert reps == kept_ids


def test_determinism_across_runs(spark, tiny, tiny_turns):
    """Two runs → identical output (the reference's determinism contract,
    include/wdedup.hpp:114-116)."""
    conv = assemble_conversations(tiny_turns)
    a = sorted(map(tuple, exact_dup_pairs(conv, "doc", "conv_id").collect()))
    b = sorted(map(tuple, exact_dup_pairs(conv, "doc", "conv_id").collect()))
    assert a == b
