"""Skew safety of candidate_pairs: oversize buckets must never be
materialized as a collect_list array (VERDICT round-2 finding #1).

The star policy exists for boilerplate floods; the round-2 implementation
aggregated ``collect_list(id)`` over EVERY bucket before filtering on the
size — an executor OOM at exactly the skew it targets.  The fix counts
bucket sizes with a window (sort-based, spills) and only collect_lists
buckets already proven small; oversize rows flow straight to star edges.
"""

import pytest
from pyspark.sql import functions as F

from wdedup_spark.operators.lsh import candidate_pairs


def _banded(spark, rows):
    return spark.createDataFrame(rows, "band int, bucket long, id long")


@pytest.fixture(scope="module")
def skewed(spark):
    """One 100k-member hot bucket + two small buckets + a singleton."""
    hot = spark.range(100_000).select(
        F.lit(0).alias("band"), F.lit(777).alias("bucket"), F.col("id")
    )
    small = _banded(
        spark,
        [(1, 10, 1), (1, 10, 2), (1, 10, 3),      # 3-member bucket
         (1, 11, 5), (1, 11, 9),                  # 2-member bucket
         (2, 12, 42)],                            # singleton — no pairs
    )
    return hot.unionByName(small).localCheckpoint(eager=True)


def test_star_policy_truncates_hot_bucket(spark, skewed):
    pairs = candidate_pairs(skewed, max_bucket=16, oversize_policy="star")
    got = {(r["conv_a"], r["conv_b"]) for r in pairs.collect()}
    # hot bucket → exactly m-1 star edges around the min id (0)
    star = {(0, i) for i in range(1, 100_000)}
    small = {(1, 2), (1, 3), (2, 3), (5, 9)}
    assert got == star | small


def test_oversize_branch_builds_no_array(spark, skewed):
    """Plan-level guarantee: bucket sizes come from a window count (spills,
    no buffer) and NO per-bucket array is ever built — the r6 expansion is
    a size-gated self-join, so collect_list is gone entirely and the join
    inputs are filtered on the window-computed size."""
    pairs = candidate_pairs(skewed, max_bucket=16, oversize_policy="star")
    optimized = pairs._jdf.queryExecution().optimizedPlan().toString().lower()
    assert "windowspecdefinition" in optimized, "size gate must be a window count"
    # the r5 shape collected each small bucket into an array; the r6
    # self-join builds no aggregation buffer at all
    assert "collect_list" not in optimized
    join_idx = optimized.index("join")
    gate_idx = optimized.index("<= 16")
    assert gate_idx > join_idx, "size filter must sit BELOW the join"


def test_drop_policy_drops_hot_bucket(spark, skewed):
    pairs = candidate_pairs(skewed, max_bucket=16, oversize_policy="drop")
    got = {(r["conv_a"], r["conv_b"]) for r in pairs.collect()}
    assert got == {(1, 2), (1, 3), (2, 3), (5, 9)}


def test_all_policy_unchanged(spark):
    banded = _banded(
        spark, [(0, 1, 7), (0, 1, 8), (0, 1, 9), (1, 2, 7), (1, 2, 8)]
    )
    pairs = candidate_pairs(banded, max_bucket=2, oversize_policy="all")
    got = {(r["conv_a"], r["conv_b"]) for r in pairs.collect()}
    assert got == {(7, 8), (7, 9), (8, 9)}


def test_min_collisions_floor_with_star(spark):
    # pair (7,8) collides in 2 bands, (7,9) in 1 → floor 2 keeps only (7,8);
    # star edges bypass the floor (structural connectivity)
    rows = [(0, 1, 7), (0, 1, 8), (1, 2, 7), (1, 2, 8), (2, 3, 7), (2, 3, 9)]
    hot = [(3, 99, i) for i in range(20, 40)]
    banded = _banded(spark, rows + hot)
    pairs = candidate_pairs(
        banded, max_bucket=8, oversize_policy="star", min_collisions=2
    )
    got = {(r["conv_a"], r["conv_b"]) for r in pairs.collect()}
    assert got == {(7, 8)} | {(20, i) for i in range(21, 40)}


def _brute_pairs(rows, max_bucket, policy, min_collisions=1):
    """Reference semantics of candidate_pairs in plain Python."""
    from collections import defaultdict

    buckets = defaultdict(list)
    for band, bucket, i in rows:
        buckets[(band, bucket)].append(i)
    small_hits = defaultdict(int)
    star = set()
    for ids in buckets.values():
        ids = sorted(set(ids))
        if len(ids) < 2:
            continue
        if policy != "all" and len(ids) > max_bucket:
            if policy == "star":
                star |= {(ids[0], b) for b in ids[1:]}
            continue
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                small_hits[(ids[x], ids[y])] += 1
    small = {p for p, n in small_hits.items() if n >= min_collisions}
    return small | star


def test_windowed_path_equals_bruteforce_random(spark):
    """Property check: the window-gated implementation is semantically
    identical to the straightforward per-bucket enumeration across random
    bucket structures, all policies, and collision floors."""
    import random

    rng = random.Random(7)
    for trial in range(6):
        rows = [
            (rng.randrange(4), rng.randrange(12), rng.randrange(40))
            for _ in range(rng.randrange(30, 220))
        ]
        # banded input is one row per (band, id): dedup like band_buckets does
        rows = sorted({(b, bkt, i) for b, bkt, i in rows})
        # drop ids appearing twice in one band with different buckets is
        # impossible in real banding; keep first occurrence per (band, id)
        seen = set()
        clean = []
        for b, bkt, i in rows:
            if (b, i) not in seen:
                seen.add((b, i))
                clean.append((b, bkt, i))
        df = _banded(spark, clean)
        for policy in ("star", "drop", "all"):
            for mc in (1, 2):
                got = {
                    (r["conv_a"], r["conv_b"])
                    for r in candidate_pairs(df, 5, policy, min_collisions=mc).collect()
                }
                want = _brute_pairs(clean, 5, policy, mc)
                assert got == want, (trial, policy, mc)
