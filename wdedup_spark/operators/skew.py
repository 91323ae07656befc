"""Skew handling: salted two-phase aggregation + salted repartition.

The reference never faces key skew (single-threaded sorted merges), but at
10^12-turn scale hot keys are the graft's reality (SURVEY.md §2.1): a
boilerplate opening turn shared by 2% of conversations lands one LSH band
bucket on one reducer.  Three mitigations, layered:

1. AQE skew-join split (on by default, session.py) — runtime fix for
   joins, free.
2. Bounded bucket expansion (lsh.candidate_pairs max_bucket + star) —
   caps the *output* of a hot bucket.
3. Salting (this module) — spreads a hot GROUP BY / repartition key over
   S shards before the exchange, then merges: the classic two-phase
   aggregate.  Use for aggregations whose per-key state is mergeable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def salt_col(id_col: Column | str, buckets: int = DEFAULT_SALT) -> Column:
    """Deterministic salt shard in [0, buckets): xxhash of the row id —
    stable across retries (never rand(), which breaks task re-execution)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(F.xxhash64(c), F.lit(buckets)).cast("int")


def salted_count(df: DataFrame, key_col: str, id_col: str, buckets: int = DEFAULT_SALT) -> DataFrame:
    """Two-phase count per key: groupBy(key, salt) → groupBy(key).

    Hot keys spread over ``buckets`` reducers in phase 1; phase 2 merges
    ``buckets`` rows per key.  → (key, n)."""
    phase1 = (
        df.withColumn("_salt", salt_col(id_col, buckets))
        .groupBy(key_col, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return phase1.groupBy(key_col).agg(F.sum("_partial").cast("long").alias("n"))


def salted_repartition(df: DataFrame, key_col: str, id_col: str, buckets: int = DEFAULT_SALT) -> DataFrame:
    """Repartition on (key, salt) so a hot key's rows land on ``buckets``
    partitions instead of one — for downstream partition-local work
    (e.g. per-bucket pair generation with bounded task size)."""
    return df.withColumn("_salt", salt_col(id_col, buckets)).repartition(
        F.col(key_col), F.col("_salt")
    )
