"""Skew-safe exact per-group top-k.

The reference's Find-TopN (src/wfreq.cpp argmin/top-N scan) is a global
top-k, which Spark already serves with TakeOrderedAndProject
(operators/wdedup.py find_top_unique).  PER-GROUP top-k — "the 10 most
frequent terms per source", "the 5 best-quality docs per cluster" — is
the grouped generalization a corpus-curation pipeline runs constantly.

The naive idiom

    row_number() OVER (PARTITION BY group ORDER BY ...) <= k

looks like it shuffles EVERY row of a group into one task — a hot group
(one source holding half the corpus vocabulary) sorting its whole
vocabulary in a single straggler at 100 TB.  It does not, on Spark
≥ 3.5: Catalyst's InsertWindowGroupLimit rule recognizes a rank filter
over a window and plans

    Sort + WindowGroupLimit(Partial)   # map side, before the exchange
    -> Exchange(group)
    -> Sort + WindowGroupLimit(Final) + Window

so each map task forwards at most k rows per group it holds, and the
post-shuffle task for a group receives ≤ k × n_map_partitions rows, not
the group's full row count.  That IS the two-phase candidate-prune
(valid because every pre-aggregated row in a group's true top-k is in
the top-k of whichever map slice it sits in) — fused by the optimizer,
one exchange total.

An earlier draft of this module hand-built the same two phases with an
explicit spark_partition_id() pre-rank; `.explain` showed it planning
TWO window exchanges while the naive form planned one, with the partial
WindowGroupLimit already present below it.  Per the let-Catalyst-
optimize rule, the hand-built variant was deleted — this function keeps
the declarative form and exists to pin the contract (total order,
pre-aggregated input, validated k) and this plan-shape documentation.

Contract notes:
- ``df`` must be PRE-AGGREGATED — one row per (group, candidate)
  carrying its final ordering value.  The map-side prune lemma fails on
  partial counts (a candidate whose total ranks top-k may rank below k
  in every slice), and so would any implementation of this signature.
- ``order_cols`` must be a total order within a group (include a
  tiebreak) or the k-boundary selection is nondeterministic.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["grouped_topk"]


def grouped_topk(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column | str],
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """Exact top-``k`` rows per group (see module docstring for the
    pre-aggregation + total-order contract and the WindowGroupLimit
    plan shape that makes this skew-safe).  Adds ``rank_col``
    (1-based INT) and keeps only ranks ≤ k."""
    if k <= 0:
        raise ValueError(f"grouped_topk: k must be positive, got {k}")
    if rank_col in df.columns:
        raise ValueError(
            f"grouped_topk: rank_col {rank_col!r} already exists in the "
            f"input — withColumn would silently overwrite it; pass a "
            f"different rank_col"
        )
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn(
        rank_col, F.row_number().over(w).cast("int")
    ).filter(F.col(rank_col) <= k)
