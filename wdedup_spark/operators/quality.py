"""Corpus-quality operators: repetition statistics and quality-aware
keeper selection within duplicate clusters.

Two pieces a training-data pipeline runs next to dedup:

* ``repetition_stats`` — Gopher-style within-document repetition signals
  (Rae et al. 2021 §A1.1: fraction of tokens inside duplicated n-grams,
  mass of the single most frequent n-gram).  Boilerplate, scraped nav
  bars and generation loops light these up while staying invisible to
  cross-document dedup.
* ``cluster_keepers`` — given duplicate-cluster assignments, keep the
  HIGHEST-QUALITY member instead of the min-id member: the reference
  keeps the first occurrence (src/wfindfirst.cpp:48-57, a byte-offset
  argmin); a quality-aware pipeline generalizes the argmin key to
  (quality desc, id) — same scan, different order.

Scale shape: repetition stats are two hash aggregations over exploded
n-grams — partial map-side combines, keys are (doc_id, gram) then doc_id,
so hot grams never concentrate (doc_id spreads them).  Keeper selection
is one window over clusters (hash-partitioned by cluster_id) — or, where
a full sort-per-cluster is unwanted, the same ``max_by`` aggregation
shape as exact dedup's min-rep.  No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wdedup_spark.operators.decontaminate import ngram_array


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    flag_top_frac: float = 0.2,
) -> DataFrame:
    """→ ``(id, n_grams, top_gram_n, top_gram_frac, dup_gram_frac,
    flagged)`` per document with ≥1 n-gram:

    * ``top_gram_frac`` — occurrences of the single most frequent n-gram
      over all n-gram occurrences (loop/boilerplate detector);
    * ``dup_gram_frac`` — fraction of n-gram occurrences whose gram
      appears more than once in the doc (diffuse-repetition detector);
    * ``flagged`` — ``top_gram_frac > flag_top_frac``, the Gopher-rule
      cut a filtering pass would apply.

    Counts use ALL occurrences (not distinct grams): a doc that repeats
    one sentence 50 times must score ~1.0, not 1/n_distinct."""
    # all-occurrence grams via the shared expression (explode drops the
    # empty arrays of sub-n-token docs, so the ≥1-gram row set is
    # unchanged); distinct=False because counts must use ALL occurrences
    toks_grams = df.select(
        F.col(id_col).alias("id"),
        F.explode(ngram_array(text_col, n, distinct=False)).alias("gram"),
    )
    per_gram = toks_grams.groupBy("id", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return per_gram.groupBy("id").agg(
        F.sum("cnt").cast("long").alias("n_grams"),
        F.max("cnt").cast("long").alias("top_gram_n"),
        F.round(F.max("cnt") / F.sum("cnt"), 6).alias("top_gram_frac"),
        F.round(
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0)))
            / F.sum("cnt"),
            6,
        ).alias("dup_gram_frac"),
        (F.max("cnt") / F.sum("cnt") > flag_top_frac).alias("flagged"),
    )


def cluster_keepers(
    clusters: DataFrame,
    quality: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    quality_col: str = "quality",
) -> DataFrame:
    """→ one row per cluster ``(cluster_id, keeper_id, n_members,
    best_quality)``: the keeper is the argmax-quality member, ties broken
    by min id (deterministic; reduces to the reference's first-occurrence
    rule when quality is constant)."""
    joined = clusters.select(
        F.col(id_col).alias("id"), F.col(cluster_col).alias("cluster_id")
    ).join(
        quality.select(F.col(id_col).alias("id"), F.col(quality_col).alias("q")),
        "id",
    )
    # min_by on (-quality, id): one hash aggregate, no per-cluster sort
    # and no window — the same single-exchange shape as exact dedup's
    # min-rep, so a 10^8-member boilerplate cluster costs one combiner;
    # negating QUALITY (always double) instead of id keeps the tie-break
    # valid for any orderable id type
    return joined.groupBy("cluster_id").agg(
        F.min_by(
            "id", F.struct((-F.col("q")).alias("nq"), F.col("id").alias("id"))
        ).alias("keeper_id"),
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.round(F.max("q"), 6).alias("best_quality"),
    )


def soft_dedup_weights(
    clusters: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """→ ``(id, cluster_id, n_members, weight)`` for EVERY document:
    ``weight = 1/n_members`` of its duplicate cluster — the soft-dedup
    alternative to dropping ("SoftDedup"-style data reweighting: keep
    all copies, down-weight their sampling so the cluster contributes
    ~one document's worth of gradient).  Reduces to weight 1.0 for singleton
    clusters, so applying it to a deduplicated corpus is a no-op.

    Shape: one ``groupBy(cluster_id)`` count (map-side partial) + an
    equi-join back on cluster_id — co-partitioned with the aggregation's
    own exchange, and AQE broadcasts the size table when small.  A
    window count would be one exchange cheaper but buffers whole
    clusters per partition; a 10^8-member boilerplate cluster makes
    that trade wrong at scale."""
    c = clusters.select(
        F.col(id_col).alias("id"), F.col(cluster_col).alias("cluster_id")
    )
    sizes = c.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    return c.join(sizes, "cluster_id").select(
        "id",
        "cluster_id",
        "n_members",
        F.round(F.lit(1.0) / F.col("n_members"), 6).alias("weight"),
    )
