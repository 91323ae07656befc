"""Similarity search over embedding columns (array<float>).

Two strategies, same result contract:

* ``brute_force_topk`` — exact cosine top-k: queries (a small set)
  broadcast against the corpus, score JVM-side via ``F.zip_with`` +
  ``F.aggregate`` (whole-stage codegen — no Python), top-k per query via a
  window rank over (score desc, vec_id).  This is the baseline: one
  broadcast, one narrow map, one shuffle of k rows per query.

* ``lsh_bucketed_topk`` — the scale path: random-hyperplane (sign) LSH
  buckets shrink the scored corpus per query; exact cosine re-rank within
  the union of the query's buckets.  Recall < 1 by construction; bucket
  count/width trade recall for cost.  At 100 TB this is the difference
  between scanning the corpus per query and scanning ~corpus/2^bits.

Embeddings are cast to double before arithmetic: deterministic, and
matches the DuckDB oracle's double-precision math.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda s, x: s + x * x))
    return dot / (na * nb)


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (query_id, neighbor_id, score, rank) — exact cosine top-k
    neighbors per query (self-matches excluded)."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cvec")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qvec")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", _cosine(F.col("qvec"), F.col("cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("score", 9).alias("score"), "rank")
    )


def hyperplane_signature(df: DataFrame, vec_col: str, dim: int, n_bits: int = 16, seed: int = 42) -> DataFrame:
    """Random-hyperplane LSH signature (sign bits packed into a long),
    computed with a vectorized pandas UDF (numpy matmul per Arrow batch)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_bits))

    @pandas_udf(LongType())
    def _sig(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim)
        bits = (m @ planes) > 0  # (batch, n_bits)
        weights = (1 << np.arange(n_bits, dtype=np.int64))
        return pd.Series((bits * weights).sum(axis=1).astype(np.int64))

    return df.withColumn("ann_bucket", _sig(F.col(vec_col)))


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_bits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's LSH
    bucket (plus Hamming-1 neighbor buckets for recall)."""
    c = hyperplane_signature(
        corpus.select(F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cvec")),
        "cvec", dim, n_bits, seed,
    )
    q = hyperplane_signature(
        queries.select(F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qvec")),
        "qvec", dim, n_bits, seed,
    )
    # probe own bucket + all Hamming-1 buckets (multi-probe LSH)
    probes = F.array(
        F.col("ann_bucket"),
        *[F.col("ann_bucket").bitwiseXOR(F.lit(1 << b)) for b in range(n_bits)],
    )
    q_probed = q.select("query_id", "qvec", F.explode(probes).alias("ann_bucket"))
    scored = (
        q_probed.join(c, "ann_bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", _cosine(F.col("qvec"), F.col("cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.groupBy("query_id", "neighbor_id")
        .agg(F.max("score").alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("score", 9).alias("score"), "rank")
    )
