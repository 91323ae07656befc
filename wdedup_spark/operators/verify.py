"""Candidate-pair verification: exact Jaccard / edit-similarity.

LSH/SimHash candidates are probabilistic; verification makes the final
pair set exact (false positives die here; false negatives are bounded by
the band/bucket recall, tested against the O(n²) oracle).

Scale: candidates join back to the *shingle-set* table (array<long>, the
compressed representation) on id — two shuffles bounded by candidate
count, never a cross join.  Raw text is only rejoined for the
edit-distance variant, and only for pairs that survived Jaccard.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


@pandas_udf(DoubleType())
def jaccard_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Exact Jaccard of two array<long> shingle-set columns (vectorized
    numpy set ops per row; sets are pre-distinct from shingle_hashes)."""
    out = np.empty(len(a), dtype=np.float64)
    for i in range(len(a)):
        sa = np.asarray(a.iloc[i], dtype=np.int64)
        sb = np.asarray(b.iloc[i], dtype=np.int64)
        if len(sa) == 0 and len(sb) == 0:
            out[i] = 1.0
            continue
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        out[i] = inter / (len(sa) + len(sb) - inter)
    return pd.Series(out)


def verify_pairs(
    pairs: DataFrame,
    shingled: DataFrame,
    id_col: str = "conv_id",
    shingle_col: str = "shingles",
    threshold: float = 0.8,
) -> DataFrame:
    """(conv_a, conv_b) × (id, shingles) → pairs with exact jaccard >= t.

    Output: (conv_a, conv_b, jaccard).
    """
    sh = shingled.select(F.col(id_col).alias("id"), F.col(shingle_col).alias("sh"))
    a = sh.select(F.col("id").alias("conv_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("conv_b"), F.col("sh").alias("sh_b"))
    return (
        pairs.join(a, "conv_a")
        .join(b, "conv_b")
        .withColumn("jaccard", jaccard_udf(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("conv_a", "conv_b", "jaccard")
    )
