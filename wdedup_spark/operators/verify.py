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


def _edit_similarity(ta: np.ndarray, tb: np.ndarray) -> float:
    """Exact Levenshtein similarity 1 - dist/max_len over two int arrays,
    row-rolling DP vectorized in numpy.  The loop-carried insertion chain
    cur[k] = cur[k-1]+1 is resolved with the prefix-min trick: min over
    j<=k of (cand[j] + (k-j)) = (prefix-min of cand[j]-j) + k."""
    n, m = len(ta), len(tb)
    if n == 0 and m == 0:
        return 1.0
    if n == 0 or m == 0:
        return 0.0
    if m < n:
        ta, tb, n, m = tb, ta, m, n
    idx = np.arange(n + 1, dtype=np.int32)
    prev = idx.copy()
    for j in range(1, m + 1):
        cand = np.empty(n + 1, dtype=np.int32)
        cand[0] = j
        np.minimum(
            prev[:-1] + (ta != tb[j - 1]),  # substitution / match
            prev[1:] + 1,                   # deletion
            out=cand[1:],
        )
        t = cand - idx                      # insertion chain via prefix-min
        np.minimum.accumulate(t, out=t)
        prev = t + idx
    return 1.0 - int(prev[-1]) / max(n, m)


@pandas_udf(DoubleType())
def edit_similarity_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Token-level Levenshtein similarity: 1 - dist/max_len over hashed
    tokens.  Runs only on candidate pairs that survived the cheap
    filters; the north_rule's "edit-distance check"."""
    out = np.zeros(len(a), dtype=np.float64)
    from wdedup_spark.functions.hashing import TokenHasher

    th = TokenHasher()
    for i in range(len(a)):
        ta = th.hash_tokens(a.iloc[i].split() if a.iloc[i] else [])
        tb = th.hash_tokens(b.iloc[i].split() if b.iloc[i] else [])
        out[i] = _edit_similarity(ta, tb)
    return pd.Series(out)


@pandas_udf(DoubleType())
def edit_similarity_bytes_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """BYTE-level Levenshtein similarity: 1 - dist/max_bytes over the
    utf-8 encoding (== character level for ASCII text).

    Byte semantics are deliberate: DuckDB's ``levenshtein()`` compares
    utf-8 BYTES (verified: 'über'↔'uber' = 2, not 1), so this is the
    oracle-mirrorable variant of the edit channel — pair it with
    ``strlen``/``octet_length`` denominators on the SQL side.  Same
    vectorized DP as the token-level kernel.
    """
    out = np.zeros(len(a), dtype=np.float64)
    for i in range(len(a)):
        sa, sb = a.iloc[i] or "", b.iloc[i] or ""
        ta = np.frombuffer(sa.encode("utf-8"), dtype=np.uint8)
        tb = np.frombuffer(sb.encode("utf-8"), dtype=np.uint8)
        out[i] = _edit_similarity(ta, tb)
    return pd.Series(out)


# r6 (guide §4.4): these kernels sit directly under their own threshold
# filter (withColumn + filter + select); the optimizer pushes the filter
# below the projection and evaluates the UDF TWICE per surviving row
# (two ArrowEvalPython nodes in the r5 plans).  They are pure functions,
# but marking them non-deterministic forbids the duplicating rewrite —
# one evaluation per row, identical values.
jaccard_udf = jaccard_udf.asNondeterministic()
edit_similarity_udf = edit_similarity_udf.asNondeterministic()
edit_similarity_bytes_udf = edit_similarity_bytes_udf.asNondeterministic()


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
