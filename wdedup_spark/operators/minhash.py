"""Shingling + MinHash signatures as vectorized pandas UDFs.

Replaces the reference's per-segment in-memory dedup structure
(/root/reference/src/wtreededup.cpp:59-96) as the "compress before you
shuffle" step: a conversation document of arbitrary size becomes a fixed
``n_perms × 8``-byte signature *before* any exchange.  SURVEY.md §7 "sign
before shuffle" — at 10^12-turn scale wide stages ship 1 KB signatures,
never raw text.

All kernels are Arrow-batched pandas UDFs (north_rule: "vectorized
pandas/Arrow UDFs (no per-row Python)"): the per-row work is numpy over
uint64 arrays; Python-level loops touch only O(tokens) hashing with a
batch-level memo (functions/hashing.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from wdedup_spark.functions import hashing

DEFAULT_K = 3
DEFAULT_NUM_PERMS = 128
DEFAULT_SEED = 42


def shingle_udf(k: int = DEFAULT_K):
    """text → array<long> of distinct hashed k-token-shingles."""

    @pandas_udf("array<long>")
    def _shingle(texts: pd.Series) -> pd.Series:
        th = hashing.TokenHasher()
        out = []
        for t in texts:
            toks = t.split() if t else []
            sh = hashing.shingle_hashes(th.hash_tokens(toks), k)
            out.append(hashing.to_i64(sh))
        return pd.Series(out)

    return _shingle


def minhash_udf(n_perms: int = DEFAULT_NUM_PERMS, seed: int = DEFAULT_SEED):
    """array<long> shingles → array<long> MinHash signature (fixed width)."""
    a, b = hashing.minhash_params(n_perms, seed)

    @pandas_udf("array<long>")
    def _minhash(shingle_col: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for sh in shingle_col:
            s = np.asarray(sh, dtype=np.int64).view(np.uint64)
            out.append(hashing.to_i64(hashing.minhash_signature(s, a, b)))
        return pd.Series(out)

    return _minhash


def add_shingles(df: DataFrame, text_col: str = "doc", k: int = DEFAULT_K, out_col: str = "shingles") -> DataFrame:
    return df.withColumn(out_col, shingle_udf(k)(F.col(text_col)))


def add_minhash(
    df: DataFrame,
    shingle_col: str = "shingles",
    n_perms: int = DEFAULT_NUM_PERMS,
    seed: int = DEFAULT_SEED,
    out_col: str = "sig",
) -> DataFrame:
    return df.withColumn(out_col, minhash_udf(n_perms, seed)(F.col(shingle_col)))
