"""Benchmark decontamination — remove training documents that share any
long n-gram with a held-out evaluation corpus.

The training-data-pipeline operation next to dedup (GPT-3 appendix C /
PaLM-style n-gram decontamination): a training doc is CONTAMINATED if any
of its n-token grams appears verbatim in the benchmark set.  This is the
wdedup word-profile idiom (/root/reference/src/wprof.cpp:50-144: hash the
unit, group, test membership) with the unit widened from a word to an
n-gram and membership tested against a second corpus.

Scale shape (the 100-TB configuration):

* the benchmark side is TINY relative to training data (eval suites are
  thousands of docs vs billions) — its distinct gram set is broadcast, so
  the contamination test is a map-side hash probe inside whole-stage
  codegen: the training corpus is never shuffled to find hits;
* training grams are generated JVM-side (split + transform + slice —
  no Python), and only HITS reach the one aggregation shuffle, keyed by
  doc_id with map-side partial counts;
* for a benchmark too large to broadcast, drop ``broadcast_bench=False``
  to fall back to a plain shuffled join on the gram hash — same plan
  class as the exact-dedup digest groupBy.

Gram identity is the joined token string (not a hash), so the DuckDB
oracle mirrors it bit-for-bit; at production scale swap the join key for
``xxhash64(gram)`` to ship 8 bytes instead of strings — the plan shape
is unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wdedup_spark.functions.text import tokens


def ngram_array(text: Column | str, n: int, distinct: bool = True) -> Column:
    """N-token grams of a whitespace-tokenized text, as joined strings;
    empty array when the doc has fewer than ``n`` tokens (a doc shorter
    than the gram width cannot be contaminated by this rule).

    ``distinct=True`` (the decontamination shape) deduplicates grams
    within the doc; ``distinct=False`` keeps ALL occurrences — the
    repetition-statistics shape (operators/quality.py), which must count
    a 50×-repeated sentence as ~all the doc's mass, not one gram.  One
    shared expression so a tokenization or bound fix lands in both
    operators (review r5)."""
    toks = tokens(text)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    if distinct:
        grams = F.array_distinct(grams)
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def gram_hash_array_udf(n: int):
    """text → array<long> of the doc's DISTINCT n-gram hashes (blake2b
    token hashes combined polynomially — the engine's standard shingle
    kernel at width n), with the ``ngram_array`` edge contract: fewer
    than ``n`` tokens → empty array.  Whole-batch vectorized (r6).

    Uses the MIXED position constants (``hashing._poly_consts_mixed``):
    the hash is the gram's IDENTITY here, and the default affine
    constants collide with certainty on reversal-symmetric patterns
    ("a b b a" vs "b a a b" — caught by the r6 sf0.1 oracle sweep;
    tests/test_decontaminate.py pins the case)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from wdedup_spark.functions import hashing

    @pandas_udf("array<long>")
    def _g(texts: pd.Series) -> pd.Series:
        if len(texts) == 0:
            return pd.Series([], dtype=object)
        flat, off = hashing.split_hash_batch(texts)
        lens = np.diff(off)
        grams, go = hashing.batch_shingle_seq(flat, off, n, mixed=True)
        sets, so = hashing.batch_unique_sets(grams, go)
        out = np.split(sets.view(np.int64), so[1:-1])
        # shingle kernels clamp 0 < len < n docs to one whole-doc gram;
        # the decontamination contract is the opposite (a doc shorter
        # than the gram width cannot be contaminated) — blank them
        empty = np.empty(0, dtype=np.int64)
        return pd.Series(
            [empty if lens[i] < n else out[i] for i in range(len(texts))]
        )

    return _g


def contaminated(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    broadcast_bench: bool = True,
    hashed: bool = False,
) -> DataFrame:
    """→ ``(id, n_hit_grams)``: training docs sharing ≥1 n-gram with the
    benchmark corpus, with the count of DISTINCT shared grams (the
    severity signal a contamination report wants).

    ``hashed=True`` (r6): gram identity becomes the engine's 64-bit
    shingle hash instead of the joined token string — the module
    docstring's "swap the join key for a hash at production scale" knob,
    now implemented.  Cuts the dominant cost (building every gram STRING
    in an interpreted transform, on both sides — measured at sf1.0:
    2.6 s per side → ~0.3 s) and ships 8 bytes per gram into the
    broadcast probe.  Results are identical modulo 64-bit hash
    collisions, the same caveat class the verify kernels already carry
    (they intersect hashed shingle sets)."""
    if hashed:
        g = gram_hash_array_udf(n)
        train_grams = train.select(
            F.col(id_col).alias("id"), F.explode(g(F.col(text_col))).alias("gram")
        )
        bench_grams = bench.select(
            F.explode(g(F.col(text_col))).alias("gram")
        ).distinct()
    else:
        train_grams = train.select(
            F.col(id_col).alias("id"), F.explode(ngram_array(text_col, n)).alias("gram")
        )
        bench_grams = bench.select(
            F.explode(ngram_array(text_col, n)).alias("gram")
        ).distinct()
    if broadcast_bench:
        bench_grams = F.broadcast(bench_grams)
    return (
        train_grams.join(bench_grams, "gram")
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit_grams"))
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Training corpus with contaminated docs dropped (anti-join on id;
    the caller's other columns survive)."""
    hits = contaminated(train, bench, text_col, id_col, n, broadcast_bench)
    return train.join(
        hits.select(F.col("id").alias(id_col)), id_col, "left_anti"
    )


# ---------------------------------------------------------------------------
# Bloom-pruned path — the configuration for a benchmark too big to
# broadcast as raw grams
# ---------------------------------------------------------------------------
#
# At 100 TB the training side is fixed (scan + map-side probe either
# way); the pressure point is the BENCHMARK side.  A raw distinct-gram
# broadcast of a large contamination blocklist (every eval suite + their
# train splits + canary strings) can reach many GB; a Bloom filter holds
# the same membership test in ~1.2 bytes per gram at 1e-3 false-positive
# rate.  Shape:
#
# * build: the benchmark grams' k bit-indices are computed JVM-side
#   (``xxhash64(gram, seed_i) mod n_bits``), the DISTINCT set-bit
#   positions are pulled to the driver via Arrow (bounded by
#   min(k·|grams|, n_bits) ints — never the gram strings), OR'd into a
#   numpy bitmap, and the bitmap (n_bits/8 bytes) ships to executors in
#   the probe UDF's closure;
# * probe: training grams compute the same k JVM hashes; one vectorized
#   Arrow-batched UDF tests the k bits (the only Python on the path —
#   ~numpy indexing over int64 arrays);
# * verify: Bloom false positives would WRONGLY DROP training docs, so
#   the pruned survivors (a ~FPR-sized sliver of the corpus's grams) are
#   exactly confirmed with the plain shuffled gram join — the same plan
#   as ``broadcast_bench=False`` but with its left side shrunk by the
#   filter.  Results are therefore EXACTLY ``contaminated()``'s; the
#   Bloom stage only prunes the shuffle.
#
# (Spark's own BloomFilterAggregate expression is internal and
# `DataFrame.stat.bloomFilter` is not exposed to Python, so the bitmap
# is built from first principles — it also keeps the bit layout
# deterministic for tests.)

BLOOM_MAX_BITS = 1 << 33  # 1 GiB bitmap ceiling — loud, not OOM


def _bloom_hash_cols(gram: Column, n_bits: int, n_hashes: int) -> list[Column]:
    """k independent bit positions per gram, JVM-side: xxhash64 seeded by
    the hash index, reduced mod n_bits (pmod: xxhash64 is signed)."""
    return [
        F.pmod(F.xxhash64(gram, F.lit(i)), F.lit(n_bits)).alias(f"h{i}")
        for i in range(n_hashes)
    ]


def bloom_bitmap(
    bench_grams: DataFrame, n_bits: int, n_hashes: int
) -> bytes:
    """Build the benchmark bitmap: distinct set-bit positions to the
    driver (Arrow), OR'd into ``n_bits/8`` bytes.  ``bench_grams`` is a
    one-column ``gram`` DataFrame (pre-distinct not required)."""
    if not 0 < n_bits <= BLOOM_MAX_BITS:
        raise ValueError(
            f"n_bits={n_bits} outside (0, {BLOOM_MAX_BITS}]: size the "
            "filter at ~10 bits/gram and raise BLOOM_MAX_BITS consciously "
            "if the blocklist truly needs more"
        )
    idx = (
        bench_grams.select(
            F.explode(F.array(*_bloom_hash_cols(F.col("gram"), n_bits, n_hashes))).alias("i")
        )
        .distinct()
        .toPandas()["i"]
        .to_numpy(dtype=np.int64)
    )
    bm = np.zeros((n_bits + 7) >> 3, dtype=np.uint8)
    # duplicate BYTE positions survive distinct() (two bits, one byte):
    # bitwise_or.at applies unbuffered per element
    np.bitwise_or.at(bm, idx >> 3, (1 << (idx & 7).astype(np.uint8)))
    return bm.tobytes()


def contaminated_bloom(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    n_bits: int = 1 << 23,
    n_hashes: int = 4,
) -> DataFrame:
    """``contaminated()`` with the benchmark side carried as a Bloom
    filter: identical results (false positives are exactly re-verified),
    shuffle shrunk to the filter's survivors.  Use when the benchmark's
    distinct grams exceed broadcast comfort; size ``n_bits`` at ~10 bits
    per expected distinct gram for ~1% FPR."""
    from pyspark.sql.functions import pandas_udf

    # materialized once (localCheckpoint, not persist: no dangling cache
    # entry to leak — the r4 IVF lesson): the bitmap build consumes these
    # grams, then the exact verify join reads them AGAIN — without this
    # the benchmark explode+distinct (the dominant benchmark-side cost at
    # the scale this path exists for) runs twice
    bench_grams = (
        bench.select(F.explode(ngram_array(text_col, n)).alias("gram"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    bm_bytes = bloom_bitmap(bench_grams, n_bits, n_hashes)

    # one array<long> argument (pandas_udf rejects varargs signatures);
    # each Arrow batch becomes one (rows, k) int64 matrix — the bit test
    # stays fully vectorized
    @pandas_udf("boolean")
    def might_contain(hs: pd.Series) -> pd.Series:
        bm = np.frombuffer(bm_bytes, dtype=np.uint8)
        if len(hs) == 0:
            return pd.Series([], dtype=bool)
        m = np.array(hs.tolist(), dtype=np.int64)
        hits = (bm[m >> 3] & (1 << (m & 7).astype(np.uint8))) != 0
        return pd.Series(hits.all(axis=1))

    train_grams = train.select(
        F.col(id_col).alias("id"), F.explode(ngram_array(text_col, n)).alias("gram")
    )
    hcol = F.array(*_bloom_hash_cols(F.col("gram"), n_bits, n_hashes))
    pruned = (
        train_grams.withColumn("_mc", might_contain(hcol))
        .filter(F.col("_mc"))
        .drop("_mc")
    )
    # exact verify on the sliver: false positives must not drop docs
    return (
        pruned.join(bench_grams, "gram")
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit_grams"))
    )
