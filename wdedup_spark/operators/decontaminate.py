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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ngram_array(text: Column | str, n: int) -> Column:
    """Distinct n-token grams of a whitespace-tokenized text, as joined
    strings; empty array when the doc has fewer than ``n`` tokens (a doc
    shorter than the gram width cannot be contaminated by this rule)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.filter(F.split(c, r"\s+"), lambda x: x != "")
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def contaminated(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    broadcast_bench: bool = True,
) -> DataFrame:
    """→ ``(id, n_hit_grams)``: training docs sharing ≥1 n-gram with the
    benchmark corpus, with the count of DISTINCT shared grams (the
    severity signal a contamination report wants)."""
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
