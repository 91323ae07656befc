"""Streaming containment probe: is a NEW document a quote/superset of
anything already indexed (or vice versa)?

Same decomposition discipline as ``neardup_stream``: everything on the
stream side is per-row and stateless (shingle, sort, slice, explode),
and the corpus is reached only through stream-static equi-joins — the
shape Structured Streaming supports without state.

Order choice: the prefix filter (operators/containment.py) is lossless
under ANY single consistent total token order.  The batch operator
orders by global frequency (shortest postings), but computing corpus
frequencies for a stream row would need a stream-side aggregation —
stateful.  Here both sides order by TOKEN VALUE instead: per-row
``array_sort``, zero state, same losslessness; the trade is
unoptimized posting lists (documented — hot tokens can land in
prefixes), which the pipeline's exact-first invariant keeps tolerable.

Both subsumption directions are probed:
* stream doc smaller → its prefix tokens ⨝ static FULL postings;
* indexed doc smaller → static prefix postings ⨝ stream FULL tokens.

The stream's shingle array rides along the token explode for the exact
verify (a stream row cannot be re-joined to itself), so a document with
n shingles amplifies to ~n rows × n-element arrays inside its
micro-batch — fine at conversation scale (hundreds of shingles), use
the batch/incremental channel for megabyte documents.

Output may contain duplicate (conv_id, index_id) rows — one per shared
candidate token; a per-batch ``dropDuplicates`` in ``foreachBatch`` (or
any downstream exact stage) collapses them.  Emitting duplicates keeps
this operator stateless.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wdedup_spark.operators.containment import containment_udf
from wdedup_spark.operators.minhash import add_signatures


def _prefix_len(t: float):
    # |X| - ceil(t|X|) + 1, float-safe (operators/containment.py)
    return (F.col("sz") - F.ceil(F.round(F.col("sz") * t, 6)) + 1).cast("int")


@dataclass(frozen=True)
class ContainmentIndex:
    """Static corpus side, built once from the committed sign stage."""

    prefix: DataFrame   # (tk, index_id, index_sz) — rarest-by-value prefix postings
    tokens: DataFrame   # (tk, index_id, index_sz) — full postings
    sets: DataFrame     # (index_id, index_sh)     — sorted distinct shingle arrays


def containment_index(
    signed: DataFrame,
    threshold: float = 0.9,
    id_col: str = "conv_id",
    shingle_col: str = "shingles",
) -> ContainmentIndex:
    """Build the static side from a (batch) signed table — in production
    the committed sign stage outputs, exactly like ``index_for_stream``."""
    t = float(threshold)
    sets = (
        signed.select(
            F.col(id_col).alias("index_id"),
            F.array_sort(F.array_distinct(F.col(shingle_col))).alias("sh"),
        )
        .withColumn("sz", F.size("sh"))
        .filter(F.col("sz") > 0)
    )
    prefix = sets.select(
        "index_id", F.col("sz").alias("index_sz"),
        F.explode(F.slice("sh", 1, _prefix_len(t))).alias("tk"),
    )
    tokens = sets.select(
        "index_id", F.col("sz").alias("index_sz"), F.explode("sh").alias("tk")
    )
    return ContainmentIndex(
        prefix=prefix,
        tokens=tokens,
        sets=sets.select("index_id", F.col("sh").alias("index_sh")),
    )


def stream_containment_flags(
    docs: DataFrame,
    index: ContainmentIndex,
    threshold: float = 0.9,
    k: int = 3,
    n_perms: int = 128,
    seed: int = 42,
) -> DataFrame:
    """Streaming documents (conv_id, doc) → rows flagging containment
    pairs with anything indexed: (conv_id, index_id, containment).

    May emit duplicate pair rows (see module docstring)."""
    t = float(threshold)
    signed = add_signatures(
        docs, "doc", k=k, n_perms=n_perms, seed=seed,
        enable_simhash=False, enable_substring=False,
    ).select(
        F.col("conv_id").alias("stream_id"),
        F.array_sort(F.array_distinct("shingles")).alias("sh"),
    ).withColumn("sz", F.size("sh")).filter(F.col("sz") > 0)

    sprefix = signed.select(
        "stream_id", "sh", "sz",
        F.explode(F.slice("sh", 1, _prefix_len(t))).alias("tk"),
    )
    stokens = signed.select("stream_id", "sh", "sz", F.explode("sh").alias("tk"))

    # stream smaller: its prefix must hit the larger indexed set somewhere
    c1 = sprefix.join(index.tokens, "tk").filter(F.col("sz") <= F.col("index_sz"))
    # indexed doc smaller: its (static) prefix must hit the stream's full tokens
    c2 = stokens.join(index.prefix, "tk").filter(F.col("index_sz") <= F.col("sz"))
    cands = c1.select("stream_id", "sh", "index_id").unionByName(
        c2.select("stream_id", "sh", "index_id")
    ).filter(F.col("stream_id") != F.col("index_id"))

    return (
        cands.join(index.sets, "index_id")
        .withColumn("containment", containment_udf(F.col("sh"), F.col("index_sh")))
        .filter(F.col("containment") >= t)
        .select(F.col("stream_id").alias("conv_id"), "index_id", "containment")
    )
