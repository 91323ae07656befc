"""Prefix-subsumption dedup — drop documents that are a proper prefix of
another document.

The agent-transcript case the similarity channels miss: a conversation
that died mid-run and was retried, or a transcript checkpointed at two
lengths, yields a SHORT document that is byte-for-byte a prefix of a
LONG one.  Jaccard/containment on shingles degrades as the length ratio
grows (a 10-turn prefix of a 500-turn transcript has Jaccard ~0.02), and
exact dedup sees two distinct digests — yet a training pipeline wants
the subsumed prefix gone.

The distributed design is the reference's sort-then-scan idiom (O5
sort+emit, /root/reference/src/wprof.cpp:143-156: duplicates become
neighbors under a total order) lifted to a cluster:

* strings sharing prefix ``A`` occupy the contiguous interval
  ``[A, A~)`` in lexicographic order, so ``A`` is a proper prefix of
  SOME other document iff the next DISTINCT text in global sort order
  starts with ``A``;
* ``repartitionByRange(text)`` + ``sortWithinPartitions`` realizes the
  global order with each partition holding a contiguous slice — one
  range-exchange shuffle, Spark's own sampled range partitioner
  balancing the slices;
* each partition answers its rows locally with ONE backward pass over
  its Arrow batches (no pairwise work: O(rows) comparisons total);
* rows whose successor lies across a partition boundary (the trailing
  run of equal texts in each slice) are stitched with per-partition
  summaries — 3 short strings per partition collected to the driver
  (bounded by partition count, never by data) and rebroadcast, the
  same economy as the ledger's footer-only row counts.

The second pass reuses the first pass's range-exchange shuffle files
(same lineage → Spark skips the exchanged stages), so the corpus text
crosses the wire once.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _succ_distinct(texts: "pd.Series") -> list:
    """For each position in an ascending-sorted series, the next DISTINCT
    value after its run of equals (None past the end) — one reverse scan."""
    n = len(texts)
    out = [None] * n
    nxt = None
    vals = texts.tolist()
    for i in range(n - 1, -1, -1):
        if i + 1 < n:
            nxt = vals[i + 1] if vals[i + 1] != vals[i] else out[i + 1]
        out[i] = nxt
    return out


def prefix_subsumed(
    df: DataFrame,
    text_col: str = "doc",
    id_col: str = "conv_id",
    n_partitions: int | None = None,
) -> DataFrame:
    """→ ``(id, subsumed)``: True iff the document's text is a PROPER
    prefix of some other document's text (equal texts are exact
    duplicates — the exact stage's job, not this one's).
    """
    spark = df.sparkSession
    rows = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    par = n_partitions or max(spark.sparkContext.defaultParallelism, 2)
    ranged = (
        rows.repartitionByRange(par, "text")
        .sortWithinPartitions("text")
        .withColumn("pid", F.spark_partition_id())
    )

    # pass 1 — per-partition summaries for the boundary stitch: the
    # partition's first text, its last text, and the first text that
    # differs from the first (None when the whole slice is one run).
    # One summary row per partition to the driver — bounded by partition
    # count, never by data.
    summary_schema = T.StructType(
        [
            T.StructField("pid", T.IntegerType()),
            T.StructField("first_text", T.StringType()),
            T.StructField("last_text", T.StringType()),
            T.StructField("first_distinct", T.StringType()),
        ]
    )

    def summarize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        first = last = first_distinct = pid = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            if pid is None:
                pid = int(pdf["pid"].iloc[0])
                first = pdf["text"].iloc[0]
            last = pdf["text"].iloc[-1]
            if first_distinct is None:
                ne = pdf["text"][pdf["text"] != first]
                if len(ne):
                    first_distinct = ne.iloc[0]
        if pid is not None:
            yield pd.DataFrame(
                {"pid": [pid], "first_text": [first], "last_text": [last],
                 "first_distinct": [first_distinct]}
            )

    summaries = {r.pid: r for r in ranged.mapInPandas(summarize, summary_schema).collect()}
    # Global successor-distinct for each partition's TRAILING equal-run
    # (text == last_text): walk later partitions, skipping slices
    # entirely equal to it.
    boundary_succ: dict[int, str | None] = {}
    pids = sorted(summaries)
    for idx, p in enumerate(pids):
        t = summaries[p].last_text
        succ = None
        for q in pids[idx + 1:]:
            s = summaries[q]
            if s.first_text != t:
                succ = s.first_text
                break
            if s.first_distinct is not None:
                succ = s.first_distinct
                break
        boundary_succ[p] = succ
    bc = spark.sparkContext.broadcast(boundary_succ)

    id_field = ranged.schema["id"].dataType
    out_schema = T.StructType(
        [T.StructField("id", id_field), T.StructField("subsumed", T.BooleanType())]
    )

    # pass 2 — one backward scan per partition; mapInPandas streams the
    # partition's batches but the scan needs the whole sorted slice, so
    # concatenate (bounded by the range partitioner's slice sizing, the
    # same per-partition bound every sort-based operator carries).
    def scan(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = list(it)
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        succ = _succ_distinct(pdf["text"])
        tail = bc.value.get(int(pdf["pid"].iloc[0]))
        texts = pdf["text"].tolist()
        sub = [
            (s if s is not None else tail) is not None
            and (s if s is not None else tail).startswith(t)
            for t, s in zip(texts, succ)
        ]
        yield pd.DataFrame({"id": pdf["id"], "subsumed": sub})

    return ranged.mapInPandas(scan, out_schema)


def remove_prefix_subsumed(
    df: DataFrame, text_col: str = "doc", id_col: str = "conv_id"
) -> DataFrame:
    """Corpus with proper-prefix documents dropped — join back on id so
    the caller's other columns survive."""
    keep = prefix_subsumed(df, text_col, id_col).filter(~F.col("subsumed"))
    return df.join(
        keep.select(F.col("id").alias(id_col)), id_col, "left_semi"
    )
