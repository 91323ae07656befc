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
  starts with ``A`` — and that successor is then the lexicographically
  SMALLEST proper extension, which doubles as the subsumption witness;
* ``repartitionByRange(text)`` + ``sortWithinPartitions`` realizes the
  global order with each partition holding a contiguous slice — one
  range-exchange shuffle, Spark's own sampled range partitioner
  balancing the slices;
* each partition answers its rows locally with ONE backward pass over
  its Arrow batches (no pairwise work: O(rows) comparisons total);
* rows whose successor lies across a partition boundary (the trailing
  run of equal texts in each slice) are stitched with per-partition
  summaries — a few short strings per partition collected to the driver
  (bounded by partition count, never by data) and rebroadcast, the
  same economy as the ledger's footer-only row counts.

The sorted corpus is localCheckpoint'ed before the two passes: Spark's
RangePartitioner re-samples per job, so without pinning, the summary
pass and the scan pass would see different partition boundaries and the
stitch would be wrong (not just slow).  The corpus text therefore
crosses the wire once and is materialized once.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _succ_run(texts: list, ids: list) -> list:
    """For each position in a (text, id)-ascending slice, the (text, id)
    of the FIRST row of the next DISTINCT-text run (None past the end) —
    one reverse scan."""
    n = len(texts)
    out: list = [None] * n
    for i in range(n - 1, -1, -1):
        if i + 1 < n:
            out[i] = (
                (texts[i + 1], ids[i + 1]) if texts[i + 1] != texts[i] else out[i + 1]
            )
    return out


def prefix_subsumed(
    df: DataFrame,
    text_col: str = "doc",
    id_col: str = "conv_id",
    n_partitions: int | None = None,
) -> DataFrame:
    """→ ``(id, subsumed, witness)``: ``subsumed`` iff the document's
    text is a PROPER prefix of some other document's text (equal texts
    are exact duplicates — the exact stage's job, not this one's);
    ``witness`` is then the subsuming document — deterministically the
    min-id row of the lexicographically smallest proper extension —
    usable directly as a (prefix → witness) dedup edge for the cluster
    stage.  ``witness`` is null when not subsumed.
    """
    spark = df.sparkSession
    rows = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    # null text has no prefix relation to anything: answer it directly
    # (subsumed=false, no witness) instead of letting None reach the
    # pandas scans; the union keeps the contract total over input rows
    nulls = rows.filter(F.col("text").isNull()).select(
        "id",
        F.lit(False).alias("subsumed"),
        F.lit(None).cast(rows.schema["id"].dataType).alias("witness"),
    )
    rows = rows.filter(F.col("text").isNotNull())
    par = n_partitions or max(spark.sparkContext.defaultParallelism, 2)
    # localCheckpoint PINS the range partitioning: RangePartitioner
    # samples per JOB (seeded by rdd id), so without it the summary pass
    # and the scan pass would see DIFFERENT partition boundaries and the
    # stitch map would be applied to slices it wasn't computed from
    # (verified empirically: two actions on the same repartitionByRange
    # produced different bounds at 200k rows).  Cost: one materialized
    # copy on executor storage for the operator's duration — on a real
    # cluster with a checkpoint dir, checkpoint() gives the same pinning
    # with executor-loss tolerance.
    ranged = (
        rows.repartitionByRange(par, "text", "id")
        .sortWithinPartitions("text", "id")
        .localCheckpoint(eager=True)
        .withColumn("pid", F.spark_partition_id())
    )

    # pass 1 — per-partition summaries for the boundary stitch: first
    # (text, id), last text, and the first (text, id) differing from the
    # first text (None when the whole slice is one run).  One summary row
    # per partition to the driver — bounded by partition count, never data.
    id_field = ranged.schema["id"].dataType
    summary_schema = T.StructType(
        [
            T.StructField("pid", T.IntegerType()),
            T.StructField("first_text", T.StringType()),
            T.StructField("first_id", id_field),
            T.StructField("last_text", T.StringType()),
            T.StructField("fd_text", T.StringType()),
            T.StructField("fd_id", id_field),
        ]
    )

    def summarize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        first = last = fd = pid = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            if pid is None:
                pid = int(pdf["pid"].iloc[0])
                first = (pdf["text"].iloc[0], pdf["id"].iloc[0])
            last = pdf["text"].iloc[-1]
            if fd is None:
                ne = pdf[pdf["text"] != first[0]]
                if len(ne):
                    fd = (ne["text"].iloc[0], ne["id"].iloc[0])
        if pid is not None:
            yield pd.DataFrame(
                {"pid": pd.Series([pid], dtype="object"),
                 "first_text": [first[0]],
                 "first_id": pd.Series([first[1]], dtype="object"),
                 "last_text": [last],
                 "fd_text": [fd[0] if fd else None],
                 "fd_id": pd.Series([fd[1] if fd else None], dtype="object")}
            )

    summaries = {r.pid: r for r in ranged.mapInPandas(summarize, summary_schema).collect()}
    # Global successor run for each partition's TRAILING equal-run
    # (text == last_text): walk later partitions, skipping slices
    # entirely equal to it.
    boundary_succ: dict[int, tuple | None] = {}
    pids = sorted(summaries)
    for idx, p in enumerate(pids):
        t = summaries[p].last_text
        succ = None
        for q in pids[idx + 1:]:
            s = summaries[q]
            if s.first_text != t:
                succ = (s.first_text, s.first_id)
                break
            if s.fd_text is not None:
                succ = (s.fd_text, s.fd_id)
                break
        boundary_succ[p] = succ
    bc = spark.sparkContext.broadcast(boundary_succ)

    out_schema = T.StructType(
        [
            T.StructField("id", id_field),
            T.StructField("subsumed", T.BooleanType()),
            T.StructField("witness", id_field),
        ]
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
        texts = pdf["text"].tolist()
        succ = _succ_run(texts, pdf["id"].tolist())
        tail = bc.value.get(int(pdf["pid"].iloc[0]))
        sub, wit = [], []
        for t, s in zip(texts, succ):
            nxt = s if s is not None else tail
            hit = nxt is not None and nxt[0].startswith(t)
            sub.append(hit)
            wit.append(nxt[1] if hit else None)
        yield pd.DataFrame(
            {"id": pdf["id"], "subsumed": sub,
             "witness": pd.Series(wit, dtype="object")}
        )

    return ranged.mapInPandas(scan, out_schema).unionByName(nulls)


def prefix_edges(
    df: DataFrame, text_col: str = "doc", id_col: str = "conv_id"
) -> DataFrame:
    """Dedup edges ``(conv_a=witness, conv_b=prefix)`` for the cluster
    stage — one edge per subsumed document; chains of prefixes (A ⊏ B ⊏
    C) connect transitively through connected components."""
    out = prefix_subsumed(df, text_col, id_col).filter(F.col("subsumed"))
    return out.select(
        F.col("witness").alias("conv_a"), F.col("id").alias("conv_b")
    )


def remove_prefix_subsumed(
    df: DataFrame, text_col: str = "doc", id_col: str = "conv_id"
) -> DataFrame:
    """Corpus with proper-prefix documents dropped — join back on id so
    the caller's other columns survive."""
    keep = prefix_subsumed(df, text_col, id_col).filter(~F.col("subsumed"))
    return df.join(
        keep.select(F.col("id").alias(id_col)), id_col, "left_semi"
    )
