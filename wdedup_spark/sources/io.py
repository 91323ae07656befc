"""Input/output layer — the graft's O1/O11 (SURVEY.md §2).

The reference reads one large text file sequentially with 4 KB buffers
(/root/reference/include/wio.hpp:87-173, src/wiobase.cpp:39-107) and
writes sorted profile files (src/wpflsimple.cpp:34-80).  Here: columnar
sources with split-level parallelism; Iceberg when a catalog is
configured, parquet otherwise (this sandbox has no Iceberg runtime jar —
the code path is gated, not assumed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession, identifier: str | None = None) -> bool:
    """True if an Iceberg catalog is configured and loadable.

    With ``identifier`` (``catalog.db.tbl``), answers for THAT
    identifier's catalog prefix — arbitrary catalog names work (the
    production recipe uses e.g. ``lake.db.turns``); without it, answers
    whether the session-default ``spark_catalog`` is overridden.
    """
    try:
        if identifier and "." in identifier:
            cat = identifier.split(".", 1)[0]
            if spark.conf.get(f"spark.sql.catalog.{cat}", None):
                return True
        return bool(spark.conf.get("spark.sql.catalog.spark_catalog", None))
    except Exception:
        return False


def read_turns(spark: SparkSession, source: str) -> DataFrame:
    """Read the transcript turns table: an Iceberg table name
    (``catalog.db.tbl``) when its catalog is configured, else a parquet
    path."""
    if "/" not in source and iceberg_available(spark, source):
        return spark.read.format("iceberg").load(source)
    return spark.read.parquet(source)


def write_table(df: DataFrame, target: str, mode: str = "overwrite") -> None:
    """Write a stage output: Iceberg table name or parquet path."""
    if "/" not in target:
        df.writeTo(target).createOrReplace()
    else:
        df.write.mode(mode).parquet(target)


def read_words_from_textfile(spark: SparkSession, path: str) -> DataFrame:
    """wdedup parity source: whitespace-delimited text file(s) → (word, ord).

    The reference's exact input model (/root/reference/src/wprof.cpp:44-47:
    words split on ' \\t\\n\\r', first-occurrence byte offset).  ``ord`` is a
    STRUCT ordering key derived from real file coordinates, never a packed
    BIGINT:

      (file_path, split byte offset, row-in-partition counter, token pos)

    * ``_metadata.file_block_start`` is the split's byte offset — splits of
      one file order by where they start, regardless of which partition
      Spark packed them into or in what order partitions enumerate;
    * the low 33 bits of ``monotonically_increasing_id`` are the documented
      within-partition row counter — rows of one split are read
      sequentially (Hadoop line-reader contract), so the counter is
      monotone inside each (file, split) run; the struct's higher fields
      make cross-split/cross-partition counter values irrelevant;
    * multi-file inputs order by path, lexicographically — a documented,
      deterministic generalization of the reference's single-file offset.

    vs the round-1 ``monotonically_increasing_id() * 2^20 + pos``: that
    packed key both overflowed int64 once partition indexes reached 1024
    (≈32 GB of input at 32 MB splits — below the reference's headline
    100 GB) and silently assumed partition enumeration order equals byte
    order.  Struct min/orderBy costs the same one exchange.
    """
    lines = spark.read.text(path).select(
        F.col("_metadata.file_path").alias("_f"),
        F.col("_metadata.file_block_start").alias("_b"),
        F.monotonically_increasing_id().bitwiseAND(F.lit((1 << 33) - 1)).alias("_r"),
        "value",
    )
    toks = F.split(F.col("value"), r"[ \t\r]+")
    return (
        lines.select("_f", "_b", "_r", F.posexplode(toks).alias("pos", "word"))
        .filter(F.col("word") != "")
        .select(
            "word",
            F.struct(
                F.col("_f").alias("file"),
                F.col("_b").alias("split_start"),
                F.col("_r").alias("row"),
                F.col("pos").alias("pos"),
            ).alias("ord"),
        )
    )


def find_first_unique_word_in_file(spark: SparkSession, path: str) -> str:
    """The reference's entire CLI semantic (src/main.cpp:208-222): first
    non-repeated word of a text file, '' if none (src/wfindfirst.cpp:44,59)."""
    from wdedup_spark.operators.wdedup import find_first_unique, word_profile

    words = read_words_from_textfile(spark, path)
    rows = find_first_unique(word_profile(words)).collect()
    return rows[0]["word"] if rows else ""
