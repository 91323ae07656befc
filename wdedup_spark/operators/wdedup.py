"""The reference's entire query, Spark-first: word profile + find-first-unique.

wdedup's three stages over a 100 GB text file —

  wprof      (/root/reference/src/wprof.cpp:169-302)   per-segment dedup
  wmerge     (/root/reference/src/wmerge.cpp:54-156)   binary merge tree
  wfindfirst (/root/reference/src/wfindfirst.cpp:35-60) argmin scan

— collapse into one declarative plan: ``tokenize → groupBy(word).agg(count,
min(ord)) → filter(count==1) → min_by(word, ord)``.  Spark's hash aggregate
does the reference's partial per-segment dedup (src/wtreededup.cpp:66-95)
map-side and its equal-key collapse (src/wmerge.cpp:124-127) in the final
aggregate; one shuffle exchange replaces the whole lg(N/M)-level DP-planned
merge tree (src/wmpdp.cpp:83-99).  AQE sizes/coalesces the exchange the way
the DP planner sized merges.

"First occurrence" generalizes the reference's byte offset
(src/wprof.cpp:98) to any total ordering key; for a table of documents we
use ``doc_ord * 2^20 + token_pos`` (single BIGINT so the same expression is
trivially mirrored in the DuckDB oracle).

Scale notes (100 TB): the scan is columnar parquet with column pruning to
the text column only; tokenize+posexplode is narrow (no shuffle); the only
exchange is the hash aggregate on ``word``, which partial-aggregates
map-side first — shuffle volume is bounded by distinct words per partition,
not token count.  Zipfian word skew is absorbed by the partial aggregate
(hot words collapse to one row per map partition before the exchange).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Max tokens per document for the packed ordering key (2^20).  At 100 TB
#: scale use a struct key + min(struct) instead; packed BIGINT keeps the
#: DuckDB oracle expression identical.
ORD_SHIFT = 1 << 20

WHITESPACE_RE = r"\s+"


def tokenize(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """O2 tokenizer (src/wprof.cpp:50-144) as a scan-time projection.

    Splits on whitespace runs (the reference's ``' \\t\\n\\r'`` class,
    src/wprof.cpp:44-47), emitting ``(word, ord)`` where ``ord`` is the
    global first-occurrence ordering key.  Empty tokens from leading
    whitespace are dropped (the reference skips whitespace runs,
    src/wprof.cpp:70-86).
    """
    toks = F.split(F.col(text_col), WHITESPACE_RE)
    return (
        df.select(F.col(id_col), F.posexplode(toks).alias("pos", "word"))
        .filter(F.col("word") != "")
        .select(
            "word",
            (F.col(id_col).cast("long") * ORD_SHIFT + F.col("pos")).alias("ord"),
        )
    )


def word_profile(tokens: DataFrame) -> DataFrame:
    """O4+O6: the ProfileItem relation {word, n, first_ord}.

    ProfileItem {word, repeated, occur} (include/wprofile.hpp:47-71) maps to
    ``{word, n >= 2, first_ord}``; unlike the reference — which discards the
    offset once a word repeats (src/wmerge.cpp:124-127) — we keep
    ``min(ord)`` for every word, which is strictly more information at the
    same cost.
    """
    return tokens.groupBy("word").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("ord").alias("first_ord"),
    )


def singular_filter(profile: DataFrame) -> DataFrame:
    """O9 singleton filter (src/wpflfilter.cpp:33-50): keep words seen once."""
    return profile.filter(F.col("n") == 1)


def find_first_unique(profile: DataFrame) -> DataFrame:
    """O10 argmin scan (src/wfindfirst.cpp:35-60): the first non-repeated
    word by first occurrence.  Returns a 1-row DataFrame (0 rows if every
    word repeats — the reference prints "" in that case,
    src/wfindfirst.cpp:44,59).  The n=1 case of :func:`find_top_unique`."""
    return find_top_unique(profile, n=1)


def find_top_unique(profile: DataFrame, n: int = 10) -> DataFrame:
    """Find-TopN — the generalization the reference's README anticipates
    as future work (/root/reference/README.md:83: alternative final scans
    over the merged profile; wfindfirst is deliberately un-logged for
    exactly this reason, include/wdedup.hpp:157-163).  Top-n non-repeated
    words by first occurrence: same plan shape as O10 with limit(n) —
    Spark's TakeOrderedAndProject does the per-partition top-n + driver
    merge, so no global sort materializes."""
    return (
        singular_filter(profile)
        .orderBy("first_ord")
        .limit(n)
        .select("word", "first_ord")
    )


def word_dedup_pipeline(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """wprof → wmerge → wfindfirst end-to-end (src/main.cpp:208-222)."""
    return find_first_unique(word_profile(tokenize(df, text_col, id_col)))
