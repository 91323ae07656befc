"""Span-level (paragraph / fixed-window) exact dedup across a corpus.

The C4 / The-Pile preprocessing step the document-level stages can't
express: a boilerplate paragraph pasted into 10^6 otherwise-distinct
documents never makes those documents near-duplicates of each other,
but a training pipeline still wants every repeat of the paragraph gone.
This is the span-granularity analog of the reference's word-level
first-occurrence rule (/root/reference/src/wfindfirst.cpp:48-57,
README.md:79-80 "lesser occurrence picked"): the globally FIRST
occurrence of a span survives, every later occurrence is dropped, and
the surviving spans are re-assembled into cleaned documents.

Two span definitions, one code path:

* ``mode="delim"`` — split on a paragraph delimiter (default ``\\n``):
  real paragraph dedup for multi-paragraph corpora;
* ``mode="window"`` — fixed non-overlapping ``span_tokens``-token
  windows: the C4-style "three-sentence span" stand-in that also works
  on single-line corpora.

Scale design (the 100 TB story):

* span explode is NARROW — no shuffle; rows grow ~n_spans× but each
  carries only (id, idx, span);
* the duplicate-detection shuffle exchanges a 32-byte sha2 digest plus
  a single packed ``pos`` bigint per span — never the document, and
  map-side partial aggregation collapses within-partition repeats
  before the exchange (boilerplate floods are mostly collapsed before
  they ship);
* first-occurrence is ``min(pos)`` where ``pos = id * POS_BASE + idx``
  packs (document, position) into one comparable bigint — a plain
  ``min`` aggregate, no window function, no sort, no min-of-struct
  (kept SQL-portable so the DuckDB oracle states the identical rule);
* reconstruction is one join on the digest (AQE handles skew: a
  hot boilerplate span joins against exactly one keeper row) and one
  groupBy(id) whose collect_list is bounded by the document's own span
  count — per-document data, the same bound assemble already carries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: packing base for the first-occurrence ordinal: pos = id * POS_BASE + idx.
#: Caps documents at 2^20 spans (a 16M-token doc at the default window);
#: ids up to ~2^43 stay collision-free in a signed 64-bit bigint.
POS_BASE = 1 << 20


def doc_spans(
    df: DataFrame,
    text_col: str = "doc",
    id_col: str = "conv_id",
    mode: str = "window",
    delim: str = "\n",
    span_tokens: int = 16,
) -> DataFrame:
    """Explode documents into ``(id, span_idx, span)`` rows — narrow, all
    JVM-side (split/slice/sequence/posexplode inside whole-stage codegen).

    ``window`` mode tokenizes on single spaces and emits non-overlapping
    ``span_tokens``-token windows (the tail window may be short);
    ``delim`` mode splits on the LITERAL paragraph delimiter (regex
    metacharacters are neutralized — split and the reconstruction joiner
    must agree on the same string) and keeps empty spans: blank
    paragraphs are document STRUCTURE, which ``remove_duplicate_spans``
    must preserve (``duplicate_spans`` ignores them).  Null texts
    produce no spans.
    """
    sid = F.col(id_col).alias("id")
    if mode == "delim":
        # java.util.regex.Pattern.quote semantics: embedded "\E" would
        # otherwise close the \Q...\E quote early (or dangle), making
        # split and the raw-string reconstruction joiner disagree
        quoted = "\\Q" + delim.replace("\\E", "\\E\\\\E\\Q") + "\\E"
        return df.select(
            sid,
            F.posexplode(F.split(F.col(text_col), quoted)).alias("span_idx", "span"),
        )
    if mode != "window":
        raise ValueError(f"mode must be 'delim' or 'window', got {mode!r}")
    toks = F.split(F.col(text_col), " ")
    n_spans = F.ceil(F.size("t") / F.lit(span_tokens)).cast("int")
    return (
        df.select(sid, toks.alias("t"))
        .filter(F.size("t") > 0)
        .select("id", F.explode(F.sequence(F.lit(0), n_spans - 1)).alias("span_idx"), "t")
        .select(
            "id",
            "span_idx",
            F.array_join(
                F.slice("t", F.col("span_idx") * span_tokens + 1, span_tokens), " "
            ).alias("span"),
        )
    )


def _with_pos(spans: DataFrame) -> DataFrame:
    from pyspark.sql import types as T

    # the packed ordinal needs a NUMERIC id: a non-castable id (string
    # conv_ids) would turn every pos NULL and "dedup" the corpus to
    # nothing — fail loudly instead (hash or zipWithIndex string ids
    # before calling, as the driver queries do with doc_id)
    id_type = spans.schema["id"].dataType
    if not isinstance(id_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        raise TypeError(
            f"span dedup requires an integral id column, got {id_type.simpleString()}; "
            "derive a DENSE nonnegative id first (e.g. zipWithIndex / row_number — "
            "NOT a 64-bit hash: the packed ordinal needs ids below 2^43)"
        )
    # the packing is only injective while span_idx < POS_BASE AND the id
    # sits in [0, 2^43): a >16M-token document, a negative id, or a
    # full-range hashed id must fail loudly, not silently wrap mod 2^64
    # (ANSI is off for the hash kernels) and dedup the wrong occurrences
    guard = F.assert_true(
        (F.col("span_idx") < POS_BASE)
        & (F.col("id").cast("long") >= 0)
        & (F.col("id").cast("long") < F.lit(1 << 43)),
        F.lit("span dedup packing needs span_idx < 2^20 and id in [0, 2^43)"),
    )
    return spans.select(
        "id",
        "span_idx",
        "span",
        F.sha2(F.col("span"), 256).alias("span_fp"),
        F.when(
            guard.isNull(), F.col("id").cast("long") * POS_BASE + F.col("span_idx")
        ).alias("pos"),
    )


def duplicate_spans(spans: DataFrame, min_docs: int = 2) -> DataFrame:
    """Spans occurring in ≥ ``min_docs`` distinct documents →
    ``(span, n_docs, n_occurrences, first_doc, first_idx)``.

    One hash aggregate on the 32-byte digest; ``min(span)`` recovers the
    text (every row in a digest group is the identical string)."""
    return (
        _with_pos(spans.filter(F.length("span") > 0))
        .groupBy("span_fp")
        .agg(
            F.min("span").alias("span"),
            F.count_distinct("id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("pos").alias("first_pos"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .select(
            "span",
            "n_docs",
            "n_occurrences",
            # integer div, not `/`: long / long is DOUBLE division in
            # Spark, and pos > 2^53 (id > ~2^33) would round across a
            # document boundary
            F.expr(f"first_pos div {POS_BASE}").cast("long").alias("first_doc"),
            (F.col("first_pos") % POS_BASE).cast("long").alias("first_idx"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    text_col: str = "doc",
    id_col: str = "conv_id",
    mode: str = "window",
    delim: str = "\n",
    span_tokens: int = 16,
) -> DataFrame:
    """Corpus-wide span dedup: every span keeps only its globally first
    occurrence (min packed ``pos``); surviving spans re-assemble in
    original order → ``(id, clean_text)``.

    A document whose every span was seen earlier elsewhere comes back
    with ``clean_text = ''`` (kept, not dropped — the caller decides
    whether empty documents survive, same as C4's filter stage)."""
    joiner = " " if mode == "window" else delim
    spans = _with_pos(
        doc_spans(df, text_col, id_col, mode=mode, delim=delim, span_tokens=span_tokens)
    )
    # empty spans (blank paragraphs in delim mode) are structure, not
    # content: they never enter the keeper contest and are always kept,
    # so dup-free input round-trips byte-identically
    keepers = (
        spans.filter(F.length("span") > 0)
        .groupBy("span_fp")
        .agg(F.min("pos").alias("first_pos"))
    )
    kept = (
        spans.join(keepers, "span_fp", "left")
        .filter(F.col("first_pos").isNull() | (F.col("pos") == F.col("first_pos")))
        .groupBy("id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("span_idx", "span"))),
                    lambda s: s.span,
                )
            , joiner).alias("clean_text")
        )
    )
    ids = df.select(F.col(id_col).alias("id")).distinct()
    return (
        ids.join(kept, "id", "left")
        .select("id", F.coalesce("clean_text", F.lit("")).alias("clean_text"))
    )
