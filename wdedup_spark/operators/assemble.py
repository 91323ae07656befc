"""Conversation assembly under stable turn ordering.

The graft's analog of the reference's sequential scan of the original file
(/root/reference/src/wprof.cpp:88-144): transcripts arrive as per-turn rows
``(conv_id, turn_idx, role, text, tool, ts)`` (BASELINE.json input_hint) and
the dedup unit is the *conversation* — the reference's "word" generalized.

Stable ordering: ``array_sort(collect_list(struct(turn_idx, text)))`` sorts
by ``turn_idx`` with ``text`` as a deterministic tie-break, so the same
rows in any physical order assemble to the same document (fixture D4), while
permuted indices produce a different document (fixture D4X).  Per-turn text
equality is the invariant — role/tool/ts do not affect identity.

``conv_ord`` is the conversation's first-occurrence key, generalizing the
reference's byte offset of first occurrence (src/wprof.cpp:98): min ts then
conv_id, a total order that is stable under row shuffling.

Scale: one shuffle on conv_id (the natural partition key of the input
table; with an Iceberg table bucket-partitioned by conv_id this becomes a
shuffle-free ``groupBy``).  Output carries text exactly once — downstream
wide stages ship signatures, never documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Unit separator — cannot appear in whitespace-tokenized text.
TURN_SEP = "\x1e"


def assemble_conversations(turns: DataFrame) -> DataFrame:
    """turns(conv_id, turn_idx, role, text, tool, ts) → conv(conv_id, doc,
    n_turns, first_ts).

    ``doc`` is the canonical conversation document: per-turn texts joined by
    TURN_SEP in ``turn_idx`` order.
    """
    return turns.groupBy("conv_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
                lambda x: x["text"],
            ),
            TURN_SEP,
        ).alias("doc"),
        F.count(F.lit(1)).alias("n_turns"),
        F.min("ts").alias("first_ts"),
    )
