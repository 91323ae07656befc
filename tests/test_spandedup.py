"""Span-level dedup: paragraph (delim) and fixed-window modes, duplicate
detection, and first-occurrence removal/reconstruction — checked against a
transparent pure-Python oracle on randomized corpora."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from wdedup_spark.operators.spandedup import (
    POS_BASE,
    doc_spans,
    duplicate_spans,
    remove_duplicate_spans,
)

BOILER = "subscribe to our newsletter for updates"
PARA_DOCS = [
    (1, f"alpha beta gamma\n{BOILER}\ndelta epsilon"),
    (2, f"{BOILER}\nzeta eta theta"),
    (3, "iota kappa\nlambda mu"),
    (4, f"{BOILER}\n{BOILER}\nnu xi"),
]


@pytest.fixture(scope="module")
def para_df(spark):
    return spark.createDataFrame(PARA_DOCS, ["conv_id", "doc"])


def test_delim_spans_and_duplicates(spark, para_df):
    spans = doc_spans(para_df, mode="delim")
    dups = {r.span: r for r in duplicate_spans(spans).collect()}
    assert set(dups) == {BOILER}
    d = dups[BOILER]
    # doc 4 repeats it twice -> 4 occurrences across 3 distinct docs;
    # global first occurrence is doc 1 paragraph 1
    assert (d.n_docs, d.n_occurrences, d.first_doc, d.first_idx) == (3, 4, 1, 1)


def test_delim_removal_keeps_first_occurrence_only(spark, para_df):
    got = {
        r.id: r.clean_text
        for r in remove_duplicate_spans(para_df, mode="delim").collect()
    }
    assert got == {
        1: f"alpha beta gamma\n{BOILER}\ndelta epsilon",  # first occurrence survives
        2: "zeta eta theta",
        3: "iota kappa\nlambda mu",
        4: "nu xi",
    }


def test_fully_deduplicated_doc_comes_back_empty(spark):
    df = spark.createDataFrame(
        [(10, "a b\nc d"), (20, "a b"), (30, "a b\nc d")], ["conv_id", "doc"]
    )
    got = {r.id: r.clean_text for r in remove_duplicate_spans(df, mode="delim").collect()}
    assert got == {10: "a b\nc d", 20: "", 30: ""}


def _window_oracle(docs: list[tuple[int, str]], w: int):
    """Pure-Python span dedup: first occurrence (by (id, idx)) of each
    w-token window survives."""
    spans = []  # (id, idx, span)
    for i, text in docs:
        toks = text.split(" ") if text else [""]
        for g in range((len(toks) + w - 1) // w):
            spans.append((i, g, " ".join(toks[g * w:(g + 1) * w])))
    first = {}
    for i, g, s in sorted(spans, key=lambda r: (r[0], r[1])):
        first.setdefault(s, (i, g))
    clean = {i: [] for i, _ in docs}
    for i, g, s in spans:
        if first[s] == (i, g):
            clean[i].append((g, s))
    return first, {
        i: " ".join(s for _, s in sorted(parts)) for i, parts in clean.items()
    }


def test_window_mode_randomized_vs_oracle(spark):
    rng = random.Random(7)
    vocab = [f"w{j}" for j in range(12)]
    base = [" ".join(rng.choice(vocab) for _ in range(rng.randint(1, 40))) for _ in range(30)]
    docs = []
    for i in range(60):
        if i >= 30 and rng.random() < 0.5:
            # paste a shared prefix block to plant cross-doc span dups
            docs.append((i, base[i - 30]))
        else:
            docs.append((i, base[i % 30] if i < 30 else " ".join(rng.choice(vocab) for _ in range(17))))
    df = spark.createDataFrame(docs, ["conv_id", "doc"])
    w = 8
    first, clean = _window_oracle(docs, w)

    got_clean = {
        r.id: r.clean_text
        for r in remove_duplicate_spans(df, mode="window", span_tokens=w).collect()
    }
    assert got_clean == clean

    want_dups = {}
    counts: dict[str, list] = {}
    for i, text in docs:
        toks = text.split(" ")
        for g in range((len(toks) + w - 1) // w):
            s = " ".join(toks[g * w:(g + 1) * w])
            counts.setdefault(s, []).append(i)
    for s, ids in counts.items():
        if len(set(ids)) >= 2:
            want_dups[s] = (len(set(ids)), len(ids), *first[s])
    got_dups = {
        r.span: (r.n_docs, r.n_occurrences, r.first_doc, r.first_idx)
        for r in duplicate_spans(
            doc_spans(df, mode="window", span_tokens=w), min_docs=2
        ).collect()
    }
    assert got_dups == want_dups


def test_dup_free_input_round_trips_including_blank_paragraphs(spark):
    docs = [(1, "a\n\nb\n"), (2, "c d\ne")]  # blank para + trailing delim
    got = {r.id: r.clean_text for r in remove_duplicate_spans(
        spark.createDataFrame(docs, ["conv_id", "doc"]), mode="delim"
    ).collect()}
    assert got == dict(docs)


def test_delim_is_literal_not_regex(spark):
    docs = [(1, "a.b"), (2, "a.z")]
    spans = doc_spans(
        spark.createDataFrame(docs, ["conv_id", "doc"]), mode="delim", delim="."
    )
    got = {(r.id, r.span_idx, r.span) for r in spans.collect()}
    assert got == {(1, 0, "a"), (1, 1, "b"), (2, 0, "a"), (2, 1, "z")}


def test_delim_containing_quote_terminator_round_trips(spark):
    # "\E" inside the delimiter would close the \Q...\E regex quote early
    # without Pattern.quote-style re-escaping
    delim = "\\E"
    docs = [(1, f"a b{delim}c d"), (2, f"a b{delim}x")]
    got = {r.id: r.clean_text for r in remove_duplicate_spans(
        spark.createDataFrame(docs, ["conv_id", "doc"]), mode="delim", delim=delim
    ).collect()}
    assert got == {1: f"a b{delim}c d", 2: "x"}


def test_string_ids_rejected_loudly(spark):
    df = spark.createDataFrame([("x", "a b")], ["conv_id", "doc"])
    with pytest.raises(TypeError, match="integral id"):
        duplicate_spans(doc_spans(df)).collect()


def test_window_spans_are_slices_with_packed_pos(spark):
    df = spark.createDataFrame([(5, " ".join(str(j) for j in range(20)))], ["conv_id", "doc"])
    rows = doc_spans(df, mode="window", span_tokens=16).orderBy("span_idx").collect()
    assert [(r.span_idx, r.span) for r in rows] == [
        (0, " ".join(str(j) for j in range(16))),
        (1, " ".join(str(j) for j in range(16, 20))),  # short tail window
    ]
    assert POS_BASE == 1 << 20


def test_no_narrow_dependency_breakage_in_plan(spark, para_df):
    """Span explode must stay shuffle-free: the only exchanges in the
    removal plan are the keeper aggregate, its join, and the per-doc
    reassembly — no exchange before the first groupBy."""
    plan = remove_duplicate_spans(para_df, mode="delim")._jdf.queryExecution().executedPlan().toString()
    # explode/slice stage contains no Exchange between scan and first agg:
    # cheap structural proxy — total exchanges bounded (keeper agg, join
    # sides, reassembly agg, final left join)
    assert plan.count("Exchange") <= 6, plan
