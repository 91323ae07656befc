"""F3 wdedup-semantics parity: the reference's algorithm
(tokenize → profile → filter n==1 → min-by-offset) on a words fixture,
expected outputs hand-computed / pandas-verified.

Mirrors /root/reference's README.md:60-84 algorithm spec and the edge
cases its code handles explicitly: mixed whitespace (src/wprof.cpp:70-86),
very long words (src/wprof.cpp:111-143), all-duplicates → empty answer
(src/wfindfirst.cpp:44,59).
"""

import pandas as pd
import pytest

from wdedup_spark.operators import wdedup


def _df(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )


def test_find_first_unique_basic(spark):
    # words: b repeated, a repeated, x unique at doc0 pos3, y unique later
    df = _df(spark, ["b a b a x", "a b y"])
    out = wdedup.word_dedup_pipeline(df).collect()
    assert len(out) == 1
    assert out[0]["word"] == "x"


def test_find_first_all_duplicates_empty(spark):
    df = _df(spark, ["a b", "b a"])
    out = wdedup.word_dedup_pipeline(df).collect()
    assert out == []  # reference prints "" (src/wfindfirst.cpp:44,59)


def test_mixed_whitespace_tokenization(spark):
    df = _df(spark, ["  a\t\tb\r\nc  ", "a b"])
    prof = wdedup.word_profile(wdedup.tokenize(df)).collect()
    counts = {r["word"]: r["n"] for r in prof}
    assert counts == {"a": 2, "b": 2, "c": 1}


def test_long_word_path(spark):
    """Words > 4096 bytes (the reference's buffer-spill path,
    src/wprof.cpp:111-143) are ordinary tokens here."""
    big = "x" * 8192
    df = _df(spark, [f"{big} a", f"a {big} b"])
    prof = {r["word"]: r["n"] for r in wdedup.word_profile(wdedup.tokenize(df)).collect()}
    assert prof[big] == 2 and prof["b"] == 1


def test_first_occurrence_ordering(spark):
    """min(ord) picks the FIRST occurrence — the reference keeps the offset
    of first insert (src/wtreededup.cpp:79-95)."""
    df = _df(spark, ["u v", "w u"])
    prof = wdedup.word_profile(wdedup.tokenize(df))
    rows = {r["word"]: (r["n"], r["first_ord"]) for r in prof.collect()}
    assert rows["u"] == (2, 0 * wdedup.ORD_SHIFT + 0)
    assert rows["v"] == (1, 0 * wdedup.ORD_SHIFT + 1)
    assert rows["w"] == (1, 1 * wdedup.ORD_SHIFT + 0)
    out = wdedup.find_first_unique(prof).collect()
    assert out[0]["word"] == "v"


def test_zipf_corpus_vs_pandas_oracle(spark):
    """~20k-word Zipfian corpus: full profile equals a pandas groupby."""
    import numpy as np

    rng = np.random.default_rng(42)
    vocab = np.array([f"w{i}" for i in range(500)])
    docs = []
    for d in range(40):
        words = vocab[rng.zipf(1.5, size=500) % 500]
        docs.append(" ".join(words))
    df = _df(spark, docs)
    got = {
        r["word"]: (r["n"], r["first_ord"])
        for r in wdedup.word_profile(wdedup.tokenize(df)).collect()
    }
    # pandas oracle
    rows = []
    for did, t in enumerate(docs):
        for pos, w in enumerate(t.split(" ")):
            rows.append((w, did * wdedup.ORD_SHIFT + pos))
    pdf = pd.DataFrame(rows, columns=["word", "ord"])
    oracle = pdf.groupby("word")["ord"].agg(["count", "min"])
    assert len(got) == len(oracle)
    for w, (n, first) in got.items():
        assert oracle.loc[w, "count"] == n
        assert oracle.loc[w, "min"] == first
