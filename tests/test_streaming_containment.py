"""Streaming containment probe: new docs flagged against a static corpus
in BOTH subsumption directions, with batch-operator parity and
index/probe threshold coupling."""

import pytest

from wdedup_spark.operators.containment import containment_join
from wdedup_spark.operators.minhash import add_signatures
from wdedup_spark.streaming.containment_stream import (
    containment_index,
    stream_containment_flags,
)

T = 0.9


def _doc(tokens):
    return " ".join(tokens)


@pytest.fixture(scope="module")
def corpus(spark):
    long = [f"tok{i:03d}" for i in range(200)]
    short = [f"s{i:02d}" for i in range(40)]
    docs = [
        ("idx-long", _doc(long)),                       # superset source
        ("idx-short", _doc(short)),                     # will be quoted BY a stream doc
        ("idx-other", _doc([f"o{i}" for i in range(100)])),
    ]
    return docs, long, short


@pytest.fixture(scope="module")
def index(spark, corpus):
    docs, _, _ = corpus
    static = spark.createDataFrame(docs, "conv_id string, doc string")
    signed = add_signatures(
        static, "doc", k=3, n_perms=32,
        enable_simhash=False, enable_substring=False,
    ).select("conv_id", "shingles")
    return containment_index(signed, T)


def test_stream_containment_both_directions(spark, tmp_path, corpus, index):
    docs, long, short = corpus
    new_docs = [
        ("new-quote", _doc(long[50:110])),   # stream doc ⊂ idx-long
        ("new-super", _doc(short + [f"x{i}" for i in range(120)])),  # idx-short ⊂ stream doc
        ("new-novel", _doc([f"q{i}" for i in range(80)])),
    ]
    src = str(tmp_path / "cont-src")
    spark.createDataFrame(new_docs, "conv_id string, doc string").coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)

    flags = stream_containment_flags(stream, index, k=3)
    q = (
        flags.writeStream.format("memory")
        .queryName("cont_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240), "streaming query did not finish in time"
    got = {
        (r.conv_id, r.index_id)
        for r in spark.sql("SELECT DISTINCT conv_id, index_id FROM cont_sink").collect()
    }
    assert got == {("new-quote", "idx-long"), ("new-super", "idx-short")}

    # parity: the batch operator over the union finds the same cross pairs
    all_docs = spark.createDataFrame(docs + new_docs, "conv_id string, doc string")
    all_signed = add_signatures(
        all_docs, "doc", k=3, n_perms=32,
        enable_simhash=False, enable_substring=False,
    ).select("conv_id", "shingles")
    batch = {tuple(sorted(p)) for p in (
        (r.conv_a, r.conv_b) for r in containment_join(all_signed, T).collect()
    )}
    assert {tuple(sorted(p)) for p in got} <= batch


def test_probe_below_index_threshold_rejected(spark, index):
    """The index's prefix postings are sized for its build threshold;
    probing lower would be silently lossy in the indexed-smaller
    direction — must refuse."""
    stream = spark.readStream.format("rate").load().selectExpr(
        "cast(value as string) as conv_id", "'a b c' as doc"
    )
    with pytest.raises(ValueError, match="below the index build threshold"):
        stream_containment_flags(stream, index, threshold=0.5)
    with pytest.raises(ValueError, match="threshold"):
        stream_containment_flags(stream, index, threshold=1.5)
