"""Streaming near-dup flags: new docs probed against a static LSH index.

Static side = the batch sign stage's output (as in production); stream
side = a file-source stream of new documents containing one near-dup of
an indexed doc, one exact re-delivery, and one novel doc.
"""

import pytest
from pyspark.sql import functions as F

from wdedup_spark.operators.minhash import add_signatures
from wdedup_spark.streaming.neardup_stream import index_for_stream, stream_neardup_flags

N_PERMS = 128
N_BANDS = 32


def _doc(tokens):
    return " ".join(tokens)


@pytest.fixture(scope="module")
def corpus_docs():
    base = [f"tok{i:03d}" for i in range(200)]
    other = [f"alt{i:03d}" for i in range(150)]
    return [
        ("idx-0", _doc(base)),
        ("idx-1", _doc(other)),
        ("idx-2", _doc([f"zed{i}" for i in range(80)])),
    ]


def test_stream_neardup_flags(spark, tmp_path, corpus_docs):
    static = spark.createDataFrame(corpus_docs, "conv_id string, doc string")
    signed = add_signatures(
        static, "doc", k=3, n_perms=N_PERMS,
        enable_simhash=False, enable_substring=False,
    ).select("conv_id", "sig")
    index = index_for_stream(signed, N_PERMS, N_BANDS).localCheckpoint(eager=True)

    # stream: near-dup of idx-0 (2% token edits), exact copy of idx-1, novel
    base = corpus_docs[0][1].split()
    near = list(base)
    for i in range(0, 200, 50):
        near[i] = f"edit{i}"
    new_docs = [
        ("new-near", _doc(near)),
        ("new-exact", corpus_docs[1][1]),
        ("new-novel", _doc([f"qqq{i}" for i in range(120)])),
    ]
    src = str(tmp_path / "neardup-src")
    spark.createDataFrame(new_docs, "conv_id string, doc string").coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)

    flags = stream_neardup_flags(stream, index, k=3, n_perms=N_PERMS, n_bands=N_BANDS)
    q = (
        flags.writeStream.format("memory")
        .queryName("neardup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql(
        "SELECT conv_id, index_id, max(est) AS est FROM neardup_sink GROUP BY conv_id, index_id"
    ).collect()
    got = {(r["conv_id"], r["index_id"]): r["est"] for r in out}

    assert ("new-exact", "idx-1") in got and got[("new-exact", "idx-1")] == 1.0
    assert ("new-near", "idx-0") in got and got[("new-near", "idx-0")] >= 0.65
    assert not any(cid == "new-novel" for cid, _ in got)
