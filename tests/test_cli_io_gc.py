"""CLI, text-file parity source, stage GC, stop_after staging, salting."""

import json
import os

import pandas as pd
import pytest

from wdedup_spark.operators.skew import salted_count, salted_repartition
from wdedup_spark.plans.pipeline import PipelineConfig, run_pipeline
from wdedup_spark.sources.io import find_first_unique_word_in_file, read_words_from_textfile

CFG = PipelineConfig()


def test_findfirst_textfile_parity(spark, tmp_path):
    """The reference's CLI semantic on its native input format
    (README.md:60-84): whitespace-separated words in a text file."""
    p = tmp_path / "words.txt"
    p.write_text("b a\tb\r\nc a  c x\n\nd d\n")
    assert find_first_unique_word_in_file(spark, str(p)) == "x"
    # all duplicates → "" (src/wfindfirst.cpp:44,59)
    p2 = tmp_path / "alldup.txt"
    p2.write_text("a b\nb a\n")
    assert find_first_unique_word_in_file(spark, str(p2)) == ""


def test_words_textfile_counts(spark, tmp_path):
    p = tmp_path / "w.txt"
    p.write_text("x y x\nz y\n")
    words = read_words_from_textfile(spark, str(p))
    counts = (
        words.groupBy("word").count().toPandas().set_index("word")["count"].to_dict()
    )
    assert counts == {"x": 2, "y": 2, "z": 1}


def test_first_occurrence_order_multifile_multisplit(spark, tmp_path):
    """Regression for the round-1 packed ord key: first-occurrence order
    must come from real file coordinates (path, split offset, row, pos),
    not from monotonically_increasing_id partition enumeration — verified
    against a pandas oracle over two files forced into many splits."""
    import numpy as np

    from wdedup_spark.operators.wdedup import singular_filter, word_profile

    rng = np.random.default_rng(3)
    vocab = [f"w{i:04d}" for i in range(4000)]
    d = tmp_path / "txt"
    d.mkdir()
    files = []
    for fi in range(2):
        lines = [
            " ".join(vocab[int(rng.integers(0, len(vocab)))] for _ in range(20))
            for _ in range(300)
        ]
        p = d / f"part-{fi}.txt"
        p.write_text("\n".join(lines) + "\n")
        files.append(p)

    old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_open = spark.conf.get("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    try:
        words = read_words_from_textfile(spark, str(d))
        assert words.rdd.getNumPartitions() > 4  # the fixture really splits
        got = [
            r["word"]
            for r in singular_filter(word_profile(words)).orderBy("first_ord").collect()
        ]
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
        spark.conf.set("spark.sql.files.openCostInBytes", old_open)

    seen: dict[str, int] = {}
    order: list[str] = []
    counts: dict[str, int] = {}
    for p in sorted(files, key=str):
        for line in p.read_text().splitlines():
            for w in line.split():
                counts[w] = counts.get(w, 0) + 1
                if w not in seen:
                    seen[w] = len(order)
                    order.append(w)
    want = [w for w in order if counts[w] == 1]
    assert len(want) > 50  # meaningful singleton population
    assert got == want


def test_stop_after_and_resume(spark, tiny_turns, tmp_path):
    """--stop-after commits a prefix of stages (the reference's
    --wprof-only debug mode); a later full run resumes from there."""
    wd = str(tmp_path / "staged")
    partial = run_pipeline(spark, tiny_turns, wd, CFG, stop_after="sign")
    assert set(partial) == {"ledger", "conv", "exact", "signed"}
    assert partial["ledger"].is_committed("sign")
    assert not partial["ledger"].is_committed("candidates")
    full = run_pipeline(spark, tiny_turns, wd, CFG)
    assert full["ledger"].is_committed("cluster")


def test_gc_reclaims_and_resume_skips(spark, tiny_turns, tmp_path):
    wd = str(tmp_path / "gc")
    out1 = run_pipeline(spark, tiny_turns, wd, CFG, gc=True)
    clusters1 = sorted(map(tuple, out1["clusters"].collect()))
    assert not os.path.exists(os.path.join(wd, "sign"))
    assert not os.path.exists(os.path.join(wd, "candidates"))
    # resume: gc'd stages are treated as committed, nothing recomputed
    out2 = run_pipeline(spark, tiny_turns, wd, CFG, gc=True)
    assert out2["signed"] is None and out2["candidates"] is None
    assert sorted(map(tuple, out2["clusters"].collect())) == clusters1


def test_cli_dedup_and_findfirst(spark, tiny, tmp_path, monkeypatch):
    """End-to-end through the argparse entry (shares the session fixture's
    JVM via getOrCreate)."""
    from wdedup_spark import cli, synth

    src = str(tmp_path / "turns")
    synth.to_spark(spark, tiny).write.parquet(src)
    wd = str(tmp_path / "cliwork")
    rc = cli.main(["dedup", "--input", src, "--workdir", wd, "--stop-after", "exact"])
    assert rc == 0
    assert os.path.exists(os.path.join(wd, "exact", "_SUCCESS"))
    words = tmp_path / "words.txt"
    words.write_text("a b a q b\n")
    assert cli.main(["findfirst", "--input", str(words)]) == 0


def test_salted_count_matches_plain(spark):
    pdf = pd.DataFrame(
        {"key": ["hot"] * 500 + [f"k{i}" for i in range(100)], "id": range(600)}
    )
    df = spark.createDataFrame(pdf)
    got = {r["key"]: r["n"] for r in salted_count(df, "key", "id", buckets=8).collect()}
    assert got["hot"] == 500
    assert got["k7"] == 1
    assert len(got) == 101
    # salted repartition spreads the hot key over multiple shuffle keys
    # (AQE may re-coalesce small partitions — that's desired; only genuinely
    # hot shards stay separate, so assert on the salt spread itself)
    salted = salted_repartition(df.filter("key = 'hot'"), "key", "id", buckets=8)
    assert salted.select("_salt").distinct().count() > 1
