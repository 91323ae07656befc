"""Containment channel in the batch pipeline: a conversation quoting the
MIDDLE of a longer one (not a prefix, under the substring span floor,
Jaccard ~0.2) clusters with its source only when the channel is on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wdedup_spark.plans.pipeline import PipelineConfig, run_pipeline, run_incremental


@pytest.fixture(scope="module")
def turns_with_quote(spark):
    from wdedup_spark import synth

    base = synth.to_spark(
        spark,
        synth.generate_transcripts(n_base=60, seed=13, min_tokens=20, max_tokens=40),
    )
    src = (
        base.groupBy("conv_id").count().filter(F.col("count") >= 8).limit(1)
    ).collect()[0]["conv_id"]
    # middle turns 3-4: NOT a byte prefix (prefix channel blind), 40-80
    # tokens (substring floor blind), shingle Jaccard ~0.2 (MinHash
    # verify rejects) — only containment (~0.95, two boundary shingles
    # differ through the turn-separator junction) can see it
    quote = (
        base.filter((F.col("conv_id") == src) & F.col("turn_idx").isin(3, 4))
        .withColumn("conv_id", F.lit("quote-conv"))
        .withColumn("turn_idx", F.col("turn_idx") - 3)
    )
    return base.unionByName(quote).localCheckpoint(eager=True), src


def _cluster_of(out, conv_id):
    return {r["conv_id"]: r["cluster_id"] for r in out["clusters"].collect()}[conv_id]


def test_containment_channel_clusters_quote(spark, turns_with_quote, tmp_path):
    turns, src = turns_with_quote
    cfg = PipelineConfig(enable_containment=True)
    out = run_pipeline(spark, turns, str(tmp_path / "on"), cfg)
    assert _cluster_of(out, "quote-conv") == _cluster_of(out, src)
    pairs = {(r.conv_a, r.conv_b) for r in out["containment_pairs"].collect()}
    assert any("quote-conv" in p for p in pairs)


def test_without_channel_quote_is_singleton(spark, turns_with_quote, tmp_path):
    turns, src = turns_with_quote
    out = run_pipeline(spark, turns, str(tmp_path / "off"), PipelineConfig())
    assert _cluster_of(out, "quote-conv") != _cluster_of(out, src)


def test_increment_refuses_chain_without_containment(spark, turns_with_quote, tmp_path):
    """A chain day that skipped the channel leaves permanent silent
    holes in old×old pairs — the increment must refuse, like the
    retained-sign check."""
    turns, _ = turns_with_quote
    base = str(tmp_path / "plainbase")
    run_pipeline(spark, turns, base, PipelineConfig())  # no containment
    with pytest.raises(ValueError, match="EVERY chain day"):
        run_incremental(
            spark, turns, base, str(tmp_path / "incr"),
            PipelineConfig(enable_containment=True),
        )


def test_increment_refuses_chain_with_higher_threshold(spark, turns_with_quote, tmp_path):
    """ADVICE r4 (medium): a chain day committed at a HIGHER containment
    threshold never emitted old×old pairs in [cfg.t, committed_t) — the
    increment would claim full-recompute parity over a hole.  The
    threshold is recorded in the ledger commit entry and validated for
    every chain day; a LOWER committed threshold is fine (superset)."""
    turns, _ = turns_with_quote
    base = str(tmp_path / "hi-t-base")
    run_pipeline(
        spark, turns, base, PipelineConfig(enable_containment=True,
                                           containment_threshold=0.95),
    )
    with pytest.raises(ValueError, match="committed containment at"):
        run_incremental(
            spark, turns, base, str(tmp_path / "hi-t-incr"),
            PipelineConfig(enable_containment=True, containment_threshold=0.9),
        )
    # lower-committed chain day: allowed (extra pairs, never a hole)
    lo = str(tmp_path / "lo-t-base")
    run_pipeline(
        spark, turns, lo, PipelineConfig(enable_containment=True,
                                         containment_threshold=0.85),
    )
    run_incremental(
        spark, turns.limit(0), lo, str(tmp_path / "lo-t-incr"),
        PipelineConfig(enable_containment=True, containment_threshold=0.9),
    )


def test_increment_refuses_unrecorded_threshold(spark, turns_with_quote, tmp_path):
    """A containment commit with no recorded threshold (pre-metadata
    ledger) cannot prove chain compatibility — refuse, don't guess."""
    import json
    import os

    turns, _ = turns_with_quote
    base = str(tmp_path / "legacy-base")
    run_pipeline(spark, turns, base, PipelineConfig(enable_containment=True))
    ldir = os.path.join(base, "_ledger")
    for name in os.listdir(ldir):
        if not name.endswith(".json") or name.startswith("."):
            continue  # Hadoop LocalFS writes .crc sidecars next to entries
        p = os.path.join(ldir, name)
        e = json.loads(open(p).read())
        if e.get("stage") == "containment" and "rows" in e:
            e.pop("containment_threshold")
            open(p, "w").write(json.dumps(e))
            os.remove(os.path.join(ldir, f".{name}.crc"))  # stale checksum
    with pytest.raises(ValueError, match="no recorded containment_threshold"):
        run_incremental(
            spark, turns, base, str(tmp_path / "legacy-incr"),
            PipelineConfig(enable_containment=True),
        )


def _turns_rows(conv_id, tokens):
    rows = []
    for i in range(0, len(tokens), 10):
        rows.append(
            (conv_id, i // 10, "user", " ".join(tokens[i:i + 10]), None, i // 10)
        )
    return rows


def test_incremental_containment_matches_full_recompute(spark, tmp_path):
    """Day-1 quotes of an OLD doc and of a NEW day-1 doc both cluster,
    and the increment equals the full recompute — the same-day token
    order needs no frozen-frequency state (lossless for any single
    consistent order)."""
    from pyspark.sql.types import (
        IntegerType, LongType, StringType, StructField, StructType,
    )

    schema = StructType([
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("text", StringType()),
        StructField("tool", StringType()),
        StructField("ts", LongType()),
    ])
    L = [f"w{i:03d}" for i in range(100)]
    G = [f"g{i:03d}" for i in range(80)]
    day0 = {"L": L, "m1": [f"m{i:03d}" for i in range(90)]}
    day1 = {
        "qL": L[30:],        # quote of OLD doc L: containment ~0.95, J ~0.67
        "G": G,
        "qG": G[:50],        # quote of NEW day-1 doc G
        "n1": [f"n{i:03d}" for i in range(70)],
    }
    def df(docs):
        rows = []
        for cid, toks in docs.items():
            rows.extend(_turns_rows(cid, toks))
        return spark.createDataFrame(rows, schema)

    cfg = PipelineConfig(enable_containment=True)
    base = str(tmp_path / "day0")
    run_pipeline(spark, df(day0), base, cfg)
    inc = run_incremental(spark, df(day1), base, str(tmp_path / "day1"), cfg)
    got = sorted((r["conv_id"], r["cluster_id"]) for r in inc["clusters"].collect())
    want = sorted(
        (r["conv_id"], r["cluster_id"])
        for r in run_pipeline(
            spark, df({**day0, **day1}), str(tmp_path / "full"), cfg
        )["clusters"].collect()
    )
    assert got == want
    by = dict(got)
    assert by["qL"] == by["L"]      # cross-day quote joins the OLD doc's cluster
    assert by["qG"] == by["G"]      # day-internal quote pair
    assert by["n1"] == "n1"         # novel doc stays a singleton
