"""End-to-end daily-increment pipeline: run_incremental vs full recompute.

The contract under test (plans/pipeline.run_incremental): merging a new
batch against a committed base workdir produces the SAME cluster
assignment as running the full pipeline over the union of all turns —
including exact-dup routing to committed reps, near-dups of old docs,
new-new pairs, cluster-BRIDGING docs (one new doc merging two previously
separate clusters), and chained increments (day 2 on top of day 1's
workdir, referencing docs first seen in day 1).

Fixture geometry (token-level, 100-token base doc, edits >= 3 positions
apart so each edit kills its own 3 shingles): A1/B1 differ in 6 positions
→ shingle Jaccard ≈ 0.69 < 0.8 (separate day-0 clusters); X (day 1) is
the unedited base → ≈ 0.84 to each (bridges them).
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

from wdedup_spark.plans.pipeline import PipelineConfig, run_incremental, run_pipeline

SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("turn_idx", IntegerType()),
    StructField("role", StringType()),
    StructField("text", StringType()),
    StructField("tool", StringType()),
    StructField("ts", LongType()),
])

BASE = [f"w{i:03d}" for i in range(100)]


def _edit(tokens, positions, tag):
    out = list(tokens)
    for p in positions:
        out[p] = f"{tag}{p}"
    return out


def _turns(conv_id, tokens):
    rows = []
    for i in range(0, len(tokens), 10):
        rows.append(
            (conv_id, i // 10, "user" if (i // 10) % 2 == 0 else "assistant",
             " ".join(tokens[i : i + 10]), None, i // 10)
        )
    return rows


def _docs():
    a1 = _edit(BASE, [10, 30, 50], "xa")
    b1 = _edit(BASE, [20, 40, 60], "xb")
    c1 = [f"c{i:03d}" for i in range(90)]
    d1 = [f"d{i:03d}" for i in range(80)]
    f1 = [f"f{i:03d}" for i in range(70)]
    day0 = {
        "a1": a1,
        "a2": _edit(a1, [80], "ya"),          # near-dup of a1
        "b1": b1,
        "b2": _edit(b1, [85], "yb"),          # near-dup of b1
        "c1": c1,                              # singleton cluster
        "d1": d1,
        "d2": d1,                              # exact dup of d1
    }
    day1 = {
        "x0": list(BASE),                      # BRIDGES a-cluster and b-cluster
        "e1": _edit(c1, [15, 45], "ze"),      # near-dup of old c1
        "f1": f1,                              # novel (seen again in day 2)
        "d3": d1,                              # exact dup of committed d1
        "g1": [f"g{i:03d}" for i in range(80)],
        "g2": _edit([f"g{i:03d}" for i in range(80)], [12], "zg"),  # new-new pair
    }
    day2 = {
        "h1": _edit(f1, [22, 52], "zh"),      # near-dup of DAY-1 doc f1
        "i1": [f"i{i:03d}" for i in range(60)],  # novel
        "d4": d1,                              # exact dup again
    }
    return day0, day1, day2


def _df(spark, docs):
    rows = []
    for cid, toks in docs.items():
        rows.extend(_turns(cid, toks))
    return spark.createDataFrame(rows, SCHEMA)


def _collect(df):
    return sorted((r["conv_id"], r["cluster_id"]) for r in df.collect())


@pytest.fixture(scope="module")
def cfg():
    return PipelineConfig()


def test_incremental_matches_full_recompute_and_chains(spark, tmp_path_factory, cfg):
    day0, day1, day2 = _docs()
    base_dir = str(tmp_path_factory.mktemp("incr") / "day0")
    d1_dir = str(tmp_path_factory.mktemp("incr") / "day1")
    d2_dir = str(tmp_path_factory.mktemp("incr") / "day2")

    out0 = run_pipeline(spark, _df(spark, day0), base_dir, cfg)
    base_clusters = _collect(out0["clusters"])
    # sanity: a-cluster and b-cluster are SEPARATE on day 0
    by_id = dict(base_clusters)
    assert by_id["a1"] == by_id["a2"]
    assert by_id["b1"] == by_id["b2"]
    assert by_id["a1"] != by_id["b1"]
    assert by_id["d1"] == by_id["d2"]

    # -- day 1 increment vs full recompute over day0 ∪ day1 -------------------
    inc1 = run_incremental(spark, _df(spark, day1), base_dir, d1_dir, cfg)
    got1 = _collect(inc1["clusters"])
    full1_dir = str(tmp_path_factory.mktemp("incr") / "full01")
    want1 = _collect(
        run_pipeline(spark, _df(spark, {**day0, **day1}), full1_dir, cfg)["clusters"]
    )
    assert got1 == want1, "day-1 increment must equal the full recompute"
    by1 = dict(got1)
    # the bridge doc merged BOTH old clusters (the incremental_update
    # relabel path, including members never seen by the increment)
    assert len({by1["a1"], by1["a2"], by1["b1"], by1["b2"], by1["x0"]}) == 1
    assert by1["e1"] == by1["c1"]          # near-dup of old doc joins its cluster
    assert by1["d3"] == by1["d1"]          # exact dup routed to committed rep
    assert by1["g1"] == by1["g2"]          # new-new pair clustered
    assert by1["f1"] == "f1"               # novel doc stays a singleton

    # -- day 2 CHAINED on day 1's workdir vs full recompute over all ----------
    inc2 = run_incremental(spark, _df(spark, day2), d1_dir, d2_dir, cfg)
    got2 = _collect(inc2["clusters"])
    full2_dir = str(tmp_path_factory.mktemp("incr") / "full012")
    want2 = _collect(
        run_pipeline(
            spark, _df(spark, {**day0, **day1, **day2}), full2_dir, cfg
        )["clusters"]
    )
    assert got2 == want2, "chained day-2 increment must equal the full recompute"
    by2 = dict(got2)
    assert by2["h1"] == by2["f1"]          # near-dup of a DAY-1 doc (chain read)
    assert by2["d4"] == by2["d1"]
    assert by2["i1"] == "i1"

    # -- resume: rerunning the increment replays committed stages -------------
    re2 = run_incremental(spark, _df(spark, day2), d1_dir, d2_dir, cfg)
    assert _collect(re2["clusters"]) == got2

    # -- chain pointer is validated -------------------------------------------
    with pytest.raises(ValueError, match="already chained"):
        run_incremental(spark, _df(spark, day2), base_dir, d2_dir, cfg)


def test_incremental_requires_retained_sign(spark, tmp_path, cfg):
    day0, day1, _ = _docs()
    base_dir = str(tmp_path / "base")
    run_pipeline(spark, _df(spark, day0), base_dir, cfg, gc=True)  # gc reclaims sign
    with pytest.raises(ValueError, match="retained 'sign'"):
        run_incremental(spark, _df(spark, day1), base_dir, str(tmp_path / "d1"), cfg)
