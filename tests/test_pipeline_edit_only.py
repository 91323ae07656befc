"""Regression: an edit-channel-only pair must survive to `verified` when
BOTH verify_edit and enable_substring are on (the default substring
setting).  Pre-fix, `_verify` rebound `out = jac.unionByName(sub_ok)`,
silently discarding every edit-verified pair whenever the substring
channel was enabled.

The fixture is a token-reorder near-dup: 14 scattered adjacent-token
swaps in a 200-token conversation.  Each swap costs 2 token edits but
kills ~4 shingles, so edit-similarity stays high (~0.86) while shingle
Jaccard drops to ~0.56 — below the Jaccard channel's est pre-filter band
(>= 0.65) and far below the 0.8 verify threshold, with no verbatim run
long enough for the substring channel.  Only the edit channel (with its
wider edit_margin band) can rescue it.
"""

import datetime

from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from wdedup_spark.plans.pipeline import PipelineConfig, run_pipeline

N_TOKENS = 200
SWAP_EVERY = 15  # >= 4 apart so changed shingle windows never overlap


def _turn_rows():
    base = [f"tok{i:03d}x" for i in range(N_TOKENS)]
    var = list(base)
    n_swaps = 0
    for i in range(2, N_TOKENS - 2, SWAP_EVERY):
        var[i], var[i + 1] = var[i + 1], var[i]
        n_swaps += 1
    assert n_swaps == 14  # 28 token edits -> edit_sim ~0.86, jaccard ~0.56
    ts = datetime.datetime(2026, 1, 1)
    rows = []
    for cid, toks in (("conv-base", base), ("conv-edit", var)):
        # two turns per conversation — assembly must not disturb the order
        mid = N_TOKENS // 2
        rows.append((cid, 0, "user", " ".join(toks[:mid]), "", ts))
        rows.append((cid, 1, "assistant", " ".join(toks[mid:]), "", ts))
    # a decoy singleton so the pipeline has a non-trivial corpus
    rows.append(("conv-other", 0, "user", " ".join(f"zz{i}q" for i in range(60)), "", ts))
    return rows


_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("text", StringType()),
        StructField("tool", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def test_edit_only_pair_survives_with_substring_enabled(spark, tmp_path):
    turns = spark.createDataFrame(_turn_rows(), _SCHEMA)

    cfg = PipelineConfig(verify_edit=True, edit_threshold=0.85, enable_substring=True)
    out = run_pipeline(spark, turns, str(tmp_path / "edit_on"), cfg)
    verified = {
        (r["conv_a"], r["conv_b"]): r["via"] for r in out["verified"].collect()
    }
    assert ("conv-base", "conv-edit") in verified or ("conv-edit", "conv-base") in verified
    via = verified.get(("conv-base", "conv-edit")) or verified.get(("conv-edit", "conv-base"))
    assert via == ["edit"]  # reachable through NO other channel

    # control: without the edit channel the pair must NOT verify (proves
    # the fixture really is edit-only, so the assertion above is not
    # trivially satisfied by jaccard or substring)
    base = run_pipeline(
        spark, turns, str(tmp_path / "edit_off"), PipelineConfig(enable_substring=True)
    )
    pairs_off = {
        (r["conv_a"], r["conv_b"]) for r in base["verified"].collect()
    }
    assert ("conv-base", "conv-edit") not in pairs_off
    assert ("conv-edit", "conv-base") not in pairs_off
