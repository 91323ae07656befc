"""Capture .explain("formatted") for the round-6-touched queries.

Usage: python tools/capture_plans_r06.py <repo_dir> <out_dir> <suffix> [sf_dir]

Run once from the round-start commit (suffix=before, via a worktree) and
once from the optimized tree (suffix=after).  Queries whose DataFrame
construction executes jobs (the *_clusters family) are built for real at
the given sf, so this takes a couple of minutes.
"""

from __future__ import annotations

import os
import sys

repo, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
sys.path.insert(0, repo)
os.chdir(repo)
os.makedirs(out_dir, exist_ok=True)

import __spark_entry__ as entry  # noqa: E402
from wdedup_spark.session import spark_session  # noqa: E402

QUERIES = [
    "word_profile", "exact_dup_clusters", "minhash_lsh_pairs",
    "dedup_clusters", "incremental_clusters", "simhash_pairs",
    "substring_pairs", "edit_dup_pairs", "cosine_highsim_pairs",
    "token_stats", "pii_redact", "chunk_docs", "repetition_filter",
    "decontaminated", "containment_pairs", "cluster_keepers",
    "soft_dedup_weights", "ann_topk", "knn_label_purity",
    "ivf_topk_exact", "media_dedup", "events_json_stats",
]

spark = spark_session(app_name=f"plans-{suffix}", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
qs = entry.queries()
for name in QUERIES:
    try:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    except Exception as e:  # capture the failure instead of dying
        plan = f"PLAN CAPTURE FAILED: {e!r}\n"
    with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
        f.write(plan)
    print(name, "ok", flush=True)
print("done")
