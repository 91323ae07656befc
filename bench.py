"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop-format write (full physical
execution, no driver collect bottleneck).  Also runs the transcript dedup
pipeline on deterministic synthetic data and reports turns/sec (the
BASELINE.json throughput metric).

Env knobs:
  SPARK_GRAFT_SF_DIR   data dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] parallelism (default 32)
  BENCH_PIPELINE_CONVS synthetic conversations for the pipeline bench
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "word_profile",
    "exact_dup_clusters",
    "minhash_lsh_pairs",
    "dedup_clusters",
    "simhash_pairs",
    "substring_pairs",
    "edit_dup_pairs",
    "cosine_highsim_pairs",
    "token_stats",
    "media_dedup",
    "embedding_dup_pairs",
    "ann_topk",
    "events_hourly",
    "events_rollup",
    "events_sessions",
    "revenue_by_nation",
    "pricing_summary",
]


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_convs = int(os.environ.get("BENCH_PIPELINE_CONVS", "2000"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    import __spark_entry__ as entrymod
    from wdedup_spark import synth
    from wdedup_spark.plans.pipeline import PipelineConfig, run_pipeline
    from wdedup_spark.session import spark_session

    spark = spark_session(app_name="wdedup-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # warm up the JVM (codegen) and the Python worker pool once so the
    # first measured query isn't charged session spin-up
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(x):
        return x

    spark.range(1000, numPartitions=int(cpus)).select(_warm("id")).write.format(
        "noop"
    ).mode("overwrite").save()

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()  # include plan construction: some operators
        force(qs[name](spark, sf_dir))  # (CC) run jobs during construction
        timings[name] = round(time.perf_counter() - t0, 3)

    # transcript dedup pipeline (turns/sec — the BASELINE metric)
    res = synth.generate_transcripts(n_base=n_convs, seed=42)
    turns = synth.to_spark(spark, res).repartition(int(cpus) * 2)
    turns = turns.localCheckpoint(eager=True)  # materialize input outside timing
    n_turns = turns.count()
    workdir = tempfile.mkdtemp(prefix="bench-pipe-")
    try:
        t0 = time.perf_counter()
        out = run_pipeline(spark, turns, workdir, PipelineConfig())
        force(out["clusters"])
        pipe_s = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    timings["transcript_pipeline"] = pipe_s

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_plus_pipeline_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "pipeline_turns": n_turns,
                "pipeline_turns_per_sec": round(n_turns / pipe_s, 1),
                "cpus": int(cpus),
            }
        )
    )


if __name__ == "__main__":
    main()
