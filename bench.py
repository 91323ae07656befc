"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop-format write (full physical
execution, no driver collect bottleneck).  Also runs the transcript dedup
pipeline on deterministic synthetic data and reports turns/sec (the
BASELINE.json throughput metric).

Measurement hygiene (VERDICT r3 #6/#7): a heavy query poisons every
in-session measurement after it — executor heaps stay inflated, the
Python worker pool carries residual memory, GC pressure bleeds into the
next timing (measured: transcript_pipeline read 13.3 s right after the
12.9 s cosine query vs ~10 s clean).  Two defenses:

* the transcript pipeline — the headline BASELINE metric — runs FIRST,
  before any heavy query can poison it, and runs TWICE: the first run
  carries the session's one-time costs (whole-stage codegen, Arrow
  writer init across the python worker pool — measured ~7 s at sf0.1)
  and is recorded as ``transcript_pipeline_cold`` (excluded from the
  headline total so cross-round totals stay comparable); the second is
  steady-state and is the ``transcript_pipeline`` /
  ``pipeline_turns_per_sec`` metric, matching how a long-running daily
  pipeline actually executes.  The recorded JSON carries the execution
  ``order`` so cross-round per-query comparisons know exactly what ran
  before what;
* ``BENCH_ISOLATE=1`` runs every query in its own subprocess with a
  fresh Spark session — slower wall (one ~15 s session spin-up per
  query) but each timing is unconditionally clean.  The JSON records
  which mode produced it (``isolation`` field).

Env knobs:
  SPARK_GRAFT_SF_DIR   data dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] parallelism (default 32)
  BENCH_PIPELINE_CONVS synthetic conversations for the pipeline bench
  BENCH_ISOLATE        1 = fresh subprocess session per query
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "word_profile",
    "exact_dup_clusters",
    "minhash_lsh_pairs",
    "dedup_clusters",
    "incremental_clusters",
    "simhash_pairs",
    "substring_pairs",
    "edit_dup_pairs",
    "cosine_highsim_pairs",
    "token_stats",
    "top_terms_by_source",
    "pii_redact",
    "pack_plan",
    "mixture_sample",
    "quota_sample",
    "chunk_docs",
    "span_dup_stats",
    "span_dedup_docs",
    "prefix_subsumed",
    "incremental_prefix",
    "containment_pairs",
    "decontaminated",
    "repetition_filter",
    "cluster_keepers",
    "soft_dedup_weights",
    "semantic_dedup",
    "media_dedup",
    "embedding_dup_pairs",
    "ann_topk",
    "ivf_topk_exact",
    "knn_label_purity",
    "events_json_stats",
    "events_hourly",
    "events_rollup",
    "events_sessions",
    "revenue_by_nation",
    "pricing_summary",
]

_ISOLATED_WORKER = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
import __spark_entry__ as entrymod
import bench
from wdedup_spark.session import spark_session
name, sf_dir, cpus = sys.argv[1], sys.argv[2], sys.argv[3]
spark = spark_session(app_name=f"bench-{{name}}", master=f"local[{{cpus}}]")
spark.sparkContext.setLogLevel("ERROR")
bench._warm_session(spark, cpus)  # ONE warm-up definition for both modes
t0 = time.perf_counter()
entrymod.queries()[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
print(json.dumps({{"name": name, "sec": round(time.perf_counter() - t0, 3)}}))
"""


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _warm_session(spark, cpus: str) -> None:
    """Warm the JVM (codegen) and Python worker pool once so the first
    measured query isn't charged session spin-up."""
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(x):
        return x

    spark.range(1000, numPartitions=int(cpus)).select(_warm("id")).write.format(
        "noop"
    ).mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_convs = int(os.environ.get("BENCH_PIPELINE_CONVS", "2000"))
    isolate = os.environ.get("BENCH_ISOLATE", "0") == "1"
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    repo = os.path.dirname(os.path.abspath(__file__))

    import __spark_entry__ as entrymod
    from wdedup_spark import synth
    from wdedup_spark.plans.pipeline import PipelineConfig, run_pipeline
    from wdedup_spark.session import spark_session

    spark = spark_session(app_name="wdedup-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    _warm_session(spark, cpus)

    timings: dict[str, float] = {}
    order: list[str] = []

    # transcript dedup pipeline FIRST (turns/sec — the BASELINE metric):
    # nothing heavy has run yet, so this is the clean-session number
    res = synth.generate_transcripts(n_base=n_convs, seed=42)
    turns = synth.to_spark(spark, res).repartition(int(cpus) * 2)
    turns = turns.localCheckpoint(eager=True)  # materialize input outside timing
    n_turns = turns.count()
    # steady state is best-of-BENCH_REPEAT (same contention rationale and
    # same knob as the query loop below); the cold first run is recorded
    # separately
    repeat = max(1, int(os.environ.get("BENCH_REPEAT", "2")))
    for label in ["transcript_pipeline_cold"] + ["transcript_pipeline"] * repeat:
        workdir = tempfile.mkdtemp(prefix="bench-pipe-")
        try:
            t0 = time.perf_counter()
            out = run_pipeline(spark, turns, workdir, PipelineConfig())
            force(out["clusters"])
            pipe_s = round(time.perf_counter() - t0, 3)
        finally:
            shutil.rmtree(workdir, ignore_errors=True)
        timings[label] = min(pipe_s, timings.get(label, pipe_s))
        if label not in order:
            order.append(label)
    pipe_s = timings["transcript_pipeline"]

    qs = entrymod.queries()
    errors: dict[str, str] = {}
    for name in HEADLINE:
        if isolate:
            # a failed/hung query must not take the whole bench down:
            # record the error, surface the worker's stderr, move on
            try:
                out_p = subprocess.run(
                    [sys.executable, "-c", _ISOLATED_WORKER.format(repo=repo),
                     name, sf_dir, cpus],
                    capture_output=True, text=True, timeout=1800,
                )
                lines = [l for l in out_p.stdout.strip().splitlines() if l.startswith("{")]
                if out_p.returncode != 0 or not lines:
                    print(f"[bench] {name} failed rc={out_p.returncode}:\n"
                          f"{out_p.stderr[-2000:]}", file=sys.stderr)
                    errors[name] = f"rc={out_p.returncode}"
                    continue
                timings[name] = json.loads(lines[-1])["sec"]
            except subprocess.TimeoutExpired:
                print(f"[bench] {name} timed out (1800 s)", file=sys.stderr)
                errors[name] = "timeout"
                continue
        else:
            # best-of-N (default 2): this sandbox's multi-threaded walls
            # swing up to 4x run-to-run under invisible hypervisor
            # contention (measured: identical pipeline runs 13.7/35/52 s
            # with a clean steal counter — BENCH.md round 4); min of two
            # runs discards the unluckier draw at ~2x bench wall
            best = None
            for _ in range(repeat):
                t0 = time.perf_counter()  # include plan construction: some
                force(qs[name](spark, sf_dir))  # operators (CC) run jobs during it
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            timings[name] = round(best, 3)
        order.append(name)

    # the cold pipeline run is recorded for transparency but EXCLUDED from
    # the headline total: earlier rounds timed the pipeline once, and a
    # total that double-counts it would read as a cross-round regression
    total = round(sum(v for k, v in timings.items()
                      if k != "transcript_pipeline_cold"), 3)
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
                "order": order,
                "isolation": "per-query-subprocess" if isolate else "shared-session-in-order",
                "repeat": 1 if isolate else repeat,
                **({"errors": errors} if errors else {}),
            }
        )
    )


if __name__ == "__main__":
    main()
