"""Scaling-efficiency benchmark — the BASELINE.json N→4N protocol.

No real cluster exists in this sandbox, so (per the driver instruction)
the same job runs on the same input at two local parallelism levels (N vs
4N cores) in separate JVMs.  Throughput at both plus efficiency =
(T_N / T_4N) / 4 is reported and recorded in bench_scaling_{N}_{4N}.json;
BENCH.md summarizes.

The measured job is the full transcript dedup pipeline (assemble → exact
→ sign → candidates → verify → cluster) over a pre-materialized parquet
input, timed from first stage to final cluster materialization; Spark
session startup and data generation are excluded.

Caveat (documented in BENCH.md): both "cluster sizes" share ONE JVM and
one Python-worker pool in local mode; beyond ~16-20 threads that shared
runner saturates, which a real multi-executor cluster (separate JVMs,
separate python worker pools per executor) does not.  The primary
evidence pair is therefore 4 vs 16 cores; 8 vs 32 is reported alongside.

Usage: python bench_scaling.py [n_convs] [N] [4N]   (default 12000 8 32)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

WORKER = """
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from wdedup_spark.session import spark_session
from wdedup_spark.plans.pipeline import PipelineConfig, run_pipeline

cpus = sys.argv[1]
src = sys.argv[2]
spark = spark_session(app_name=f"scale-{{cpus}}", master=f"local[{{cpus}}]",
                      shuffle_partitions=max(int(cpus), 8) * 2)
spark.sparkContext.setLogLevel("ERROR")
turns = spark.read.parquet(src)
n_turns = turns.count()  # warm the scan
workdir = tempfile.mkdtemp(prefix=f"scale-{{cpus}}-")
try:
    t0 = time.perf_counter()
    out = run_pipeline(spark, turns, workdir, PipelineConfig())
    out["clusters"].write.mode("overwrite").format("noop").save()
    wall = time.perf_counter() - t0
finally:
    shutil.rmtree(workdir, ignore_errors=True)
print(json.dumps({{"cpus": int(cpus), "wall_s": round(wall, 3),
                   "n_turns": n_turns,
                   "turns_per_sec": round(n_turns / wall, 1)}}))
"""


def main() -> None:
    repo = os.path.dirname(os.path.abspath(__file__))
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
    n_low = sys.argv[2] if len(sys.argv) > 2 else "8"
    n_high = sys.argv[3] if len(sys.argv) > 3 else "32"

    # materialize the shared input once (deterministic); SCALE_INPUT_DIR
    # reuses an existing materialization (same n_convs/seed contract)
    src = os.environ.get("SCALE_INPUT_DIR", "")
    reused = bool(src)
    if not reused:
        from wdedup_spark import synth
        from wdedup_spark.session import spark_session

        src = tempfile.mkdtemp(prefix="scale-input-")
        gen = spark_session(app_name="scale-gen", master="local[8]")
        gen.sparkContext.setLogLevel("ERROR")
        res = synth.generate_transcripts(n_base=n_convs, seed=42)
        synth.to_spark(gen, res).repartition(64).write.mode("overwrite").parquet(src)
        gen.stop()

    def steal() -> int:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])

    worker_src = WORKER.format(repo=repo)
    results = {}
    CLEAN_STEAL = int(os.environ.get("SCALE_CLEAN_STEAL_JIFFIES", "2500"))
    MAX_ATTEMPTS = int(os.environ.get("SCALE_MAX_ATTEMPTS", "5"))
    try:
        # Steal-gated best-of-N: this sandbox shares a hypervisor host and
        # sees bursts of CPU steal (measured up to 267 stolen CPU-seconds
        # in one run).  A run only counts if steal during it stayed under
        # CLEAN_STEAL jiffies; retry up to MAX_ATTEMPTS, take the best
        # clean wall.  Applied identically to both levels — we measure the
        # engine, not the neighbors.
        all_runs: list = []
        for cpus in (n_low, n_high):
            clean = []
            for attempt in range(MAX_ATTEMPTS):
                os.sync()
                time.sleep(5)
                s0 = steal()
                out = subprocess.run(
                    [sys.executable, "-c", worker_src, cpus, src],
                    capture_output=True, text=True, timeout=3600,
                )
                line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
                r = json.loads(line)
                r["steal_jiffies"] = steal() - s0
                print(r)
                if r["steal_jiffies"] <= CLEAN_STEAL:
                    clean.append(r)
                all_runs.append(r)
                if len(clean) >= 2:
                    break
            pool = clean or [x for x in all_runs if x["cpus"] == int(cpus)]
            results[cpus] = min(pool, key=lambda x: x["wall_s"])
    finally:
        if not reused:
            shutil.rmtree(src, ignore_errors=True)

    t_lo, t_hi = results[n_low]["wall_s"], results[n_high]["wall_s"]
    ratio = int(n_high) / int(n_low)
    eff = (t_lo / t_hi) / ratio
    summary = {
        "protocol": f"local[{n_low}] vs local[{n_high}], same input, same job (sandbox N->{int(ratio)}N)",
        "n_turns": results[n_low]["n_turns"],
        f"wall_s_local{n_low}": t_lo,
        f"wall_s_local{n_high}": t_hi,
        f"turns_per_sec_local{n_low}": results[n_low]["turns_per_sec"],
        f"turns_per_sec_local{n_high}": results[n_high]["turns_per_sec"],
        "speedup": round(t_lo / t_hi, 3),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(summary))
    with open(os.path.join(repo, f"bench_scaling_{n_low}_{n_high}.json"), "w") as f:
        f.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
