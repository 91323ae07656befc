"""Scaling-efficiency benchmark — the BASELINE.json N→4N protocol.

No real cluster exists in this sandbox, so (per the driver instruction)
the same job runs on the same input at two local parallelism levels —
local[8] (N) and local[32] (4N) — in separate JVMs.  Throughput at both
plus efficiency = (T_N / T_4N) / 4 is reported and recorded in BENCH.md /
BASELINE.md.

The measured job is the full transcript dedup pipeline (assemble → exact
→ sign → candidates → verify → cluster) over a pre-materialized parquet
input, timed from first stage to final cluster materialization; Spark
session startup and data generation are excluded.

Usage: python bench_scaling.py [n_convs] (default 12000)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

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

    # materialize the shared input once (deterministic)
    from wdedup_spark import synth
    from wdedup_spark.session import spark_session

    src = tempfile.mkdtemp(prefix="scale-input-")
    gen = spark_session(app_name="scale-gen", master="local[8]")
    gen.sparkContext.setLogLevel("ERROR")
    res = synth.generate_transcripts(n_base=n_convs, seed=42)
    synth.to_spark(gen, res).repartition(64).write.mode("overwrite").parquet(src)
    gen.stop()

    worker_src = WORKER.format(repo=repo)
    results = {}
    try:
        for cpus in ("8", "32"):
            out = subprocess.run(
                [sys.executable, "-c", worker_src, cpus, src],
                capture_output=True, text=True, timeout=3600,
            )
            line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
            results[cpus] = json.loads(line)
            print(results[cpus])
    finally:
        shutil.rmtree(src, ignore_errors=True)

    t8, t32 = results["8"]["wall_s"], results["32"]["wall_s"]
    eff = (t8 / t32) / 4.0
    summary = {
        "protocol": "local[8] vs local[32], same input, same job (sandbox N->4N)",
        "n_turns": results["8"]["n_turns"],
        "wall_s_local8": t8,
        "wall_s_local32": t32,
        "turns_per_sec_local8": results["8"]["turns_per_sec"],
        "turns_per_sec_local32": results["32"]["turns_per_sec"],
        "speedup": round(t8 / t32, 3),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(summary))
    with open(os.path.join(repo, "BENCH.md"), "w") as f:
        f.write(
            "# BENCH — scaling efficiency (sandbox N→4N protocol)\n\n"
            "Same job (full transcript dedup pipeline), same pre-materialized\n"
            "input, two parallelism levels in separate JVMs (per driver\n"
            "instruction: no real cluster in this sandbox).\n\n"
            f"| metric | local[8] (N) | local[32] (4N) |\n|---|---|---|\n"
            f"| wall s | {t8} | {t32} |\n"
            f"| turns/sec | {summary['turns_per_sec_local8']} | {summary['turns_per_sec_local32']} |\n\n"
            f"- input: {summary['n_turns']} turns (deterministic synth, seed 42)\n"
            f"- speedup N→4N: **{summary['speedup']}×**\n"
            f"- scaling efficiency (speedup/4): **{summary['scaling_efficiency']}**"
            f" (target ≥ 0.8)\n"
        )


if __name__ == "__main__":
    main()
