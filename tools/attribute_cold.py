"""Attribute the pipeline cold-start delta (VERDICT r4 #5).

BENCH_r04 showed transcript_pipeline_cold 14.4 s vs 8.9 s warm at sf0.1.
Input synth is already outside the timed region (localCheckpoint before
t0), so the suspects are (a) first-compile of the pipeline's ~dozen
stage plans (Catalyst + Janino whole-stage codegen) and (b) first-use
init of the GROUPED-MAP Arrow machinery (applyInPandas/mapInPandas
writer per python worker) that bench's scalar-UDF warmup doesn't touch.

Protocol: two fresh sessions, same input (2000 convs, seed 42), same
_warm_session as bench.py.

* control:   warm → pipeline(cold) → pipeline(warm) × 2
* treatment: warm → pipeline on a 50-conv MICRO input (compiles every
             stage plan + spins the grouped-map Arrow path, ~data-free)
             → pipeline(cold) → pipeline(warm) × 2

If treatment's first full run lands at warm speed, the delta is one-time
plan-compilation + grouped-map init, not input materialization — i.e. a
per-SESSION cost, amortized to zero in a long-running daily pipeline.

Usage: python tools/attribute_cold.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
import bench
from wdedup_spark import synth
from wdedup_spark.plans.pipeline import PipelineConfig, run_pipeline
from wdedup_spark.session import spark_session

micro_first = sys.argv[1] == "1"
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = spark_session(app_name="attr-cold", master=f"local[{{cpus}}]")
spark.sparkContext.setLogLevel("ERROR")
bench._warm_session(spark, cpus)

def pipe(turns, label, timings):
    workdir = tempfile.mkdtemp(prefix="attr-")
    try:
        t0 = time.perf_counter()
        out = run_pipeline(spark, turns, workdir, PipelineConfig())
        out["clusters"].write.mode("overwrite").format("noop").save()
        timings.append((label, round(time.perf_counter() - t0, 3)))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

full = synth.to_spark(spark, synth.generate_transcripts(n_base=2000, seed=42))
full = full.repartition(int(cpus) * 2).localCheckpoint(eager=True)
full.count()
timings = []
if micro_first:
    micro = synth.to_spark(spark, synth.generate_transcripts(n_base=50, seed=7))
    micro = micro.localCheckpoint(eager=True)
    micro.count()
    pipe(micro, "micro", timings)
pipe(full, "first_full", timings)
pipe(full, "warm1", timings)
pipe(full, "warm2", timings)
print(json.dumps({{"micro_first": micro_first, "timings": timings}}))
"""


def _steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> None:
    """Steal-gated like bench_scaling.py: this box sees bursty hypervisor
    steal (first ungated attempt measured 76 s for a run that times 14 s
    in a clean window), so each arm retries until a window passes the
    gate; all attempts print, only the clean one is recorded."""
    src = WORKER.format(repo=REPO)
    gate = int(os.environ.get("ATTR_CLEAN_STEAL_JIFFIES", "1500"))
    out = {}
    for arm, flag in (("control", "0"), ("micro_first", "1")):
        res = None
        for attempt in range(int(os.environ.get("ATTR_MAX_ATTEMPTS", "6"))):
            time.sleep(5)
            s0 = _steal()
            # A worker can die mid-run (OOM / Spark error during a steal
            # burst — exactly when this loop is retrying) or hang past the
            # timeout; either counts as a failed ATTEMPT, not a crash of
            # the whole attribution: print the evidence, keep looping.
            try:
                r = subprocess.run(
                    [sys.executable, "-c", src, flag],
                    capture_output=True, text=True, timeout=1800,
                )
            except subprocess.TimeoutExpired:
                print(f"{arm} attempt {attempt}: worker timed out", flush=True)
                continue
            lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
            if r.returncode != 0 or not lines:
                print(
                    f"{arm} attempt {attempt}: worker failed rc={r.returncode}; "
                    f"stderr tail: {r.stderr.strip()[-500:]}",
                    flush=True,
                )
                continue
            res = json.loads(lines[-1])
            res["steal_jiffies"] = _steal() - s0
            print(res, flush=True)
            if res["steal_jiffies"] <= gate:
                out[arm] = res
                break
        else:
            if res is None:
                res = {"micro_first": flag == "1", "gate": "no_successful_run"}
            else:
                res["gate"] = "never_clean"
            out[arm] = res
    with open(os.path.join(REPO, "bench_cold_attribution.json"), "w") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
