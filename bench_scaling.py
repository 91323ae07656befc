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

Round 2 adds MULTI-JVM specs: an argument of the form ``WxC`` runs
``local-cluster[W,C,4096]`` — W separate executor JVMs with C cores each,
each with its own python worker pool.  ``1x8`` vs ``4x8`` is the honest
"N executors vs 4N executors" evidence pair (separate JVMs remove the
shared-runner saturation caveat below).

Round 2 also PINS each level to its physical core budget with
``taskset -c 0-(cores-1)`` (SCALE_PIN_CPUS=0 disables): an unpinned
"8-core" local run leaks JVM GC / shuffle / python-worker threads onto
every idle core of the 32-core host, so the low level was silently using
far more than N cores — measured consequence: unpinned 4x8 ran SLOWER
than 1x8 (efficiency 0.195, meaningless).  Pinned runs emulate real
cluster nodes where executor JVM + its python workers share exactly the
node's cores.

Usage: python bench_scaling.py [n_convs] [N] [4N]   (default 12000 8 32)
       python bench_scaling.py 50000 1x8 4x8        (multi-JVM N->4N)
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

spec = sys.argv[1]
src = sys.argv[2]
if "x" in spec:
    # multi-JVM: spec "WxC" -> local-cluster[W,C,mem]: W separate executor
    # JVMs with C cores each, each with its OWN python worker pool — the
    # honest N->4N *executors* analog (vs thread scaling in one JVM)
    w, c = spec.split("x")
    total = int(w) * int(c)
    mem_mb = int(os.environ.get("SCALE_EXECUTOR_MEM_MB", "4096"))
    master = f"local-cluster[{{w}},{{c}},{{mem_mb}}]"
    extra = {{"spark.executor.memory": f"{{mem_mb - 1024}}m",
              "spark.driver.memory": "12g"}}
else:
    total = int(spec)
    master = f"local[{{spec}}]"
    extra = {{}}
spark = spark_session(app_name=f"scale-{{spec}}", master=master,
                      shuffle_partitions=max(total, 8) * 2, extra_conf=extra)
cpus = total
if "x" in spec:
    # executor JVMs are separate processes: ship the package the way a real
    # cluster run does (north_rule: spark-submit --py-files wdedup_spark.zip)
    import shutil as _sh
    zip_base = tempfile.mkdtemp(prefix="pyfiles-") + "/wdedup_spark"
    _sh.make_archive(zip_base, "zip", {repo!r}, "wdedup_spark")
    spark.sparkContext.addPyFile(zip_base + ".zip")
turns = spark.read.parquet(src)
n_turns = turns.count()  # warm the scan
workdir = tempfile.mkdtemp(prefix=f"scale-{{cpus}}-")
try:
    t0 = time.perf_counter()
    out = run_pipeline(spark, turns, workdir, PipelineConfig())
    out["clusters"].write.mode("overwrite").format("noop").save()
    wall = time.perf_counter() - t0
    stages = {{s: m["wall_s"] for s, m in out["ledger"].metrics().items()}}
finally:
    shutil.rmtree(workdir, ignore_errors=True)
print(json.dumps({{"spec": spec, "cpus": int(cpus), "wall_s": round(wall, 3),
                   "n_turns": n_turns, "stages": stages,
                   "turns_per_sec": round(n_turns / wall, 1)}}))
"""


def _total_cores(spec: str) -> int:
    if "x" in spec:
        w, c = spec.split("x")
        return int(w) * int(c)
    return int(spec)


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
    MAX_ATTEMPTS = int(os.environ.get("SCALE_MAX_ATTEMPTS", "10"))
    CLEAN_K = int(os.environ.get("SCALE_CLEAN_K", "3"))
    try:
        # Steal-gated clean-window hunting (VERDICT r4 #2: n>=3, median):
        # this sandbox shares a hypervisor host and sees bursts of CPU
        # steal (measured up to 267 stolen CPU-seconds in one run).  A run
        # only counts if steal during it stayed under CLEAN_STEAL jiffies;
        # each level LOOPS until CLEAN_K clean windows land (or
        # MAX_ATTEMPTS), and the level's statistic is the MEDIAN clean
        # wall — one lucky window can no longer carry the headline.
        # Applied identically to both levels — we measure the engine, not
        # the neighbors.
        all_runs: list = []
        for spec in (n_low, n_high):
            clean = []
            for attempt in range(MAX_ATTEMPTS):
                os.sync()
                time.sleep(5)
                s0 = steal()
                cmd = [sys.executable, "-c", worker_src, spec, src]
                if os.environ.get("SCALE_PIN_CPUS", "1") != "0" and shutil.which("taskset"):
                    # Confine the WHOLE process tree (driver JVM, executor
                    # JVMs, python workers) to exactly the level's core
                    # budget.  Without this an "8-core" run leaks GC /
                    # shuffle / python-worker threads onto the other 24
                    # idle cores, inflating the low-parallelism baseline
                    # and making measured N->4N efficiency meaningless
                    # (observed: unpinned 4x8 SLOWER than 1x8).
                    cmd = ["taskset", "-c", f"0-{_total_cores(spec) - 1}"] + cmd
                out = subprocess.run(
                    cmd, capture_output=True, text=True, timeout=3600,
                )
                line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
                r = json.loads(line)
                r["steal_jiffies"] = steal() - s0
                print(r, flush=True)
                if r["steal_jiffies"] <= CLEAN_STEAL:
                    clean.append(r)
                all_runs.append(r)
                if len(clean) >= CLEAN_K:
                    break
            # If the gate NEVER passed, still emit a number (better than
            # nothing after an hour of runs) but it must not masquerade
            # as a clean median: gate_satisfied=False propagates to the
            # summary and the clean_walls list stays empty.
            pool = clean or [x for x in all_runs if x.get("spec") == spec]
            walls = sorted(x["wall_s"] for x in pool)
            med = walls[len(walls) // 2] if len(walls) % 2 else round(
                (walls[len(walls) // 2 - 1] + walls[len(walls) // 2]) / 2, 3
            )
            results[spec] = {
                "gate_satisfied": bool(clean),
                "clean_runs": clean,
                "runs": pool,
                "n_clean": len(clean),
                "median_wall_s": med,
                "best_wall_s": walls[0],
                "n_turns": pool[0]["n_turns"],
            }
    finally:
        if not reused:
            shutil.rmtree(src, ignore_errors=True)

    t_lo, t_hi = results[n_low]["median_wall_s"], results[n_high]["median_wall_s"]
    ratio = _total_cores(n_high) / _total_cores(n_low)

    def _label(spec: str) -> str:
        if "x" in spec:
            w, c = spec.split("x")
            return f"local-cluster[{w},{c}] ({w} executor JVMs x {c} cores)"
        return f"local[{spec}]"

    n_turns = results[n_low]["n_turns"]
    eff = (t_lo / t_hi) / ratio
    eff_best = (results[n_low]["best_wall_s"] / results[n_high]["best_wall_s"]) / ratio
    summary = {
        "protocol": f"{_label(n_low)} vs {_label(n_high)}, same input, same job "
                    f"(sandbox N->{ratio:g}N; multi-JVM when specs are WxC); "
                    f"median of clean steal-gated windows per level "
                    f"(target {CLEAN_K} clean windows, gate {CLEAN_STEAL} jiffies)",
        "n_turns": n_turns,
        f"wall_s_{n_low}": t_lo,
        f"wall_s_{n_high}": t_hi,
        f"turns_per_sec_{n_low}": round(n_turns / t_lo, 1),
        f"turns_per_sec_{n_high}": round(n_turns / t_hi, 1),
        f"n_clean_{n_low}": results[n_low]["n_clean"],
        f"n_clean_{n_high}": results[n_high]["n_clean"],
        f"clean_walls_{n_low}": [r["wall_s"] for r in results[n_low]["clean_runs"]],
        f"clean_walls_{n_high}": [r["wall_s"] for r in results[n_high]["clean_runs"]],
        "speedup": round(t_lo / t_hi, 3),
        "scaling_efficiency": round(eff, 3),
        "scaling_efficiency_best_window": round(eff_best, 3),
    }
    if not (results[n_low]["gate_satisfied"] and results[n_high]["gate_satisfied"]):
        # every window at >=1 level exceeded the steal gate: the medians
        # above are computed from contaminated runs and must say so
        summary["steal_gate_satisfied"] = False
        summary["warning"] = (
            "no window passed the steal gate at: "
            + ", ".join(s for s in (n_low, n_high) if not results[s]["gate_satisfied"])
            + " — medians use DIRTY runs; do not quote as clean-window numbers"
        )
    print(json.dumps(summary))
    with open(os.path.join(repo, f"bench_scaling_{n_low}_{n_high}.json"), "w") as f:
        f.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
