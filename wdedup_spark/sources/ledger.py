"""Stage ledger — the WAL of the graft (checkpointed multi-stage resume).

The reference recovers via an append-only typed log with group commit
(/root/reference/src/wiobase.cpp:131-151) replayed on restart
(src/wprof.cpp:179-216, src/wmerge.cpp:62-104).  Here each stage's output
is a parquet (or Iceberg, when a catalog is configured) table written
atomically — Spark's ``_SUCCESS`` marker / Iceberg snapshot is the group
commit — plus one ledger row of metrics and per-file lineage (the analog
of the profile size the reference logs for its planner,
src/wpflsimple.cpp:71-80).

Resume = skip stages whose commit marker exists and read their output —
the replay semantics of src/wprof.cpp:183-186 ("'e' record → return with
zero I/O") at stage granularity.  A version fence (like main.cpp:196-206)
invalidates ledgers written by an incompatible pipeline config.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

LEDGER_FILE = "_ledger.jsonl"


@dataclass
class StageLedger:
    workdir: str
    config_fence: str = ""  # hash of pipeline config; mismatch → cold start
    entries: list[dict] = field(default_factory=list)

    def __post_init__(self) -> None:
        os.makedirs(self.workdir, exist_ok=True)
        path = self._ledger_path()
        if os.path.exists(path):
            with open(path) as f:
                self.entries = [json.loads(line) for line in f if line.strip()]
            fences = {e.get("config_fence", "") for e in self.entries}
            if self.config_fence and fences and fences != {self.config_fence}:
                # config changed → prior outputs are invalid (version fence,
                # main.cpp:196-206 "log version mismatch → corrupt")
                self.entries = []
                os.remove(path)

    def _ledger_path(self) -> str:
        return os.path.join(self.workdir, LEDGER_FILE)

    def _out_path(self, stage: str) -> str:
        return os.path.join(self.workdir, stage)

    def is_committed(self, stage: str) -> bool:
        if self.is_gcd(stage):
            return True  # committed, output reclaimed (reference GC,
            # src/wmerge.cpp:141-144: merged inputs deleted post-commit)
        ok_marker = os.path.exists(os.path.join(self._out_path(stage), "_SUCCESS"))
        in_ledger = any(e["stage"] == stage and "rows" in e for e in self.entries)
        return ok_marker and in_ledger

    def is_gcd(self, stage: str) -> bool:
        return any(e["stage"] == stage and e.get("event") == "gc" for e in self.entries)

    def gc(self, stage: str) -> None:
        """O14: reclaim a committed stage's output once every downstream
        consumer has committed (caller's responsibility — mirrors the
        reference deleting merge inputs only after the merge record is
        synced, src/wmerge.cpp:136-144)."""
        import shutil

        if not self.is_committed(stage) or self.is_gcd(stage):
            return
        shutil.rmtree(self._out_path(stage), ignore_errors=True)
        entry = {"stage": stage, "event": "gc", "config_fence": self.config_fence, "ts": time.time()}
        self.entries.append(entry)
        with open(self._ledger_path(), "a") as f:
            f.write(json.dumps(entry) + "\n")

    def output(self, spark: SparkSession, stage: str) -> DataFrame:
        return spark.read.parquet(self._out_path(stage))

    def run(
        self,
        spark: SparkSession,
        stage: str,
        fn: Callable[[], DataFrame],
        repartition: int | None = None,
    ) -> DataFrame:
        """Run ``fn`` and commit its output under ``stage`` — or, if already
        committed, read it back untouched (idempotent replay).  A committed
        stage whose output was GC'd returns None — valid only when every
        consumer of the stage is itself committed (the pipeline's GC policy
        guarantees this)."""
        if self.is_committed(stage):
            return None if self.is_gcd(stage) else self.output(spark, stage)
        t0 = time.time()
        df = fn()
        if repartition:
            df = df.repartition(repartition)
        out = self._out_path(stage)
        df.write.mode("overwrite").parquet(out)
        wall = time.time() - t0
        result = spark.read.parquet(out)
        # row count + per-file lineage from parquet footers (no Spark job)
        import pyarrow.parquet as pq

        rows = 0
        files = []
        for fn_ in sorted(os.listdir(out)):
            if fn_.endswith(".parquet"):
                p = os.path.join(out, fn_)
                rows += pq.ParquetFile(p).metadata.num_rows
                files.append({"file": fn_, "bytes": os.path.getsize(p)})
        entry = {
            "stage": stage,
            "rows": rows,
            "wall_s": round(wall, 3),
            "n_files": len(files),
            "bytes": sum(f["bytes"] for f in files),
            "files": files,
            "config_fence": self.config_fence,
            "ts": time.time(),
        }
        self.entries.append(entry)
        with open(self._ledger_path(), "a") as f:
            f.write(json.dumps(entry) + "\n")
        return result

    def metrics(self) -> dict[str, dict]:
        return {
            e["stage"]: {k: e[k] for k in ("rows", "wall_s", "bytes")}
            for e in self.entries
            if "rows" in e
        }
