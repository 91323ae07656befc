"""SparkSession factory for the dedup engine.

Replaces the reference's hand-rolled resource management — the mmap'd
working-memory arena (/root/reference/include/impl/wwmman.hpp:42-129) and
4 KB buffered sequential I/O (/root/reference/src/wiobase.cpp:39-107) —
with Tungsten memory management and columnar parquet scans.  The configs
below are the scale levers discussed in SURVEY.md §4:

* AQE on (coalesce + skew-join): subsumes the reference's DP merge
  planner (src/wmpdp.cpp:83-99) — runtime re-planning over shuffle stats.
* Arrow enabled: every custom kernel (shingle/minhash/simhash/verify) is
  a vectorized pandas UDF; row-at-a-time Python never touches the hot path.
* shuffle partitions sized to the local core count; on a real cluster this
  is ``executors * cores * 2-3`` and AQE coalesces downward.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def spark_session(
    app_name: str = "wdedup-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for the dedup workload.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    On a real cluster this function is a no-op passthrough: spark-submit
    supplies master/executors and these SQL confs remain correct.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.ansi.enabled", "false")  # wrap-around 64-bit hash arithmetic
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # join strategy (r6, guide §3.1/§9): allow shuffled-hash join when
        # its size conditions are met instead of always sort-merge — the
        # candidate-pair self-joins and verify joins are equi-joins over
        # modest per-partition build sides, and SMJ's two sorts dominated
        # them (measured 4.8 s → 2.2 s on the banded self-join shape).
        # AQE's local-map threshold gates the rewrite per-partition, so a
        # build side that would not fit stays sort-merge — bounded by
        # construction, not a local[32] constant.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            str(256 * 1024 * 1024),
        )
        # stage tables are compact (signatures, pairs) but CPU-heavy to
        # process: cap split size so re-read stages fan out across cores
        # rather than landing 3 tasks at the default 128m splits
        .config("spark.sql.files.maxPartitionBytes", "32m")
        # split-size floor (r6): maxSplitBytes = min(maxPartitionBytes,
        # max(openCost, bytes/parallelism)).  The engine's per-byte CPU is
        # dominated by hashing/signing kernels, so a 1m open-cost floor
        # left a 6 MB input on ~6 of 32 cores; 64k lets small inputs fan
        # out to every core while at production byte counts bytes/core >>
        # 64k and the behavior is identical (scale-adaptive by the
        # formula itself, not a local[32] constant)
        .config("spark.sql.files.openCostInBytes", "64k")
        # (r6: an AQE coalesce floor of 64k was tried for the same
        # post-shuffle reason and REVERTED — A/B at sf1.0 showed it
        # hurting the heavy pair-join queries (cosine 19.2 s vs 9.7 s
        # without it) and every other delta was inside this host's
        # window noise; the default stays)
        # local mode: driver JVM is the executor; a small heap at high
        # thread counts GC-thrashes (measured: 48g halves the sign stage
        # at 32 threads vs 16g)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        # iterative CC uses reliable checkpoint() when a checkpoint dir is
        # set; reclaim out-of-scope checkpoint files automatically
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
