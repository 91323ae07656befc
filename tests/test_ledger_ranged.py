"""Sub-stage (syncDistance-analog) recovery + storage-agnostic ledger.

Mirrors /root/reference/src/wprof.cpp:258-284 + src/wcli.cpp:109-112: the
reference bounds within-stage recompute to --sync-distance bytes; here a
crashed ranged stage resumes from its uncommitted key-ranges only.
"""

import posixpath

import pytest
from pyspark.sql import functions as F

from wdedup_spark.plans.pipeline import PipelineConfig, run_pipeline
from wdedup_spark.sources.ledger import StageLedger


def _transform_factory(calls, fail_on=None):
    def transform(part, r):
        calls.append(r)
        if fail_on is not None and r == fail_on:
            raise RuntimeError(f"injected crash in range {r}")
        return part.withColumn("out", F.col("val") + 1)

    return transform


def test_kill_mid_sign_resumes_from_missing_ranges(spark, tmp_path):
    wd = str(tmp_path / "ranged")
    led = StageLedger(wd, config_fence="f1", spark=spark)
    calls1: list[int] = []
    with pytest.raises(RuntimeError, match="injected crash"):
        led.run_ranged(
            spark, "sign", lambda: _input(spark), _transform_factory(calls1, fail_on=2),
            key_col="conv_id", n_ranges=8,
        )
    committed = {
        r for r in range(8)
        if led.fs.exists(posixpath.join(wd, "sign", f"rng={r}", "_SUCCESS"))
    }
    assert committed, "some ranges must have committed before the crash"
    assert 2 not in committed
    assert not led.is_committed("sign")

    # fresh ledger (new process) — resume must recompute ONLY missing ranges
    led2 = StageLedger(wd, config_fence="f1", spark=spark)
    calls2: list[int] = []
    result = led2.run_ranged(
        spark, "sign", lambda: _input(spark), _transform_factory(calls2),
        key_col="conv_id", n_ranges=8,
    )
    assert set(calls2) == set(range(8)) - committed
    assert led2.is_committed("sign")
    # output is complete and correct despite the partial-crash history
    rows = result.count()
    assert rows == 1000
    assert result.filter(F.col("out") != F.col("val") + 1).count() == 0
    # staging copy reclaimed after commit
    assert not led2.fs.exists(posixpath.join(wd, "sign.input"))

    # idempotent replay: a third run reads back, no transform calls
    led3 = StageLedger(wd, config_fence="f1", spark=spark)
    calls3: list[int] = []
    again = led3.run_ranged(
        spark, "sign", lambda: _input(spark), _transform_factory(calls3),
        key_col="conv_id", n_ranges=8,
    )
    assert calls3 == []
    assert again.count() == 1000


def test_fence_change_invalidates_partial_ranges(spark, tmp_path):
    wd = str(tmp_path / "fence")
    led = StageLedger(wd, config_fence="cfgA", spark=spark)
    calls: list[int] = []
    with pytest.raises(RuntimeError):
        led.run_ranged(
            spark, "sign", lambda: _input(spark), _transform_factory(calls, fail_on=1),
            key_col="conv_id", n_ranges=4,
        )
    # different config → stale buckets must NOT be resumed from
    led2 = StageLedger(wd, config_fence="cfgB", spark=spark)
    calls2: list[int] = []
    result = led2.run_ranged(
        spark, "sign", lambda: _input(spark), _transform_factory(calls2),
        key_col="conv_id", n_ranges=4,
    )
    assert set(calls2) == set(range(4))  # full recompute
    assert result.count() == 1000


def test_ledger_on_file_uri(spark, tmp_path):
    """Storage-agnostic check: the whole pipeline against a file:/ URI
    workdir — no os.* path assumptions anywhere in the ledger."""
    wd = "file://" + str(tmp_path / "uri-work")
    from wdedup_spark import synth

    turns = synth.to_spark(spark, synth.generate_transcripts(n_base=40, seed=5))
    cfg = PipelineConfig(sync_ranges=4)
    out = run_pipeline(spark, turns, wd, cfg)
    assert out["ledger"].is_committed("cluster")
    n = out["clusters"].count()
    assert n > 0
    # resume over the URI workdir too
    out2 = run_pipeline(spark, turns, wd, cfg)
    assert out2["clusters"].count() == n


def _input(spark):
    return spark.range(0, 1000).select(
        F.concat(F.lit("id-"), F.col("id")).alias("conv_id"),
        (F.col("id") * 3).alias("val"),
    )
