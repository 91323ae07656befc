"""Shared fixtures: one session-scoped SparkSession, synthetic transcripts."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wdedup_spark.session import spark_session  # noqa: E402
from wdedup_spark import synth  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    # smaller parallelism for test latency; correctness is partition-count
    # independent (asserted by the determinism test)
    s = spark_session(app_name="wdedup-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny():
    """F1 tiny fixture: 200 base convs, planted dup classes."""
    return synth.generate_transcripts(n_base=200, seed=42)


@pytest.fixture(scope="session")
def tiny_turns(spark, tiny):
    df = synth.to_spark(spark, tiny)
    df = df.localCheckpoint(eager=True)  # materialize once for the whole session
    return df
