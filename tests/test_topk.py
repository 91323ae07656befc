"""Skew-safe grouped top-k (operators/topk.py): exactness vs a
driver-side Python reference on randomized pre-aggregated inputs,
determinism across partitionings, the k-boundary tiebreak contract,
and a pin on the WindowGroupLimit plan shape the module's scale
argument relies on."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from wdedup_spark.operators.topk import grouped_topk


def _agg(spark, rows, par):
    # one row per (grp, cand): the pre-aggregated shape the operator requires
    return spark.createDataFrame(
        rows, "grp string, cand string, n long"
    ).repartition(par)


def _expected(rows, k):
    # independent reference: rank by (n desc, cand asc) within grp
    out = []
    for g in {r[0] for r in rows}:
        members = sorted(
            (r for r in rows if r[0] == g), key=lambda r: (-r[2], r[1])
        )
        out.extend((g, c, n, i + 1) for i, (g2, c, n) in
                   enumerate(members[:k]))
    return sorted(out)


def test_matches_reference_randomized(spark):
    rng = random.Random(11)
    rows = [
        (f"g{rng.randrange(6)}", f"c{i}", rng.randrange(100))
        for i in range(800)
    ]
    # force heavy duplicate counts so k-boundary ties are exercised
    rows += [(f"g{g}", f"t{i}", 50) for g in range(6) for i in range(20)]
    # dedup to the one-row-per-(grp, cand) contract
    rows = list({(g, c): (g, c, n) for g, c, n in rows}.values())
    for k in (1, 3, 10):
        for par in (1, 3, 17):
            df = _agg(spark, rows, par)
            got = sorted(map(tuple, grouped_topk(
                df, ["grp"], [F.desc("n"), F.asc("cand")], k
            ).collect()))
            assert got == _expected(rows, k), f"k={k} par={par}"


def test_hot_group_still_exact(spark):
    # one group holds 95% of all candidates (the skew case WindowGroupLimit
    # prunes map-side); answer must equal the reference
    rows = [("hot", f"c{i:05d}", i % 97) for i in range(2000)]
    rows += [("cold", f"c{i}", i) for i in range(40)]
    df = _agg(spark, rows, 13)
    got = sorted(map(tuple, grouped_topk(
        df, ["grp"], [F.desc("n"), F.asc("cand")], 10
    ).collect()))
    assert got == _expected(rows, 10)
    assert sum(1 for r in got if r[0] == "hot") == 10


def test_deterministic_across_partitionings(spark):
    rows = [(f"g{i % 4}", f"c{i}", (i * 7) % 31) for i in range(300)]
    base = None
    for par in (2, 5, 11):
        got = sorted(map(tuple, grouped_topk(
            _agg(spark, rows, par), ["grp"],
            [F.desc("n"), F.asc("cand")], 5
        ).collect()))
        base = got if base is None else base
        assert got == base


def test_plan_has_partial_window_group_limit(spark):
    """The module's whole scale argument is that Catalyst inserts a
    map-side WindowGroupLimit below the exchange (Spark >= 3.5 rank-
    limit pushdown).  Pin it: if a Spark upgrade or a conf change drops
    the rule, the hot-group shuffle bound silently disappears — fail
    here instead."""
    df = _agg(spark, [(f"g{i % 3}", f"c{i}", i) for i in range(50)], 4)
    plan = grouped_topk(
        df, ["grp"], [F.desc("n"), F.asc("cand")], 5
    )._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    # the map-side bound specifically: a PARTIAL WindowGroupLimit BELOW
    # (after, in toString order) the grp exchange — a Final-only
    # instance above the exchange would pass a bare substring check
    # while the hot-group shuffle bound it documents is gone
    exchange_at = next(
        i for i, ln in enumerate(lines)
        if "Exchange hashpartitioning(grp" in ln
    )
    assert any(
        "WindowGroupLimit" in ln and "Partial" in ln
        for ln in lines[exchange_at + 1:]
    ), plan


def test_rejects_nonpositive_k(spark):
    with pytest.raises(ValueError):
        grouped_topk(_agg(spark, [("g", "c", 1)], 1), ["grp"], ["n"], 0)


def test_rejects_rank_col_collision(spark):
    df = _agg(spark, [("g", "c", 1)], 1).withColumn("rnk", F.lit(9))
    with pytest.raises(ValueError, match="rank_col"):
        grouped_topk(df, ["grp"], ["n"], 3)
    # a different rank_col name on the same frame is fine
    assert grouped_topk(df, ["grp"], ["n"], 3, rank_col="r2").count() == 1
