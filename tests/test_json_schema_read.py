"""Semi-structured schema-on-read semantics (q_events_json_stats):
the docstring's "malformed/missing key -> NULL, never a job failure"
claim exercised on adversarial props values the generator never emits,
AND cross-engine parity of the extraction expression — Spark's strict
from_json('k BIGINT') vs the oracle's json_type-guarded CAST (review
r5: the bare CAST coerced quoted numbers Spark rejects and hard-errored
on malformed JSON Spark nulls)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

# one of each shape: plain int, negative, quoted number (Spark strict ->
# NULL), float (strict -> NULL), bool, missing key, empty object, null
# literal, malformed JSON, empty string, NULL column
CASES = [
    '{"k": 87}',
    '{"k": -3}',
    '{"k": "87"}',
    '{"k": 1.5}',
    '{"k": true}',
    '{"j": 1}',
    "{}",
    '{"k": null}',
    '{"k": 1',
    "",
    None,
]
# Spark from_json('k BIGINT') results, hand-derived: only real JSON
# integers survive
EXPECTED = [87, -3, None, None, None, None, None, None, None, None, None]

ORACLE_EXPR = """
    CASE WHEN json_valid(props)
              AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
         THEN CAST(props->>'k' AS BIGINT) END
"""


def test_spark_strict_null_tolerance(spark):
    df = spark.createDataFrame([(i, c) for i, c in enumerate(CASES)],
                               "i long, props string")
    got = {
        r.i: r.k
        for r in df.select(
            "i", F.from_json(F.col("props"), "k BIGINT")["k"].alias("k")
        ).collect()
    }
    assert [got[i] for i in range(len(CASES))] == EXPECTED
    # and the aggregate the query builds on it cannot fail on this input
    n = df.select(F.from_json(F.col("props"), "k BIGINT")["k"].alias("k")) \
          .agg(F.count("k"), F.sum("k")).collect()[0]
    assert (n[0], n[1]) == (2, 84)


def test_oracle_expression_parity_on_adversarial_rows():
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, props VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    list(enumerate(CASES)))
    rows = con.execute(
        f"SELECT i, {ORACLE_EXPR} AS k FROM t ORDER BY i"
    ).fetchall()
    assert [k for _, k in rows] == EXPECTED


def test_oracle_expression_matches_shipped_sql():
    # the parity above is only meaningful if this file tests the SAME
    # expression the shipped oracle uses — pin the substring
    import __spark_entry__ as entrymod

    shipped = entrymod.oracle_sql()["events_json_stats"]
    assert "json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')" in shipped
    assert "json_valid(props)" in shipped
