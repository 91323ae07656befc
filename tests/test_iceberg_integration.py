"""LIVE Iceberg integration — runs only when an Iceberg Spark runtime jar
is on the session classpath, auto-SKIPS otherwise (this sandbox ships no
jar; the recipe to add one is in README.md "Running against Iceberg").

What it proves when the jar is present: a hadoop-type catalog configured
at runtime, `write_table` targeting a table identifier (writeTo /
createOrReplace → an Iceberg snapshot commit), `read_turns` loading the
same identifier through the iceberg source, and snapshot metadata being
queryable — i.e. the north_rule's "Iceberg transcript tables" path works
end-to-end, not just through the contract mocks in
test_iceberg_dispatch.py.
"""

import pytest
from pyspark.sql import functions as F

from wdedup_spark.sources.io import read_turns, write_table

CATALOG = "it_cat"


def _iceberg_jar_present(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


@pytest.fixture(scope="module")
def iceberg_spark(spark, tmp_path_factory):
    if not _iceberg_jar_present(spark):
        pytest.skip(
            "iceberg-spark-runtime jar not on classpath — see README.md "
            "'Running against Iceberg' for the --packages recipe"
        )
    wh = str(tmp_path_factory.mktemp("iceberg-wh"))
    # catalog confs are read lazily at first catalog lookup, so a
    # runtime-configured hadoop catalog works on the shared session
    spark.conf.set(f"spark.sql.catalog.{CATALOG}", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set(f"spark.sql.catalog.{CATALOG}.type", "hadoop")
    spark.conf.set(f"spark.sql.catalog.{CATALOG}.warehouse", wh)
    spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {CATALOG}.db")
    return spark


def test_write_read_roundtrip(iceberg_spark):
    spark = iceberg_spark
    df = spark.range(100).select(
        F.concat(F.lit("conv-"), F.col("id")).alias("conv_id"),
        (F.col("id") % 7).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(F.lit("text "), F.col("id")).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.current_timestamp().alias("ts"),
    )
    tbl = f"{CATALOG}.db.turns"
    write_table(df, tbl)
    back = read_turns(spark, tbl)
    assert back.count() == 100
    assert set(back.columns) == set(df.columns)
    # snapshot commit is queryable — the ledger's atomic-commit analog
    snaps = spark.sql(f"SELECT * FROM {tbl}.snapshots")
    assert snaps.count() >= 1


def test_overwrite_is_new_snapshot(iceberg_spark):
    spark = iceberg_spark
    tbl = f"{CATALOG}.db.turns2"
    write_table(spark.range(10).selectExpr("id AS x"), tbl)
    write_table(spark.range(20).selectExpr("id AS x"), tbl)
    assert read_turns(spark, tbl).count() == 20
    assert spark.sql(f"SELECT * FROM {tbl}.snapshots").count() >= 2
