"""Iceberg source/sink dispatch — exercised without an Iceberg runtime.

The sandbox has no Iceberg jar, so the catalog path cannot run for real
(io.py gates on catalog config by design).  These tests pin the dispatch
contract so the branch is not dead code: table NAMES route to the Iceberg
reader/writer, paths route to parquet, and the availability probe answers
from session config.
"""

from unittest import mock

import pytest

from wdedup_spark.sources import io as io_mod


def test_iceberg_available_false_by_default(spark):
    assert io_mod.iceberg_available(spark) is False


def test_read_turns_path_uses_parquet(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.range(3).toDF("conv_id").write.parquet(p)
    assert io_mod.read_turns(spark, p).count() == 3


def test_read_turns_table_name_routes_to_iceberg(spark):
    with mock.patch.object(io_mod, "iceberg_available", return_value=True):
        reader = mock.MagicMock()
        with mock.patch.object(
            type(spark), "read", mock.PropertyMock(return_value=reader)
        ):
            io_mod.read_turns(spark, "local.db.turns")
        reader.format.assert_called_once_with("iceberg")
        reader.format.return_value.load.assert_called_once_with("local.db.turns")


def test_write_table_name_routes_to_writeTo(spark):
    df = mock.MagicMock()
    io_mod.write_table(df, "local.db.out")
    df.writeTo.assert_called_once_with("local.db.out")
    df.writeTo.return_value.createOrReplace.assert_called_once_with()
    df.write.mode.assert_not_called()


def test_write_table_path_routes_to_parquet(spark, tmp_path):
    df = mock.MagicMock()
    io_mod.write_table(df, str(tmp_path / "out"), mode="append")
    df.write.mode.assert_called_once_with("append")
    df.write.mode.return_value.parquet.assert_called_once_with(str(tmp_path / "out"))
    df.writeTo.assert_not_called()


def test_iceberg_available_with_catalog_conf(spark):
    # a configured catalog flips the probe (no jar needed to answer True)
    spark.conf.set("spark.sql.catalog.spark_catalog", "org.apache.iceberg.spark.SparkSessionCatalog")
    try:
        assert io_mod.iceberg_available(spark) is True
    finally:
        spark.conf.unset("spark.sql.catalog.spark_catalog")
