"""Reader seam (bloomspark/sources/reader.py): parquet fallback today,
Iceberg the day the runtime jar is present (BASELINE.json input_hint
names an Iceberg table; this container has no jar and no network)."""

import pytest
from pyspark.sql import functions as F

from bloomspark import FilterConfig, build_bloom, with_membership
from bloomspark.sources.reader import iceberg_available, read_table

SF = "/root/testdata/sf0.001"


def test_read_table_parquet_path(spark):
    df = read_table(spark, f"{SF}/orders.parquet")
    assert df.count() > 0 and "o_orderkey" in df.columns


def test_read_table_iceberg_raises_clearly_without_runtime(spark):
    if iceberg_available(spark):  # pragma: no cover - jar-present envs
        pytest.skip("Iceberg runtime present; the guarded-raise path is moot")
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        read_table(spark, "db.orders", format="iceberg")
    # auto mode: no '/' means a table identifier -> same clear error
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        read_table(spark, "db.orders")


def test_iceberg_roundtrip_when_runtime_present(spark, tmp_path):
    """Round-4 item 8: the happy path, exercised the day the environment
    ships the Iceberg runtime (skips cleanly here).  Writes a real
    Iceberg table, reads it back through the seam, and runs build_bloom
    + probe over it — proving every build in this repo composes with a
    DSv2 scan unchanged."""
    if not iceberg_available(spark):
        pytest.skip("no Iceberg runtime jar on the Spark classpath")
    spark.conf.set(
        "spark.sql.catalog.bloomspark_test", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.bloomspark_test.type", "hadoop")
    spark.conf.set(
        "spark.sql.catalog.bloomspark_test.warehouse", str(tmp_path / "wh")
    )
    src = spark.read.parquet(f"{SF}/orders.parquet")
    src.writeTo("bloomspark_test.db.orders").using("iceberg").createOrReplace()
    df = read_table(spark, "bloomspark_test.db.orders", format="iceberg")
    assert df.count() == src.count()
    cfg = FilterConfig.complete(n=max(df.count(), 1), p=1e-9)
    bf = build_bloom(df, "o_orderkey", cfg)
    probed = with_membership(
        df.select("o_orderkey").limit(100), "o_orderkey", bf
    )
    assert probed.where(~F.col("member")).count() == 0
