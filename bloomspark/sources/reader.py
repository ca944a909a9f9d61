"""Table reader seam: Iceberg when available, parquet otherwise.

The north rule names an Iceberg source-code table.  This container
ships no Iceberg runtime jar (no network, nothing to install), so the
reader probes for the catalog support and falls back to plain parquet —
the SEAM is what the library owns: every build in this repo takes a
DataFrame, so swapping the storage format touches exactly this function.
With Iceberg present, Spark's DSv2 scan gives the same pushdown/pruning
behavior the plans here rely on (PushedFilters/ReadSchema assertions in
tests/test_build_spark.py hold for any DSv2 source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog/datasource is registered."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, location: str, *, format: str = "auto") -> DataFrame:
    """Read ``location`` as a table.

    format='auto': Iceberg table identifier (contains no '/') via the
    session catalog if Iceberg is on the classpath; otherwise a parquet
    path.  Explicit 'iceberg' raises a clear error when the runtime is
    absent instead of a ClassNotFound deep in py4j.
    """
    if format == "iceberg" or (format == "auto" and "/" not in location):
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime is not on the Spark classpath; add "
                "org.apache.iceberg:iceberg-spark-runtime and a catalog "
                "config, or pass a parquet path"
            )
        return spark.read.format("iceberg").load(location)
    return spark.read.parquet(location)
