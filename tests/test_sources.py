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


# --- Bloom-index data skipping (bloomspark/sources/skipping.py) --------


@pytest.fixture(scope="module")
def doc_lake(spark, tmp_path_factory):
    """documents re-written as a 12-file range-partitioned lake, so
    doc_id ranges cluster per file and pruning has something to skip."""
    path = str(tmp_path_factory.mktemp("lake") / "documents")
    (
        spark.read.parquet(f"{SF}/documents.parquet")
        .repartitionByRange(12, "doc_id")
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def test_pruned_read_identical_to_full_scan(spark, doc_lake):
    """The contract: pruned read == full-scan filter, row for row (no
    false negatives + exact residual filter)."""
    from bloomspark.sources import build_file_index, pruned_read

    df = spark.read.parquet(doc_lake)
    cfg = FilterConfig.complete(n=200, p=0.01)
    index = build_file_index(df, "doc_id", cfg).cache()
    probe_ids = [3, 141, 468]
    got = pruned_read(spark, index, "doc_id", probe_ids, cfg)
    want = df.where(F.col("doc_id").isin(probe_ids))
    assert sorted(got.collect()) == sorted(want.collect())
    assert got.columns == df.columns


def test_prune_actually_skips_files(spark, doc_lake):
    """With range-clustered doc_ids, probing 2 ids must keep only a
    small fraction of the 12 files — the whole point of the index."""
    from bloomspark.sources import build_file_index, skipped_file_stats

    df = spark.read.parquet(doc_lake)
    cfg = FilterConfig.complete(n=200, p=1e-4)
    index = build_file_index(df, "doc_id", cfg).cache()
    stats = skipped_file_stats(index, cfg, [0, 499])
    assert stats["total"] == 12
    # 2 keys live in 2 files; p=1e-4 makes false-positive files unlikely
    assert stats["kept"] <= 4
    # a key in every file's range... still must never lose a true file:
    all_ids = [r["doc_id"] for r in df.select("doc_id").collect()]
    stats_all = skipped_file_stats(index, cfg, all_ids[:50])
    assert stats_all["kept"] >= 1


def test_pruned_read_empty_result_keeps_schema(spark, doc_lake):
    from bloomspark.sources import build_file_index, pruned_read

    df = spark.read.parquet(doc_lake)
    cfg = FilterConfig.complete(n=200, p=1e-6)
    index = build_file_index(df, "doc_id", cfg).cache()
    got = pruned_read(spark, index, "doc_id", [10_000_000], cfg)
    assert got.count() == 0
    assert got.schema == df.schema


def test_file_index_save_load_roundtrip(spark, doc_lake, tmp_path):
    from bloomspark.sources import (
        build_file_index,
        load_file_index,
        pruned_read,
        save_file_index,
    )

    df = spark.read.parquet(doc_lake)
    cfg = FilterConfig.complete(n=200, p=0.01)
    index = build_file_index(df, "doc_id", cfg)
    save_file_index(index, str(tmp_path / "idx"), cfg)
    loaded, cfg2 = load_file_index(spark, str(tmp_path / "idx"))
    assert cfg2.to_dict() == cfg.to_dict()
    got = pruned_read(spark, loaded, "doc_id", [7], cfg2)
    want = df.where(F.col("doc_id") == 7)
    assert sorted(got.collect()) == sorted(want.collect())
    # kind-tag guard: a sharded artifact must be refused
    with pytest.raises(ValueError, match="file_index"):
        from bloomspark.sharded import _hadoop_fs_and_path  # noqa: F401
        import json, os

        os.makedirs(str(tmp_path / "bad"), exist_ok=True)
        with open(str(tmp_path / "bad" / "config.json"), "w") as f:
            json.dump({"config": cfg.to_dict(), "kind": "bloom"}, f)
        load_file_index(spark, str(tmp_path / "bad"))


def test_file_index_rejects_inmemory_dataframe(spark):
    from bloomspark.sources import build_file_index

    cfg = FilterConfig.complete(n=100, p=0.01)
    df = spark.range(0, 100).select(F.col("id").alias("doc_id"))
    index = build_file_index(df, "doc_id", cfg)
    with pytest.raises(Exception, match="file-backed|RAISE_ERROR|raise_error"):
        index.collect()


def test_zone_map_range_read_identical_and_skips(spark, doc_lake):
    """zone_map=True adds typed key_min/key_max; range pruning is pure
    Catalyst, keeps only overlapping files, and the pruned range read
    equals the full-scan BETWEEN row for row."""
    from bloomspark.sources import (
        build_file_index,
        prune_files_range,
        pruned_read_range,
    )

    df = spark.read.parquet(doc_lake)
    cfg = FilterConfig.complete(n=200, p=0.01)
    index = build_file_index(df, "doc_id", cfg, zone_map=True).cache()
    assert {"key_min", "key_max"} <= set(index.columns)
    # typed bounds, not strings (doc_id is int64)
    dt = dict(index.dtypes)
    assert dt["key_min"] == "bigint" and dt["key_max"] == "bigint"
    kept = prune_files_range(index, 100, 149).where("may_contain").count()
    # 50 contiguous ids out of 500 over 12 range files -> at most 3 files
    assert 1 <= kept <= 3
    got = pruned_read_range(spark, index, "doc_id", 100, 149)
    want = df.where(F.col("doc_id").between(100, 149))
    assert sorted(got.collect()) == sorted(want.collect())
    # no-overlap range: empty result, schema preserved
    empty = pruned_read_range(spark, index, "doc_id", 10_000, 20_000)
    assert empty.count() == 0 and empty.schema == df.schema
    # an index without a zone map refuses range pruning
    bare = build_file_index(df, "doc_id", cfg)
    with pytest.raises(ValueError, match="zone map"):
        prune_files_range(bare, 0, 1)


def test_zone_map_survives_save_load(spark, doc_lake, tmp_path):
    from bloomspark.sources import (
        build_file_index,
        load_file_index,
        pruned_read_range,
        save_file_index,
    )

    df = spark.read.parquet(doc_lake)
    cfg = FilterConfig.complete(n=200, p=0.01)
    index = build_file_index(df, "doc_id", cfg, zone_map=True)
    save_file_index(index, str(tmp_path / "zidx"), cfg)
    loaded, _cfg = load_file_index(spark, str(tmp_path / "zidx"))
    got = pruned_read_range(spark, loaded, "doc_id", 42, 77)
    want = df.where(F.col("doc_id").between(42, 77))
    assert sorted(got.collect()) == sorted(want.collect())


def test_update_file_index_incremental_equals_rebuild(spark, tmp_path):
    """Appending files to the lake and running update_file_index must
    (a) reuse the old files' rows verbatim, (b) index only the new
    files, and (c) produce a row-identical result to a full rebuild
    (the per-file build is deterministic)."""
    from bloomspark.sources import (
        build_file_index,
        pruned_read,
        update_file_index,
    )

    lake = str(tmp_path / "grow")
    base = spark.read.parquet(f"{SF}/documents.parquet")
    base.repartitionByRange(8, "doc_id").write.parquet(lake)
    cfg = FilterConfig.complete(n=200, p=1e-4)
    df0 = spark.read.parquet(lake)
    index0 = build_file_index(df0, "doc_id", cfg, zone_map=True)
    pdf0 = index0.toPandas()

    # idempotent when nothing changed
    same = update_file_index(index0, df0, "doc_id", cfg)
    assert same.count() == len(pdf0)

    # append 4 new files with shifted ids
    (
        base.withColumn("doc_id", F.col("doc_id") + 1000)
        .repartitionByRange(4, "doc_id")
        .write.mode("append")
        .parquet(lake)
    )
    df1 = spark.read.parquet(lake)
    updated = update_file_index(index0, df1, "doc_id", cfg)
    rebuilt = build_file_index(df1, "doc_id", cfg, zone_map=True)

    def norm(pdf):
        rows = [
            (r.file, r.rows, r.ones, bytes(r.bitset), r.key_min, r.key_max)
            for r in pdf.itertuples()
        ]
        return sorted(rows)

    up, rb = norm(updated.toPandas()), norm(rebuilt.toPandas())
    assert up == rb
    assert len(up) == 12
    # old files' bitsets rode over byte-identically
    old = {(r.file, bytes(r.bitset)) for r in pdf0.itertuples()}
    assert old <= {(f, b) for f, _r, _o, b, _mn, _mx in up}
    # a key living only in an appended file is found through the index
    got = pruned_read(spark, updated, "doc_id", [1234], cfg)
    assert got.count() == 1 and got.first()["doc_id"] == 1234


def test_update_file_index_rejects_non_parquet_lake(spark, tmp_path):
    """update_file_index re-reads new files with spark.read.parquet;
    a non-parquet lake must raise rather than mis-read bytes."""
    import pytest

    from bloomspark.sources import build_file_index, update_file_index

    lake = str(tmp_path / "jsonlake")
    spark.range(100).withColumnRenamed("id", "doc_id").write.json(lake)
    cfg = FilterConfig.complete(n=200, p=1e-4)
    df = spark.read.json(lake)
    index = build_file_index(df, "doc_id", cfg)
    with pytest.raises(ValueError, match="parquet lakes only"):
        update_file_index(index, df, "doc_id", cfg)


def test_range_bucket_balances_skewed_column(spark):
    """KLL cut points split a heavily skewed column into near-equal
    MASS buckets (repartitionByRange's goal, deterministically), and
    passing saved cutpoints keeps the layout stable on new data."""
    from bloomspark.sources import range_cutpoints, with_range_bucket

    # zipf-ish skew: value = floor(1e6 / (1 + id % 1000))
    df = spark.range(20000).select(
        F.col("id"),
        (1_000_000 / (1 + F.col("id") % 1000)).cast("long").alias("v"),
    )
    out = with_range_bucket(df, "v", 8)
    sizes = {
        r["range_bucket"]: r["n"]
        for r in out.groupBy("range_bucket").agg(F.count("*").alias("n")).collect()
    }
    assert set(sizes) == set(range(8))
    # exact-regime KLL: every bucket within 2x of the ideal 2500
    assert all(1250 <= n <= 5000 for n in sizes.values())

    cuts = range_cutpoints(df, "v", 8)
    assert cuts == sorted(cuts)
    again = with_range_bucket(df.repartition(11), "v", 8, cutpoints=cuts)
    assert (
        again.withColumnRenamed("range_bucket", "b2")
        .join(out, "id")
        .where(F.col("b2") != F.col("range_bucket"))
        .count()
        == 0
    )


def test_range_bucket_plan_and_repartition(spark):
    from bloomspark.sources import repartition_balanced, with_range_bucket

    df = spark.range(5000).select(F.col("id"), (F.col("id") % 97).alias("v"))
    cuts = [10.0, 50.0, 80.0]
    plan = (
        with_range_bucket(df, "v", 4, cutpoints=cuts)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Python" not in plan
    parts = repartition_balanced(df, "v", 4, cutpoints=cuts)
    assert parts.rdd.getNumPartitions() == 4
    with pytest.raises(ValueError):
        with_range_bucket(df, "v", 1)
