"""Expiring-filter semantics (batch tier) and streaming incremental
build (SURVEY.md §2.6 re-expressed)."""

import os
import time

import pytest
from pyspark.sql import functions as F

from bloomspark import BloomFilter, FilterConfig
from bloomspark.streaming import ExpiringBloomFilter, streaming_bloom_build

CFG = FilterConfig.complete(n=1000, p=1e-6, counting_bits=16)


def _reads(spark, rows):
    return spark.createDataFrame(rows, "key string, ts_ms long, ttl_ms long")


def test_ttl_max_merge_and_expiry(spark):
    # two reads of the same key: TTL extends to the max (TimeMap semantics)
    ebf = ExpiringBloomFilter.from_reads(
        _reads(spark, [("a", 1000, 500), ("a", 1000, 2000), ("b", 1000, 100)]), CFG
    )
    ttls = {r["key"]: r["expires_at_ms"] for r in ebf.ttls.collect()}
    assert ttls == {"a": 3000, "b": 1100}

    # at t=1200: b expired, a alive
    alive = {r["key"] for r in ebf.unexpired(1200).collect()}
    assert alive == {"a"}
    cbf = ebf.snapshot_filter(now_ms=1200)
    assert cbf.contains("a") and not cbf.contains("b")
    # at t=5000 everything expired
    assert ebf.snapshot_filter(now_ms=5000).is_empty()


def test_grace_period(spark):
    ebf = ExpiringBloomFilter.from_reads(_reads(spark, [("k", 0, 100)]), CFG)
    assert ebf.snapshot_filter(now_ms=150, grace_ms=0).is_empty()
    assert ebf.snapshot_filter(now_ms=150, grace_ms=100).contains("k")


def test_remaining_ttl(spark):
    ebf = ExpiringBloomFilter.from_reads(_reads(spark, [("k", 0, 100)]), CFG)
    probe = spark.createDataFrame([("k",), ("missing",)], "key string")
    got = {r["key"]: r["remaining_ms"] for r in ebf.remaining_ttl(probe, "key", 40).collect()}
    assert got["k"] == 60
    assert got["missing"] is None
    # expired -> null (reference returns null for expired TTLs)
    got2 = {r["key"]: r["remaining_ms"] for r in ebf.remaining_ttl(probe, "key", 200).collect()}
    assert got2["k"] is None


def test_report_read_extends(spark):
    ebf = ExpiringBloomFilter.from_reads(_reads(spark, [("k", 0, 100)]), CFG)
    ebf2 = ebf.report_read(_reads(spark, [("k", 150, 100)]))
    assert ebf2.snapshot_filter(now_ms=200).contains("k")
    assert ebf.snapshot_filter(now_ms=200).is_empty()


def test_cleanup_ttls(spark):
    ebf = ExpiringBloomFilter.from_reads(
        _reads(spark, [("old", 0, 10), ("new", 0, 10_000)]), CFG
    )
    cleaned = ebf.cleanup_ttls(now_ms=5000, grace_ms=0)
    assert {r["key"] for r in cleaned.ttls.collect()} == {"new"}


def test_is_known_column(spark):
    ebf = ExpiringBloomFilter.from_reads(
        _reads(spark, [("a", 0, 10_000), ("b", 0, 10)]), CFG
    )
    probe = spark.createDataFrame([("a",), ("b",), ("c",)], "key string")
    got = {r["key"]: r["known"] for r in ebf.is_known(probe, "key", now_ms=500).collect()}
    assert got == {"a": True, "b": False, "c": False}


def test_streaming_incremental_build(spark, tmp_path):
    """rate-source stream -> foreachBatch incremental filter; the merged
    checkpoint must contain every streamed key."""
    ckpt = str(tmp_path / "stream_ck")
    cfg = FilterConfig.complete(n=10_000, p=1e-6)
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "500")
        .load()
        .select(F.col("value").cast("string").alias("key"))
    )
    q = streaming_bloom_build(stream, "key", cfg, ckpt)
    try:
        deadline = time.time() + 30
        seen = 0
        while time.time() < deadline:
            time.sleep(2)
            if os.path.exists(os.path.join(ckpt, "bitset.bin")):
                with open(os.path.join(ckpt, "bitset.bin"), "rb") as f:
                    bf = BloomFilter.from_bytes(cfg, f.read())
                seen = int(bf.get_estimated_population())
                if seen >= 100:
                    break
    finally:
        q.stop()
    assert seen >= 100, f"stream produced only ~{seen} keys"
    with open(os.path.join(ckpt, "bitset.bin"), "rb") as f:
        bf = BloomFilter.from_bytes(cfg, f.read())
    # no false negatives over the streamed prefix
    assert all(bf.contains(str(i)) for i in range(50))


def test_applyinpandaswithstate_expiry(spark, tmp_path):
    """Event-time timers: a key's state expires when the watermark passes
    its TTL; transitions arrive on the output stream."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime

    from bloomspark.streaming import expiring_membership_stream

    src = tmp_path / "events_src"
    src.mkdir()

    def write_batch(name, rows):
        t = pa.table(
            {
                "key": pa.array([r[0] for r in rows]),
                "event_time": pa.array(
                    [datetime.utcfromtimestamp(r[1]) for r in rows],
                    type=pa.timestamp("us"),
                ),
                "ttl_ms": pa.array([r[2] for r in rows], type=pa.int64()),
            }
        )
        pq.write_table(t, str(src / name))

    base = 1_700_000_000  # fixed epoch seconds
    write_batch("b1.parquet", [("a", base, 60_000), ("b", base, 5_000)])

    stream = (
        spark.readStream.schema("key string, event_time timestamp, ttl_ms long")
        .parquet(str(src))
    )
    out = expiring_membership_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("expiring_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows1 = {
            (r["key"], r["status"]): r["expires_at_ms"]
            for r in spark.sql("select * from expiring_test").collect()
        }
        assert rows1[("a", "known")] == base * 1000 + 60_000
        assert rows1[("b", "known")] == base * 1000 + 5_000

        # batch 2 advances the watermark past b's expiration (base+10s)
        # but not a's (base+60s)
        write_batch("b2.parquet", [("c", base + 10, 60_000)])
        q.processAllAvailable()
        # one more batch so the timer fires against the advanced watermark
        write_batch("b3.parquet", [("d", base + 11, 60_000)])
        q.processAllAvailable()
        rows2 = [
            (r["key"], r["status"])
            for r in spark.sql("select * from expiring_test").collect()
        ]
        assert ("b", "expired") in rows2
        assert ("a", "expired") not in rows2
    finally:
        q.stop()
