"""Streaming and time-expiring filter support.

Two tiers, mirroring SURVEY.md §2.6 (the reference's cache-sketch /
expiring family, ExpiringBloomFilter.java + TimeMap.java):

1. **Batch expiry** — the Spark-native reading of "expire items whose
   TTL elapsed": TTLs live in a DataFrame of (key, expires_at); an
   expiry pass is an anti-join + counting-filter subtraction (negative
   merge), replacing the reference's DelayQueue worker thread
   (ExpirationQueueMemory.java:14-45) and Redis ZSET Lua batch
   (expireQueue.lua).  Deterministic, idempotent, testable.

2. **Structured Streaming build** — ``foreachBatch`` incremental filter
   maintenance: each micro-batch's keys are hashed with the same
   partition builders and OR-merged into a durable checkpoint, giving an
   always-current membership filter over a stream.

The per-key state semantics match the reference:
- ``report_read`` extends a key's TTL to max(existing, now+ttl)
  (TimeMap.putRemaining, TimeMap.java:59-62);
- a key ``is_known`` while its TTL (plus grace) is unexpired
  (ExpiringBloomFilter.isKnown, java:24-51);
- expiry removes the key from the counting filter
  (ExpiringBloomFilterMemory.java:37-39).
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .build import build_counting, key_column
from .counting import CountingBloomFilter
from .filter import BloomFilter
from .params import FilterConfig


class ExpiringBloomFilter:
    """Batch-mode expiring membership sketch.

    State = a TTL table (key, expires_at_ms) DataFrame + a counting
    filter over the unexpired keys.  All mutations are DataFrame
    transformations; ``expire(now)`` is the batch analog of the
    reference's background expiry queue.
    """

    def __init__(self, config: FilterConfig, ttl_table: DataFrame):
        self.config = config
        # max-merge duplicate keys (reportRead TTL max semantics)
        self.ttls = ttl_table.groupBy("key").agg(
            F.max("expires_at_ms").alias("expires_at_ms")
        )

    @classmethod
    def from_reads(
        cls,
        reads: DataFrame,
        config: FilterConfig,
        *,
        key_col: str = "key",
        ts_col: str = "ts_ms",
        ttl_col: str = "ttl_ms",
    ) -> "ExpiringBloomFilter":
        """Build from a log of reportRead(key, ttl) events: each read
        extends the key's expiration to read_ts + ttl (max-merged)."""
        ttls = reads.select(
            key_column(key_col).alias("key"),
            (F.col(ts_col) + F.col(ttl_col)).alias("expires_at_ms"),
        )
        return cls(config, ttls)

    def report_read(self, more: DataFrame, key_col="key", ts_col="ts_ms", ttl_col="ttl_ms"):
        extra = more.select(
            key_column(key_col).alias("key"),
            (F.col(ts_col) + F.col(ttl_col)).alias("expires_at_ms"),
        )
        return ExpiringBloomFilter(self.config, self.ttls.unionByName(extra))

    def unexpired(self, now_ms: int, grace_ms: int = 0) -> DataFrame:
        return self.ttls.where(F.col("expires_at_ms") + grace_ms > now_ms)

    def snapshot_filter(self, now_ms: int, grace_ms: int = 0) -> CountingBloomFilter:
        """Counting filter over currently-unexpired keys — the analog of
        getClonedBloomFilter (ExpiringBloomFilterMemory.java:110-112);
        expiry is 'subtract the expired', realized here by rebuilding
        from the unexpired set (equivalent by merge associativity)."""
        return build_counting(self.unexpired(now_ms, grace_ms), "key", self.config)

    def is_known(self, keys: DataFrame, key_col: str, now_ms: int, grace_ms: int = 0) -> DataFrame:
        """Membership column against the unexpired population (isKnown
        list overload, AbstractExpiringBloomFilterRedis.java:61-113)."""
        from .probe import with_membership

        cbf = self.snapshot_filter(now_ms, grace_ms)
        return with_membership(keys, key_col, cbf.to_bloom_filter(), out_col="known")

    def remaining_ttl(self, keys: DataFrame, key_col: str, now_ms: int) -> DataFrame:
        """(key, remaining_ms or null) — getRemainingTTL
        (ExpiringBloomFilter.java:59-72)."""
        probe = keys.select(key_column(key_col).alias("key"))
        return probe.join(self.ttls, "key", "left").select(
            "key",
            F.when(
                F.col("expires_at_ms") > now_ms, F.col("expires_at_ms") - now_ms
            ).alias("remaining_ms"),
        )

    def cleanup_ttls(self, now_ms: int, grace_ms: int) -> "ExpiringBloomFilter":
        """Drop TTLs expired beyond the grace period (cleanupTTLs,
        ExpiringBloomFilterMemory.java:42-52)."""
        return ExpiringBloomFilter(
            self.config, self.ttls.where(F.col("expires_at_ms") + grace_ms > now_ms)
        )


def streaming_bloom_build(
    stream_df: DataFrame,
    col: str,
    config: FilterConfig,
    checkpoint_dir: str,
    *,
    query_name: str = "bloomspark-stream",
    trigger: Optional[dict] = None,
):
    """Maintain a Bloom filter over a stream with foreachBatch.

    Each micro-batch is hashed with the same distributed builders and
    OR-merged into ``<checkpoint_dir>/bitset.bin``; the merged filter is
    always loadable via :func:`bloomspark.checkpoint.load`.  Restarts are
    safe: re-adding a batch's keys is idempotent (OR).
    """
    from .build import build_bloom

    os.makedirs(checkpoint_dir, exist_ok=True)
    bits_path = os.path.join(checkpoint_dir, "bitset.bin")
    config_path = os.path.join(checkpoint_dir, "config.json")
    if not os.path.exists(config_path):
        import json

        with open(config_path, "w") as f:
            json.dump({"config": config.to_dict()}, f)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        bf = build_bloom(batch_df, col, config)
        if os.path.exists(bits_path):
            with open(bits_path, "rb") as f:
                bf.union_inplace(BloomFilter.from_bytes(config, f.read()))
        tmp = bits_path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(bf.to_bytes())
        os.replace(tmp, bits_path)

    writer = (
        stream_df.writeStream.queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(checkpoint_dir, "_spark"))
        .foreachBatch(process_batch)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def expiring_membership_stream(
    events: DataFrame,
    *,
    key_col: str = "key",
    time_col: str = "event_time",
    ttl_col: str = "ttl_ms",
    watermark_delay: str = "0 seconds",
):
    """Per-key expiring membership as a stateful streaming operator.

    The applyInPandasWithState tier of the reference's expiring family
    (SURVEY.md §2.6): each key's state is its TTL expiration
    (reportRead max-merge, TimeMap.java:59-62); an event-time timeout
    fires when the watermark passes the expiration, emitting the
    'expired' transition — the streaming-native replacement for the
    reference's DelayQueue expiry worker
    (ExpirationQueueMemory.java:31-45).

    Input: a streaming DataFrame with (key, event_time timestamp,
    ttl_ms).  Output stream: (key, expires_at_ms, status) where status
    is 'known' on update and 'expired' when the timer fires.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: "GroupState"):
        kstr = key[0]
        if state.hasTimedOut:
            (old,) = state.get if state.exists else (None,)
            state.remove()
            yield pd.DataFrame(
                {"key": [kstr], "expires_at_ms": [old], "status": ["expired"]}
            )
            return
        mx = 0
        for pdf in pdf_iter:
            # normalize to datetime64[ns] first: pandas 2.x may hand the
            # timestamp column over as datetime64[us]/[s], where a bare
            # astype('int64') would be µs/s, not ns
            ts_ms = (
                pdf[time_col].astype("datetime64[ns]").astype("int64") // 1_000_000
            )
            mx = max(mx, int((ts_ms + pdf[ttl_col]).max()))
        if state.exists:
            (cur,) = state.get
            mx = max(mx, int(cur))
        state.update((mx,))
        state.setTimeoutTimestamp(mx)
        yield pd.DataFrame(
            {"key": [kstr], "expires_at_ms": [mx], "status": ["known"]}
        )

    keyed = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(time_col),
        F.col(ttl_col),
    ).withWatermark(time_col, watermark_delay)
    return keyed.groupBy("key").applyInPandasWithState(
        update,
        outputStructType="key string, expires_at_ms long, status string",
        stateStructType="expires_at_ms long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
