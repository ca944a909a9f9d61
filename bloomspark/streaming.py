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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .build import build_counting, key_column
from .counting import CountingBloomFilter
from .filter import BloomFilter
from .params import FilterConfig


class ExpiringBloomFilter:
    """Batch-mode expiring membership sketch (cache sketch).

    State = two tables, mirroring the reference's
    ``ExpiringBloomFilterMemory`` (cachesketch/ExpiringBloomFilterMemory
    .java:21-170):

    - ``ttls`` (key, expires_at_ms): the TimeMap of reportRead leases —
      max-merged on key (TimeMap.putRemaining, TimeMap.java:59-62);
    - ``writes`` (key, expires_at_ms): the expiration queue — keys whose
      reportWrite found an unexpired lease, carried in the underlying
      Bloom filter until their lease expires
      (ExpirationQueue.java:25-65).

    All mutations are immutable DataFrame transformations; time is an
    explicit ``now_ms`` argument instead of a background DelayQueue
    thread, so every reference test scenario replays deterministically.
    """

    def __init__(
        self,
        config: FilterConfig,
        ttl_table: DataFrame,
        write_table: Optional[DataFrame] = None,
        *,
        expiration_enabled: bool = True,
    ):
        self.config = config
        # max-merge duplicate keys (reportRead TTL max semantics)
        self.ttls = ttl_table.groupBy("key").agg(
            F.max("expires_at_ms").alias("expires_at_ms")
        )
        spark = ttl_table.sparkSession
        if write_table is None:
            write_table = spark.createDataFrame(
                [], "key string, expires_at_ms long"
            )
        self.writes = write_table
        self.expiration_enabled = expiration_enabled
        # snapshot memoization (see snapshot_filter)
        self._snapshots = {}
        self._cloned = {}
        self._depth = 0

    #: Bound on the memoized snapshot/clone caches: each entry retains a
    #: full m-sized filter, so unbounded caches leak one filter per
    #: distinct (now_ms, grace_ms) a long-lived evaluator probes at.
    #: FIFO eviction (dict insertion order) — callers overwhelmingly
    #: probe at one or a few "now"s, so recency hardly matters.
    _CACHE_MAX = 8

    #: Auto-compaction cadence: each report_read/report_write/etc.
    #: chains another union+groupBy onto the state tables' lineage; a
    #: long-lived batch evaluator would otherwise build an ever-deeper
    #: DAG (re-analyzed on every action, re-executed if unpersisted).
    #: Every this-many chained mutations the new instance's tables are
    #: localCheckpoint'ed (lazily — materialized at the next action),
    #: truncating the plan to a leaf.  Set to None to disable.
    AUTO_COMPACT_EVERY: Optional[int] = 32

    @classmethod
    def _cache_put(cls, cache: dict, key, value) -> None:
        cache[key] = value
        while len(cache) > cls._CACHE_MAX:
            cache.pop(next(iter(cache)))

    def _with(self, *, ttls=None, writes=None, enabled=None) -> "ExpiringBloomFilter":
        out = ExpiringBloomFilter.__new__(ExpiringBloomFilter)
        out.config = self.config
        out.ttls = self.ttls if ttls is None else ttls
        out.writes = self.writes if writes is None else writes
        out.expiration_enabled = (
            self.expiration_enabled if enabled is None else enabled
        )
        # state is immutable per instance, so memoized snapshots keyed on
        # (now_ms, grace_ms) stay valid for THIS object; a mutation
        # returns a new object whose caches start empty — except that
        # snapshot_filter depends only on ttls and cloned_bloom_filter
        # only on (writes, enabled), so each cache survives mutations
        # that leave its input table untouched
        out._snapshots = self._snapshots if ttls is None else {}
        out._cloned = (
            self._cloned if writes is None and enabled is None else {}
        )
        out._depth = self._depth + 1
        if (
            self.AUTO_COMPACT_EVERY is not None
            and out._depth >= self.AUTO_COMPACT_EVERY
        ):
            return out.compact()
        return out

    def compact(self) -> "ExpiringBloomFilter":
        """Truncate the state tables' lineage (localCheckpoint) —
        contents are unchanged, so memoized snapshots stay valid.
        Called automatically every :attr:`AUTO_COMPACT_EVERY` chained
        mutations; call it directly after a burst of report_read/
        report_write when a long-lived evaluator wants a fresh leaf at
        a known point.  The checkpoint is lazy: nothing runs until the
        next action touches the table."""
        out = ExpiringBloomFilter.__new__(ExpiringBloomFilter)
        out.config = self.config
        out.ttls = self.ttls.localCheckpoint(eager=False)
        out.writes = self.writes.localCheckpoint(eager=False)
        out.expiration_enabled = self.expiration_enabled
        out._snapshots = self._snapshots
        out._cloned = self._cloned
        out._depth = 0
        return out

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
        merged = (
            self.ttls.unionByName(extra)
            .groupBy("key")
            .agg(F.max("expires_at_ms").alias("expires_at_ms"))
        )
        return self._with(ttls=merged)

    def unexpired(self, now_ms: int, grace_ms: int = 0) -> DataFrame:
        return self.ttls.where(F.col("expires_at_ms") + grace_ms > now_ms)

    def snapshot_filter(self, now_ms: int, grace_ms: int = 0) -> CountingBloomFilter:
        """Counting filter over currently-unexpired keys — the analog of
        getClonedBloomFilter (ExpiringBloomFilterMemory.java:110-112);
        expiry is 'subtract the expired', realized here by rebuilding
        from the unexpired set (equivalent by merge associativity).

        Memoized per (now_ms, grace_ms): the reference maintains its CBF
        incrementally (ExpiringBloomFilterMemory.java:60-70), so a caller
        probing repeatedly at one evaluation time must not pay a full
        distributed build per probe — the second ``is_known``/``contains``
        at the same ``now_ms`` launches zero Spark jobs (instances are
        immutable, so the cache can never go stale).

        Returns a CLONE of the cached filter (the reference's
        getClonedBloomFilter contract): a caller mutating the returned
        object (add/remove/union) cannot poison later probes at the same
        ``now_ms``.  The clone is one numpy copy — noise next to the
        distributed build it replaces.  The cache itself is
        FIFO-bounded at ``_CACHE_MAX`` entries."""
        key = (int(now_ms), int(grace_ms))
        hit = self._snapshots.get(key)
        if hit is None:
            hit = build_counting(self.unexpired(now_ms, grace_ms), "key", self.config)
            self._cache_put(self._snapshots, key, hit)
        return hit.clone()

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
        return self._with(
            ttls=self.ttls.where(F.col("expires_at_ms") + grace_ms > now_ms)
        )

    # -- write path (the other half of the cache sketch) -------------------

    def report_write(
        self, writes: DataFrame, key_col: str = "key", ts_col: str = "ts_ms"
    ) -> "ExpiringBloomFilter":
        """Report writes: a written key enters the underlying filter IFF
        it still holds an unexpired read lease at its write timestamp,
        and stays until that lease expires
        (ExpiringBloomFilter.java:97-128, reportWrite guard at
        ExpiringBloomFilterMemory.java:61-72).  ``ts_col`` is the
        per-row write time — the batch shape of 'now'."""
        w = writes.select(
            key_column(key_col).alias("key"), F.col(ts_col).alias("__write_ts")
        )
        admitted = (
            w.join(self.ttls, "key")
            .where(F.col("expires_at_ms") > F.col("__write_ts"))
            .select("key", "expires_at_ms")
        )
        return self._with(writes=self.writes.unionByName(admitted))

    def report_write_status(
        self, writes: DataFrame, key_col: str = "key", ts_col: str = "ts_ms"
    ) -> DataFrame:
        """(key, remaining_ms or null) — reportWrite's return value: the
        remaining lease if the write was admitted, null otherwise."""
        w = writes.select(
            key_column(key_col).alias("key"), F.col(ts_col).alias("__write_ts")
        )
        return w.join(self.ttls, "key", "left").select(
            "key",
            F.when(
                F.col("expires_at_ms") > F.col("__write_ts"),
                F.col("expires_at_ms") - F.col("__write_ts"),
            ).alias("remaining_ms"),
        )

    def cloned_bloom_filter(self, now_ms: int):
        """The underlying Bloom filter's current contents: written keys
        whose lease is unexpired (getClonedBloomFilter,
        ExpiringBloomFilterMemory.java:110-112).  With expiration
        disabled the queue stops draining, so expired writes REMAIN
        contained until re-enabled (ExpirationQueue.setEnabled,
        ExpirationQueue.java:48-65).  Memoized per now_ms like
        :meth:`snapshot_filter`, and like it returns a CLONE of the
        cached filter so caller mutations cannot corrupt the cache."""
        key = int(now_ms)
        hit = self._cloned.get(key)
        if hit is None:
            live = (
                self.writes
                if not self.expiration_enabled
                else self.writes.where(F.col("expires_at_ms") > now_ms)
            )
            hit = build_counting(live, "key", self.config).to_bloom_filter()
            self._cache_put(self._cloned, key, hit)
        return hit.clone()

    def contains(self, keys: DataFrame, key_col: str, now_ms: int) -> DataFrame:
        """Membership column against the written-and-unexpired set (the
        reference's filter.contains after reportWrite)."""
        from .probe import with_membership

        bf = self.cloned_bloom_filter(now_ms)
        return with_membership(keys, key_col, bf, out_col="contained")

    def soft_clear(self) -> "ExpiringBloomFilter":
        """Clear the filter + expiration queue but KEEP the TTL map
        (softClear, ExpiringBloomFilter.java:152,
        ExpiringBloomFilterMemory.java:120-124)."""
        spark = self.ttls.sparkSession
        return self._with(
            writes=spark.createDataFrame([], "key string, expires_at_ms long")
        )

    def clear(self) -> "ExpiringBloomFilter":
        """Clear everything: filter, queue, and TTLs
        (ExpiringBloomFilterMemory.java:113-118)."""
        spark = self.ttls.sparkSession
        empty = spark.createDataFrame([], "key string, expires_at_ms long")
        return self._with(ttls=empty, writes=empty)

    def set_expiration_enabled(self, enabled: bool) -> "ExpiringBloomFilter":
        """Pause/resume expiry (setExpirationEnabled,
        ExpiringBloomFilter.java:136-144)."""
        return self._with(enabled=enabled)

    def enable_expiration(self) -> "ExpiringBloomFilter":
        return self.set_expiration_enabled(True)

    def disable_expiration(self) -> "ExpiringBloomFilter":
        return self.set_expiration_enabled(False)

    # -- map export/import + migration (TimeToLiveMapAware.java:9-21,
    #    ExpirationMapAware, AbstractExpiringBloomFilterRedis.java:204-227)

    def get_time_to_live_map(self) -> dict:
        """{key: expires_at_ms} — Arrow collect (small state export)."""
        pdf = self.ttls.toPandas()
        return dict(zip(pdf["key"], (int(v) for v in pdf["expires_at_ms"])))

    def set_time_to_live_map(self, mapping: dict) -> "ExpiringBloomFilter":
        """putAll semantics: imported leases max-merge with existing."""
        spark = self.ttls.sparkSession
        extra = spark.createDataFrame(
            list(mapping.items()), "key string, expires_at_ms long"
        )
        merged = (
            self.ttls.unionByName(extra)
            .groupBy("key")
            .agg(F.max("expires_at_ms").alias("expires_at_ms"))
        )
        return self._with(ttls=merged)

    def get_expiration_map(self) -> dict:
        pdf = self.writes.toPandas()
        return dict(zip(pdf["key"], (int(v) for v in pdf["expires_at_ms"])))

    def set_expiration_map(self, mapping: dict) -> "ExpiringBloomFilter":
        spark = self.ttls.sparkSession
        extra = spark.createDataFrame(
            list(mapping.items()), "key string, expires_at_ms long"
        )
        return self._with(writes=self.writes.unionByName(extra))

    def migrate_from(self, other: "ExpiringBloomFilter") -> "ExpiringBloomFilter":
        """Merge another expiring filter's whole state in (migrateFrom,
        ExpiringBloomFilterMemory.java:126-146): TTL map max-merges,
        expiration queues union."""
        if not self.config.is_compatible_to(other.config):
            raise ValueError("migration source is not compatible")
        merged_ttls = (
            self.ttls.unionByName(other.ttls)
            .groupBy("key")
            .agg(F.max("expires_at_ms").alias("expires_at_ms"))
        )
        return self._with(
            ttls=merged_ttls, writes=self.writes.unionByName(other.writes)
        )

    def is_cached(self, keys: DataFrame, key_col: str, now_ms: int) -> DataFrame:
        """(key, cached) — isCached: an unexpired read lease exists
        (ExpiringBloomFilter.java:24-27)."""
        return self.remaining_ttl(keys, key_col, now_ms).select(
            "key", F.col("remaining_ms").isNotNull().alias("cached")
        )

    def estimated_population(self) -> int:
        """Number of tracked leases (getEstimatedPopulation override,
        ExpiringBloomFilterMemory.java:105-108)."""
        return self.ttls.count()


def streaming_bloom_build(
    stream_df: DataFrame,
    col: str,
    config: FilterConfig,
    checkpoint_dir: str,
    *,
    query_name: str = "bloomspark-stream",
    trigger: Optional[dict] = None,
    use_fast_tier: bool = False,
):
    """Maintain a Bloom filter over a stream with foreachBatch.

    Each micro-batch is hashed with the same distributed builders and
    OR-merged into ``<checkpoint_dir>/bitset.bin``; the merged filter is
    always loadable via :func:`bloomspark.checkpoint.load`.  Restarts are
    safe: re-adding a batch's keys is idempotent (OR).

    ``use_fast_tier=True`` builds each micro-batch with the JVM-native
    fast build (fast.py, requires ``hash_method="XXHash64KM"``) — no
    Python workers per micro-batch; the merged file is byte-compatible
    either way (the two builds are bit-identical).
    """
    from .build import build_bloom

    if use_fast_tier:
        from .fast import _require_fast, build_fast_bloom as _fast_build

        # validate NOW: a parity-method config would otherwise only fail
        # inside foreachBatch on the first micro-batch, surfacing as an
        # asynchronous streaming-query failure instead of a ValueError
        _require_fast(config)

    os.makedirs(checkpoint_dir, exist_ok=True)
    bits_path = os.path.join(checkpoint_dir, "bitset.bin")
    config_path = os.path.join(checkpoint_dir, "config.json")
    if not os.path.exists(config_path):
        import json

        with open(config_path, "w") as f:
            json.dump({"config": config.to_dict()}, f)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        bf = (
            _fast_build(batch_df, col, config)
            if use_fast_tier
            else build_bloom(batch_df, col, config)
        )
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


def _write_batch_output(
    new_rows: DataFrame, output_dir: str, batch_id: int, exactly_once: bool
) -> None:
    """Persist a micro-batch's surviving rows.

    ``exactly_once=False`` (default): plain ``mode("append")`` — an
    at-least-once replay of a crashed batch may re-append its rows.

    ``exactly_once=True``: idempotent sink — each batch writes to its
    own ``output_dir/batch_id=<N>`` partition dir and a REPLAY of a
    batch whose dir already carries parquet's ``_SUCCESS`` marker
    writes NOTHING (mirroring the never-reused version-dir discipline
    of the sharded state).  A crash mid-write leaves no ``_SUCCESS``,
    so the replay's ``mode("overwrite")`` of that one dir repairs it;
    a crash after the write (before Spark's offset commit) is skipped
    whole.  Readers see a ``batch_id`` partition column (standard
    partition discovery).  Existence is checked through the Hadoop
    filesystem layer, so a remote (hdfs://, s3a://) output_dir works
    — on S3-like stores without atomic dir semantics pair this with a
    committer that makes ``_SUCCESS`` authoritative."""
    if not exactly_once:
        new_rows.write.mode("append").parquet(output_dir)
        return
    from .sharded import _hadoop_fs_and_path

    batch_dir = output_dir.rstrip("/") + f"/batch_id={batch_id}"
    fs, marker = _hadoop_fs_and_path(
        new_rows.sparkSession, batch_dir, "_SUCCESS"
    )
    if fs.exists(marker):
        return
    new_rows.write.mode("overwrite").parquet(batch_dir)


def _make_dedup_batch_processor(
    col: str,
    config: FilterConfig,
    checkpoint_dir: str,
    output_dir: str,
    rotate_at_population: Optional[int] = None,
    *,
    exactly_once_output: bool = False,
):
    """The foreachBatch body of :func:`streaming_dedup`, factored out so
    rotation/suppression semantics are unit-testable with plain batch
    DataFrames (no live stream, no timing)."""
    from .build import build_bloom
    from .fast import FAST_HASH_METHOD
    from .probe import with_membership

    fast = config.hash_method == FAST_HASH_METHOD
    os.makedirs(checkpoint_dir, exist_ok=True)
    bits_path = os.path.join(checkpoint_dir, "bitset.bin")
    prev_path = os.path.join(checkpoint_dir, "bitset_prev.bin")
    config_path = os.path.join(checkpoint_dir, "config.json")
    if not os.path.exists(config_path):
        import json

        with open(config_path, "w") as f:
            json.dump({"config": config.to_dict()}, f)

    def _load(path):
        if not os.path.exists(path):
            return None
        with open(path, "rb") as f:
            return BloomFilter.from_bytes(config, f.read())

    def _store(bf, path):
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(bf.to_bytes())
        os.replace(tmp, path)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        cur = _load(bits_path)
        prev = _load(prev_path)
        seen = cur.clone() if cur is not None else None
        if prev is not None:
            seen = prev if seen is None else seen.union(prev)
        # probe BEFORE the in-batch dedup: membership is a pure function
        # of the key, so filtering first is equivalent and the
        # dropDuplicates exchange then carries only the surviving rows.
        # Both tiers probe via the broadcast-bytes Arrow UDF and build
        # via the mapInArrow partials: at micro-batch sizes these
        # measured 2.3x / 4.3x faster than the k blocked broadcast
        # joins / the explode+bit_or aggregate (round-7 A/B, 500k-row
        # batches), and for XXHash64KM the numpy replica is
        # bit-identical to the native expressions (tests/test_fast.py),
        # so the emitted rows and the stored generations are unchanged.
        if seen is not None:
            mcol = "__dedup_member"
            probed = with_membership(batch_df, col, seen, out_col=mcol)
            new_rows = probed.where(~F.col(mcol)).drop(mcol)
        else:
            new_rows = batch_df
        new_rows = new_rows.dropDuplicates([col])
        # persist the survivors once, then hash exactly those rows
        new_rows = new_rows.localCheckpoint(eager=True)
        _write_batch_output(new_rows, output_dir, batch_id, exactly_once_output)
        bf = build_bloom(new_rows, col, config)
        if cur is not None:
            bf.union_inplace(cur)
        if (
            rotate_at_population is not None
            and bf.get_estimated_population() >= rotate_at_population
        ):
            # generation swap: the full filter becomes "previous", the
            # current generation restarts empty.  prev is written first:
            # a crash between the two replaces leaves BOTH generations
            # holding the keys (over-suppression, never re-emission).
            _store(bf, prev_path)
            bf = BloomFilter(config)
        _store(bf, bits_path)

    # surface the tier selection (implicit in config.hash_method) so
    # callers/operators can see which path their stream runs on
    process_batch.tier = "fast" if fast else "parity"
    return process_batch


def _make_sharded_dedup_batch_processor(
    col: str,
    shard_config: FilterConfig,
    checkpoint_dir: str,
    output_dir: str,
    *,
    num_shards: int = 64,
    salt_partitions: int = 4,
    rotate_at_population: Optional[int] = None,
    max_gen_dirs: int = 16,
    exactly_once_output: bool = False,
):
    """The foreachBatch body of :func:`streaming_dedup_sharded`: the
    streaming dedup recipe with the SEEN-state as a SHARDED filter
    (sharded.py) instead of a driver-held bitset — for streams whose
    distinct-key population outgrows any single broadcastable filter
    (10^12 keys need ~TB of bits; the driver path caps at one filter).

    State layout under ``checkpoint_dir`` (must be a DRIVER-LOCAL
    path — the state/generation bookkeeping uses local filesystem ops,
    and the per-version shard parquet lives under it too, so on a real
    cluster it must be a filesystem the driver and executors share;
    a ``hdfs://``/``s3a://`` URI is rejected up front, ``file://`` is
    accepted and stripped):

    - ``state.json``: {"cur": <manifest or null>, "prev": ...} where a
      manifest is ``{"shard_dirs": {"<shard>": "<version dir>"}}`` —
      each shard points at the LATEST version dir holding its bitset
      row.  Updated by atomic rename AFTER the new version's parquet is
      fully written, so a crash mid-batch leaves the previous state
      referenced and intact (orphaned version dirs are swept lazily).
    - ``gen_v<batch_id>/``: a :func:`bloomspark.sharded.save_sharded`
      layout holding ONLY the shards that batch touched.

    Per batch: exact in-batch dedup -> cogroup-probe against current
    (and previous, after a rotation) generations -> append survivors to
    ``output_dir`` -> build a sharded filter of the survivors (the
    per-group build emits only shards with >=1 new key) -> OR-merge
    with JUST those shards' current bitsets (semi-join; untouched
    shards' files are never read or rewritten) -> write the merged
    touched shards to a fresh version dir and repoint the manifest.
    When the generation's manifest spans more than ``max_gen_dirs``
    version dirs, one compaction rewrites the full generation — so
    steady-state write traffic is proportional to the shards a batch
    touches, amortized 1/max_gen_dirs of the filter, not filter-size
    per batch (the round-4 write-amplification caveat, closed).  Same
    at-least-once/idempotent-OR replay semantics as the driver path
    (streaming_dedup docstring).
    """
    import json

    from .sharded import (
        build_sharded_bloom,
        estimated_population_sharded,
        merge_sharded,
        save_sharded,
        with_sharded_membership,
    )

    # file:// is driver-local under a scheme — accept it by stripping to
    # its path; every OTHER scheme (hdfs://, s3a://, ...) is rejected
    if checkpoint_dir.startswith("file://"):
        checkpoint_dir = checkpoint_dir[len("file://"):]
    if "://" in checkpoint_dir:
        raise ValueError(
            "streaming_dedup_sharded checkpoint_dir must be a driver-local "
            f"path (got {checkpoint_dir!r}): state.json, the generation "
            "bookkeeping AND the per-version shard parquet (gen_v*/) all "
            "live under it via local filesystem operations.  Only "
            "output_dir may live on a remote Hadoop filesystem.  In a "
            "real cluster, point checkpoint_dir at a filesystem the "
            "driver AND executors share (NFS/fuse mount), since "
            "spark.read.parquet of the gen dirs runs on executors."
        )

    os.makedirs(checkpoint_dir, exist_ok=True)
    state_path = os.path.join(checkpoint_dir, "state.json")
    validated_dirs: set = set()

    def _read_state() -> dict:
        if not os.path.exists(state_path):
            return {"cur": None, "prev": None}
        with open(state_path) as f:
            return json.load(f)

    def _write_state(state: dict) -> None:
        tmp = state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, state_path)

    def _live_dirs(state: dict) -> set:
        live = set()
        for gen in (state.get("cur"), state.get("prev")):
            if gen:
                live.update(gen["shard_dirs"].values())
        return live

    def _sweep(state: dict) -> None:
        import shutil

        live = _live_dirs(state)
        for name in os.listdir(checkpoint_dir):
            full = os.path.join(checkpoint_dir, name)
            if name.startswith("gen_v") and os.path.isdir(full) and full not in live:
                shutil.rmtree(full, ignore_errors=True)

    def _validate_dir(gen_dir: str) -> None:
        # a restart with different (shard_config, num_shards) than the
        # saved generations would silently route keys to the wrong
        # shard/bitset and re-emit seen keys — fail loudly instead
        if gen_dir in validated_dirs:
            return
        with open(os.path.join(gen_dir, "config.json")) as f:
            meta = json.load(f)
        if (
            FilterConfig.from_dict(meta["config"]) != shard_config
            or int(meta["num_shards"]) != int(num_shards)
        ):
            raise ValueError(
                f"streaming_dedup_sharded: saved generation {gen_dir} was "
                f"built with (config={meta['config']}, "
                f"num_shards={meta['num_shards']}) but this processor was "
                f"given (config={shard_config.to_dict()}, "
                f"num_shards={num_shards}); restart with the saved "
                "parameters or clear the checkpoint."
            )
        validated_dirs.add(gen_dir)

    def _load_gen(spark, gen: dict) -> Optional[DataFrame]:
        """Shards DataFrame for a manifest: each version dir contributes
        exactly the shards for which it is the latest version."""
        by_dir: dict = {}
        for s, d in gen["shard_dirs"].items():
            by_dir.setdefault(d, []).append(int(s))
        parts = []
        for d, shard_ids in by_dir.items():
            _validate_dir(d)
            parts.append(
                spark.read.parquet(os.path.join(d, "shards")).where(
                    F.col("shard").isin(shard_ids)
                )
            )
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _save_version(spark, df, gen_dir: str) -> dict:
        """Persist shard rows to a fresh version dir; return the
        {shard: dir} entries, read back from the written parquet (no
        recompute, and only shard ids — never bitsets — hit the
        driver)."""
        save_sharded(df, gen_dir, shard_config, num_shards=num_shards)
        validated_dirs.add(gen_dir)
        saved = spark.read.parquet(os.path.join(gen_dir, "shards"))
        return {
            str(int(r["shard"])): gen_dir
            for r in saved.select("shard").collect()
        }

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        state = _read_state()
        # pre-round-5 state.json stored cur/prev as plain dir strings
        # (one save_sharded dir held the whole generation); normalize to
        # the manifest form so an upgraded restart keeps its state
        for slot in ("cur", "prev"):
            gen = state.get(slot)
            if isinstance(gen, str):
                _validate_dir(gen)
                state[slot] = {
                    "shard_dirs": {
                        str(int(r["shard"])): gen
                        for r in spark.read.parquet(
                            os.path.join(gen, "shards")
                        ).select("shard").collect()
                    }
                }
        new_rows = batch_df
        # probe cur+prev in ONE cogroup pass: a key is seen iff it is a
        # member of the UNION of the two generations, and the cogroup
        # probe already ORs multiple rows per shard (sharded.py), so
        # unioning the shard tables is byte-identical to probing each
        # generation separately — but the batch shuffles once, not twice
        gen_tables = [
            t
            for t in (
                _load_gen(spark, gen)
                for gen in (state["cur"], state["prev"])
                if gen is not None
            )
            if t is not None
        ]
        if gen_tables:
            shards = gen_tables[0]
            for t in gen_tables[1:]:
                shards = shards.unionByName(t)
            mcol = "__dedup_member"
            new_rows = (
                with_sharded_membership(
                    new_rows, col, shards, shard_config,
                    num_shards=num_shards, out_col=mcol,
                )
                .where(~F.col(mcol))
                .drop(mcol)
            )
        # in-batch dedup AFTER the probe (membership is per-key pure, so
        # the order is semantics-preserving) — the dropDuplicates
        # exchange then carries only surviving rows
        new_rows = new_rows.dropDuplicates([col]).localCheckpoint(eager=True)
        _write_batch_output(new_rows, output_dir, batch_id, exactly_once_output)
        built = build_sharded_bloom(
            new_rows, col, shard_config,
            num_shards=num_shards, salt_partitions=salt_partitions,
        )
        cur = state["cur"]
        if cur is not None:
            cur_df = _load_gen(spark, cur)
            if cur_df is not None:
                # the touched-shard rows feed BOTH the semi-join and the
                # merge union — pin them (<= S tiny rows) so the build
                # shuffle runs once per batch, not twice
                built = built.localCheckpoint(eager=True)
                # merge ONLY the shards this batch touched: untouched
                # shards keep their existing version files, unread and
                # unwritten (the incremental-write property)
                built = merge_sharded(
                    built,
                    cur_df.join(built.select("shard"), "shard", "semi"),
                )
        # a NEW, NEVER-REUSED version dir per attempt: the merged shards
        # still read old versions' parquet lazily, so overwriting any
        # existing dir would corrupt the files being scanned — and a
        # batch REPLAY (Structured Streaming re-runs batch N when the
        # crash fell between our state commit and Spark's offset commit)
        # must not overwrite the already-committed gen_v{N} the live
        # manifest references; an existing dir gets an attempt suffix
        # and uncommitted leftovers are swept after the state commit
        def _fresh_dir(base: str) -> str:
            d, i = base, 0
            while os.path.exists(d):
                i += 1
                d = f"{base}_r{i}"
            return d

        new_dir = _fresh_dir(os.path.join(checkpoint_dir, f"gen_v{batch_id}"))
        shard_dirs = dict(cur["shard_dirs"]) if cur is not None else {}
        shard_dirs.update(_save_version(spark, built, new_dir))
        cur_gen = {"shard_dirs": shard_dirs}
        if len(set(shard_dirs.values())) > max_gen_dirs:
            # compaction: rewrite the full generation ONCE so manifest
            # fan-out (and probe-side unions) stay bounded
            full = _load_gen(spark, cur_gen)
            compact_dir = _fresh_dir(
                os.path.join(checkpoint_dir, f"gen_v{batch_id}_compact")
            )
            cur_gen = {"shard_dirs": _save_version(spark, full, compact_dir)}
        if rotate_at_population is not None:
            cur_df = _load_gen(spark, cur_gen)
            rotate = (
                cur_df is not None
                and estimated_population_sharded(cur_df, shard_config)
                >= rotate_at_population
            )
        else:
            # rotation disabled: skip the per-batch generation re-read
            # whose only consumer is the population check
            rotate = False
        if rotate:
            # generation swap, driver-path semantics: the full filter
            # becomes "previous", the current generation restarts empty
            state = {"cur": None, "prev": cur_gen}
        else:
            state = {"cur": cur_gen, "prev": state["prev"]}
        _write_state(state)
        _sweep(state)

    process_batch.tier = "sharded"
    return process_batch


def streaming_dedup_sharded(
    stream_df: DataFrame,
    col: str,
    shard_config: FilterConfig,
    checkpoint_dir: str,
    output_dir: str,
    *,
    num_shards: int = 64,
    salt_partitions: int = 4,
    rotate_at_population: Optional[int] = None,
    max_gen_dirs: int = 16,
    exactly_once_output: bool = False,
    query_name: str = "bloomspark-stream-dedup-sharded",
    trigger: Optional[dict] = None,
):
    """:func:`streaming_dedup` with never-collected sharded state — the
    composition for unbounded streams whose per-generation distinct-key
    population itself exceeds a driver/broadcastable filter (round-3
    verdict item 5).  ``shard_config`` sizes ONE shard (n = generation
    window / num_shards); semantics, error model and rotation behavior
    match :func:`streaming_dedup` (asserted byte-identical on the same
    batch sequence in tests/test_streaming.py).

    Writes are INCREMENTAL: each micro-batch persists only the shards
    it touched to a fresh version dir behind the atomic ``state.json``
    manifest; untouched shards' parquet is never read or rewritten.
    When a generation accumulates more than ``max_gen_dirs`` version
    dirs, one compaction rewrites it whole — steady-state write traffic
    is touched-shards + 1/max_gen_dirs of the filter per batch, not
    filter-size x batch-cadence.  Sizing: a batch of B uniform keys
    touches ~S(1-e^(-B/S)) shards, so the saving requires num_shards
    ABOVE the per-batch key count — raise S until shards are
    batch-sized (each shard's bitset shrinks with 1/S, so write bytes
    then track B, not filter size; measured 8.1% of the full-rewrite
    traffic at B=5, S=64 — BASELINE.md round-5).  ``checkpoint_dir`` must be a
    driver-local path (state bookkeeping is local-filesystem; rejected
    up front for ``hdfs://``/``s3a://`` URIs) — ``output_dir`` may be
    any Hadoop filesystem."""
    process_batch = _make_sharded_dedup_batch_processor(
        col, shard_config, checkpoint_dir, output_dir,
        num_shards=num_shards, salt_partitions=salt_partitions,
        rotate_at_population=rotate_at_population,
        max_gen_dirs=max_gen_dirs,
        exactly_once_output=exactly_once_output,
    )
    writer = (
        stream_df.writeStream.queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(checkpoint_dir, "_spark"))
        .foreachBatch(process_batch)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def streaming_dedup(
    stream_df: DataFrame,
    col: str,
    config: FilterConfig,
    checkpoint_dir: str,
    output_dir: str,
    *,
    rotate_at_population: Optional[int] = None,
    exactly_once_output: bool = False,
    query_name: str = "bloomspark-stream-dedup",
    trigger: Optional[dict] = None,
):
    """Approximate streaming deduplication with bounded state: emit only
    first-seen keys, tracking "seen" in a Bloom filter instead of the
    unbounded exact-state map of ``dropDuplicates``.

    Per micro-batch (foreachBatch): exact-dedup within the batch
    (``dropDuplicates`` on ``col``), drop rows whose key the
    accumulated filter already contains, append the survivors to
    ``output_dir`` (parquet), then OR-merge the survivors' keys into
    ``<checkpoint_dir>/bitset.bin``.  The probe and the build run on
    the fast tier (zero Python) when ``config.hash_method ==
    "XXHash64KM"``, else on the parity-tier pandas probe.

    Error semantics are one-sided relative to the stream's true first
    occurrences: a true duplicate of an ALREADY-MERGED key is never
    emitted; a genuinely new key is wrongly dropped with probability
    <= the filter's current FPP (size ``config`` for the expected total
    distinct keys).  The filter is persisted AFTER the output append,
    so an at-least-once replay of a failed batch may re-emit that
    batch's rows (no loss) — the same trade every idempotent-sink
    foreachBatch pipeline makes; state is m/8 bytes forever, where
    ``dropDuplicates`` without a watermark grows without bound.
    ``exactly_once_output=True`` upgrades the sink to exactly-once:
    each batch writes its own ``output_dir/batch_id=N`` partition dir
    and a replay of an already-committed batch writes nothing (see
    :func:`_write_batch_output`; readers gain a ``batch_id`` partition
    column).

    **Infinite streams**: a single filter saturates as distinct keys
    pass ``config.n`` (FPP climbs toward 1 and everything is dropped).
    ``rotate_at_population=W`` bounds that with two generations
    (current + previous, each sized for W keys): when the current
    generation's estimated population reaches W it becomes "previous"
    and a fresh one starts; probes test the union of both.  A key is
    then suppressed for at least one and at most two generation windows
    after it is first seen, FPP stays <= that of two W-key filters, and
    state stays 2·m/8 bytes forever — the standard double-buffer
    recipe for unbounded-stream dedup.

    Reference analog: none (single-node filters can just be probed
    in-process); this is README.md's "one-sided set queries" use case
    composed with Structured Streaming.
    """
    process_batch = _make_dedup_batch_processor(
        col, config, checkpoint_dir, output_dir, rotate_at_population,
        exactly_once_output=exactly_once_output,
    )

    writer = (
        stream_df.writeStream.queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(checkpoint_dir, "_spark"))
        .foreachBatch(process_batch)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def streaming_sketch_build(
    stream_df: DataFrame,
    col: str,
    sketch,
    checkpoint_dir: str,
    *,
    query_name: str = "bloomspark-sketch-stream",
    trigger: Optional[dict] = None,
):
    """Maintain a mergeable sketch (HLL / CMS / t-digest / KLL) over a
    stream with foreachBatch: each micro-batch runs the same distributed
    partial build and merges into ``<checkpoint_dir>/state.bin``
    (atomic replace), always loadable via :func:`load_sketch_state`.

    Restart semantics follow the sketch's merge algebra: foreachBatch
    is at-least-once, so a replayed batch RE-MERGES.  For idempotent
    merges (HLL register max) that is exact; for additive merges (CMS,
    t-digest, KLL weights) a replayed batch double-counts — the same
    caveat as any non-idempotent at-least-once sink, documented rather
    than hidden.
    """
    import json

    from .sketches import build_sketch

    os.makedirs(checkpoint_dir, exist_ok=True)
    state_path = os.path.join(checkpoint_dir, "state.bin")
    meta_path = os.path.join(checkpoint_dir, "sketch.json")
    if not os.path.exists(meta_path):
        with open(meta_path, "w") as f:
            json.dump({"sketch": sketch.describe()}, f)
    else:
        meta = json.load(open(meta_path))
        if meta["sketch"] != sketch.describe():
            raise ValueError(
                f"checkpoint holds {meta['sketch']}, got {sketch.describe()}"
            )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        handle = build_sketch(batch_df, col, sketch)
        state = handle.state
        if os.path.exists(state_path):
            with open(state_path, "rb") as f:
                state = sketch.merge_states(state, sketch.deserialize(f.read()))
        tmp = state_path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(sketch.serialize(state))
        os.replace(tmp, state_path)

    writer = (
        stream_df.writeStream.queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(checkpoint_dir, "_spark"))
        .foreachBatch(process_batch)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def load_sketch_state(sketch, checkpoint_dir: str):
    """Load the current merged state of a streaming sketch build (None
    before the first batch commits)."""
    state_path = os.path.join(checkpoint_dir, "state.bin")
    if not os.path.exists(state_path):
        return None
    with open(state_path, "rb") as f:
        return sketch.deserialize(f.read())


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


def windowed_sketch_stream(
    events: DataFrame,
    *,
    value_col: str,
    time_col: str,
    window: str,
    watermark_delay: str,
    sketch,
    emit,
    emit_schema: str,
    slide: Optional[str] = None,
):
    """Generic per-event-time-window sketch maintenance over a stream —
    the stateful harness behind :func:`windowed_distinct_stream` and
    :func:`windowed_quantiles_stream`, taking any sketch satisfying the
    engine contract (sketches/engine.py: new_state / update /
    serialize / deserialize, ``numeric`` attr).

    Built on ``applyInPandasWithState`` grouped by window start:
    tumbling event-time windows + watermark for late data; every
    micro-batch folds its values into the window's sketch (vectorized:
    Keys buffers or float64 ndarrays, no per-row Python) and emits a
    RUNNING row (``is_final = false``, output mode update); when the
    watermark passes the window end the event-time timeout fires once,
    emits the FINAL row and frees the state — state size is
    (open windows) x (sketch payload), never values.  Late rows inside
    the watermark delay reach their window's still-live state; later
    rows are dropped by the watermark like any windowed agg.

    ``emit(state) -> dict`` maps the sketch state to the output
    columns declared in ``emit_schema`` (e.g. ``"estimate double,
    retained long"``); the harness wraps them as
    ``(window_start timestamp, <emit_schema>, is_final boolean)``.

    Reference analog: none — the reference is single-node with no
    event-time semantics; this is the task brief's "watermarks +
    windowed aggs for late data" composed with the sketch library.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from .hashing import keys_from_pandas

    numeric = bool(getattr(sketch, "numeric", False))

    def _row(ws, st, final):
        out = {"window_start": [ws]}
        for name, val in emit(st).items():
            out[name] = [val]
        out["is_final"] = [final]
        return pd.DataFrame(out)

    def update(key, pdf_iter, state: "GroupState"):
        ws = key[0]
        if state.hasTimedOut:
            (payload,) = state.get
            st = sketch.deserialize(bytes(payload))
            state.remove()
            yield _row(ws, st, True)
            return
        st = (
            sketch.deserialize(bytes(state.get[0]))
            if state.exists
            else sketch.new_state()
        )
        end_ms = 0
        for pdf in pdf_iter:
            if numeric:
                vals = pdf["__wd_val"].to_numpy(dtype="float64")
                vals = vals[~np.isnan(vals)]
                if len(vals):
                    sketch.update(st, vals)
            else:
                # drop NULL keys like the numeric path drops NaN
                # (round-7 advice): a null key row must not fold a
                # spurious key into the window's distinct/top-k state
                col = pdf["__wd_val"]
                if col.isna().any():
                    col = col.dropna()
                if len(col):
                    sketch.update(st, keys_from_pandas(col))
            # normalize: pandas 2.x may deliver timestamps at us/s units
            end_ns = pdf["__wd_end"].astype("datetime64[ns]").astype("int64")
            end_ms = max(end_ms, int(end_ns.max() // 1_000_000))
        state.update((sketch.serialize(st),))
        state.setTimeoutTimestamp(end_ms)
        yield _row(ws, st, False)

    win = (
        F.window(F.col(time_col), window, slide)
        if slide
        else F.window(F.col(time_col), window)
    )
    val = (
        F.col(value_col).cast("double")
        if numeric
        else F.col(value_col).cast("string")
    )
    # the watermark column must survive into the stateful operator's
    # input (event-time timeout requires it), so keep time_col alongside
    # the derived window bounds; the update fn never reads it
    keyed = events.select(
        win.start.alias("__wd_start"),
        win.end.alias("__wd_end"),
        val.alias("__wd_val"),
        F.col(time_col),
    ).withWatermark(time_col, watermark_delay)
    return keyed.groupBy("__wd_start").applyInPandasWithState(
        update,
        outputStructType=(
            f"window_start timestamp, {emit_schema}, is_final boolean"
        ),
        stateStructType="payload binary",
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def windowed_distinct_stream(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    time_col: str = "ts",
    window: str = "1 hour",
    watermark_delay: str = "0 seconds",
    sketch=None,
    slide: Optional[str] = None,
):
    """Distinct-count per event-time window over a stream — the
    windowed aggregation a 100 TB event stream needs where
    ``COUNT(DISTINCT)`` is unbounded-state and
    ``approx_count_distinct`` offers no set algebra or custom
    precision/serde.  A :func:`windowed_sketch_stream` instance with a
    Theta (default, k=4096) or HLL sketch as the per-window state.

    The estimate is EXACT while the sketch retains fewer than k keys
    (ThetaSketch.is_exact), which is what lets the driver gate oracle
    this stream against plain ``COUNT(DISTINCT)`` SQL; above k the
    published ~1/sqrt(k-2) bound applies.

    At-least-once replay note: a replayed batch RE-folds its keys into
    the sketch — distinct-count folding is idempotent (register max /
    set insert), so replays never inflate the estimate, unlike additive
    sketches (streaming_sketch_build's caveat does not apply here).

    Output schema: (window_start timestamp, estimate double,
    retained long, is_final boolean).
    """
    if sketch is None:
        from .sketches import ThetaSketch

        sketch = ThetaSketch(k=4096)
    return windowed_sketch_stream(
        events,
        value_col=key_col,
        time_col=time_col,
        window=window,
        watermark_delay=watermark_delay,
        sketch=sketch,
        emit=lambda st: {
            "estimate": float(sketch.estimate(st)),
            "retained": int(sketch.retained(st)),
        },
        emit_schema="estimate double, retained long",
        slide=slide,
    )


def windowed_quantiles_stream(
    events: DataFrame,
    *,
    value_col: str = "value",
    time_col: str = "ts",
    window: str = "1 hour",
    watermark_delay: str = "0 seconds",
    quantiles=(0.5, 0.95),
    sketch=None,
    slide: Optional[str] = None,
):
    """Quantiles per event-time window over a stream: a
    :func:`windowed_sketch_stream` instance with a KLL sketch (default
    k=4096) as the per-window state, emitting one ``q_<pct>`` column
    per requested quantile (0.5 -> ``q_50``).

    While a window holds fewer than k values the KLL compactors never
    fire and the emitted quantiles are EXACT order statistics of the
    values seen (rank convention: the value at cumulative rank
    ``ceil(q * n)`` — the driver-gate oracle replays exactly that with
    SQL window functions); beyond k the published KLL rank bound
    applies.  NaN/NULL values are dropped before folding.
    """
    if sketch is None:
        from .sketches import KLLSketch

        sketch = KLLSketch(k=4096)
    qs = list(quantiles)
    if not qs or any(not 0.0 < q < 1.0 for q in qs):
        raise ValueError("quantiles must be in (0, 1)")
    names = [f"q_{str(q).replace('0.', '', 1)}" for q in qs]
    if len(set(names)) != len(names):
        raise ValueError(f"quantiles collide after naming: {names}")
    emit_schema = ", ".join(f"{n} double" for n in names)
    return windowed_sketch_stream(
        events,
        value_col=value_col,
        time_col=time_col,
        window=window,
        watermark_delay=watermark_delay,
        sketch=sketch,
        emit=lambda st: {
            n: float(sketch.quantile(st, q)) for n, q in zip(names, qs)
        },
        emit_schema=emit_schema,
        slide=slide,
    )


def windowed_topk_stream(
    events: DataFrame,
    *,
    key_col: str = "event_type",
    time_col: str = "ts",
    window: str = "1 hour",
    watermark_delay: str = "0 seconds",
    n: int = 5,
    sketch=None,
    slide: Optional[str] = None,
):
    """Top-n heavy hitters per event-time window over a stream: a
    :func:`windowed_sketch_stream` instance with a Misra–Gries
    frequent-items sketch per window, emitting the ranked items and
    their count lower bounds as array columns plus an ``exact`` flag
    (true while the window's distinct keys fit the sketch — no
    evictions, counts exact; beyond that the standard n/k error bound
    applies and ``exact`` reads false).

    Ordering is deterministic: count descending, item bytes ascending —
    which is what lets the driver gate replay the whole stream against
    a SQL ``row_number() OVER (ORDER BY cnt DESC, key ASC)`` ranking.

    Output schema: (window_start timestamp, top_items array<string>,
    top_counts array<long>, exact boolean, is_final boolean).
    """
    if sketch is None:
        from .sketches import FrequentItemsSketch

        sketch = FrequentItemsSketch(k=64)
    if n < 1:
        raise ValueError("n must be >= 1")

    def emit(st):
        top = sketch.top_k(st, n)
        return {
            "top_items": [t[0] for t in top],
            "top_counts": [int(t[1]) for t in top],
            "exact": int(getattr(st, "error", 0)) == 0,
        }

    return windowed_sketch_stream(
        events,
        value_col=key_col,
        time_col=time_col,
        window=window,
        watermark_delay=watermark_delay,
        sketch=sketch,
        emit=emit,
        emit_schema=(
            "top_items array<string>, top_counts array<long>, exact boolean"
        ),
        slide=slide,
    )
