"""Per-group Bloom filters with map-side partials + per-group merge.

Builds one filter per group (e.g. one per ``repo``) as a DataFrame of
``(group, rows, ones, bitset)``.  The build is two-phase, with the
partial aggregation on the MAP side (guide shape: aggregate before you
shuffle):

stage 1: ``mapInArrow`` over the INPUT partitions — one hybrid
         sparse/dense partial per (input partition, group), so the only
         thing that ever shuffles is partial payloads, never keyed rows
         (round-7: the previous (group, salt) row exchange was the
         build's largest shuffle — 64-byte keys per row at the sharded
         tier — and is gone entirely);
stage 2: ``groupBy(group)`` OR-merge of the (at most P, typically far
         sparser) partials per group.

Skew: a hot group no longer overloads any reducer because NO reducer
ever processes rows — stage 1's work follows the input partitioning
regardless of group values, and stage 2 merges at most
P x num_bytes per group.  Inputs that plan as too few partitions
(single-row-group parquet) are spread once on (group, key-salt) —
``salt_partitions`` bounds the partials per group on that path and is
otherwise unused.  Memory per task is bounded by
``_STAGE1_FLUSH_BYTES``: when the live accumulators exceed it, the
partials flush early and accumulation restarts — stage 2 merges any
number of partials per group.
"""

from __future__ import annotations


from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .build import _series_to_keys, key_column
from .counting import add_saturating, counter_dtype, counter_max
from .filter import BloomFilter, popcount
from .hashing import get_hash_fn
from .params import FilterConfig

GROUPED_SCHEMA = "group string, rows bigint, ones bigint, bitset binary"
GROUPED_COUNTING_SCHEMA = "group string, rows bigint, nonzero bigint, counters binary"


def _factorize_groups(groups: np.ndarray):
    """(codes, uniques) over a possibly-null object array of group values.

    ``np.unique`` cannot sort None next to str (TypeError); pandas
    factorize with ``use_na_sentinel=False`` gives nulls their own code,
    so a null group builds/probes its own filter like any other value
    (the round-1 ``groupBy().applyInPandas`` behavior).  Uniques are
    normalized so null is always the Python ``None`` (dict-key stable)."""
    codes, uniques = pd.factorize(groups, use_na_sentinel=False)
    normed = [None if (u is None or (isinstance(u, float) and np.isnan(u))) else u
              for u in uniques]
    return codes, normed


def _group_sort_key(item):
    # None groups sort last (None is not orderable against str)
    return (item[0] is None, item[0] or "")


#: Per-task budget for live stage-1 accumulator payloads; past it the
#: accumulated partials flush as an early record batch and accumulation
#: restarts (stage 2 merges any number of partials per group).
_STAGE1_FLUSH_BYTES = 128 << 20

GROUPED_PARTIAL_SCHEMA = "group string, rows bigint, kind string, bitset binary"


def _spread_keyed(
    keyed: DataFrame, df: DataFrame, salt_partitions: int
) -> DataFrame:
    """Ensure the stage-1 map side is parallel: when the input's
    partition count is statically known and healthy (>= half the
    session's shuffle parallelism, e.g. a pre-repartitioned or range
    source) run directly on it — zero shuffle, at most P partials per
    group; otherwise (single-row-group parquet scans plan as ONE
    partition) spread the keyed rows once on (group, key-salt) — the
    pre-round-7 clustering, which CO-LOCATES each group into at most
    ``salt_partitions`` cells so a many-group input does not pay
    partition-count partials per group.  Any spread yields the
    identical merged filters (associative partials)."""
    from .build import plan_num_partitions

    shuffle_parts = max(
        int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")), 1
    )
    known = plan_num_partitions(df)
    if known is not None and known * 2 >= shuffle_parts:
        return keyed
    return keyed.repartition(
        shuffle_parts,
        F.col("__group"),
        F.pmod(F.xxhash64(F.col("__key")), F.lit(max(salt_partitions, 1))),
    )


def _grouped_stage1_gen(config: FilterConfig):
    """mapInArrow generator over (__group, __key) batches of the RAW
    input partitioning: streams batches through one hybrid Bloom
    accumulator per group and emits ONE sparse/dense partial per
    (partition, group) — the map-side combine.  No keyed row ever
    shuffles; peak memory = one Arrow batch + the live accumulators,
    bounded by the flush budget."""
    import pyarrow as pa

    from .build import _PositionAccumulator, _encode_dense

    m, k = config.m, config.k
    method = config.hash_method
    num_bytes = config.num_bytes
    schema = pa.schema(
        [
            ("group", pa.string()),
            ("rows", pa.int64()),
            ("kind", pa.string()),
            ("bitset", pa.binary()),
        ]
    )

    def flush(accs):
        cols = {"group": [], "rows": [], "kind": [], "bitset": []}
        for g, (acc, rows) in sorted(accs.items(), key=_group_sort_key):
            kind, _ones, payload = acc.finish()
            cols["group"].append(g)
            cols["rows"].append(rows)
            cols["kind"].append(kind)
            cols["bitset"].append(payload)
        return pa.RecordBatch.from_pydict(cols, schema=schema)

    def gen(batches):
        accs = {}  # group -> [accumulator, rows]
        pending = 0
        hash_fn = get_hash_fn(method)
        for batch in batches:
            from .hashing import Keys

            keys = Keys.from_arrow(batch.column(1))
            if len(keys) == 0:
                continue
            groups = batch.column(0).to_numpy(zero_copy_only=False)
            pos = hash_fn(keys, m, k)
            codes, uniq = _factorize_groups(groups)
            for gi, g in enumerate(uniq):
                mask = codes == gi
                st = accs.setdefault(g, [_PositionAccumulator(m, num_bytes), 0])
                st[0].add(pos[mask])
                st[1] += int(mask.sum())
            pending += pos.size * 4
            if pending > _STAGE1_FLUSH_BYTES:
                yield flush(accs)
                accs, pending = {}, 0
        if accs:
            yield flush(accs)

    return gen


def build_bloom_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    config: FilterConfig,
    *,
    salt_partitions: int = 8,
) -> DataFrame:
    """One Bloom filter per group -> DataFrame (group, rows, ones, bitset).

    ``salt_partitions`` only matters when the input needs an explicit
    spread (see :func:`_spread_keyed`); pre-partitioned inputs build
    map-side with zero row shuffle."""
    from .build import _merge_partial_arrays

    def stage2(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = _merge_partial_arrays(pdf["kind"], pdf["bitset"], config)
        return pd.DataFrame(
            {
                "group": [pdf["group"].iloc[0]],
                "rows": [int(pdf["rows"].sum())],
                "ones": [popcount(acc)],
                "bitset": [acc.tobytes()],
            }
        )

    keyed = df.select(
        F.col(group_col).cast("string").alias("__group"),
        key_column(key_col).alias("__key"),
    )
    partials = _spread_keyed(keyed, df, salt_partitions).mapInArrow(
        _grouped_stage1_gen(config), schema=GROUPED_PARTIAL_SCHEMA
    )
    return partials.groupBy("group").applyInPandas(stage2, schema=GROUPED_SCHEMA)


def build_counting_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    config: FilterConfig,
    *,
    salt_partitions: int = 8,
) -> DataFrame:
    """One counting filter per group -> (group, rows, nonzero, counters).

    ``salt_partitions`` only matters when the input needs an explicit
    spread (see :func:`build_bloom_per_group`).  Saturating add is associative up
    to saturation (final counter = min(true sum, max) under ANY partial
    grouping), so the map-side partials merge to the identical counter
    arrays the row-shuffled build produced."""
    from .build import _CounterAccumulator, add_counting_payload

    m, k = config.m, config.k
    method = config.hash_method
    dt = counter_dtype(config.counting_bits)
    mx = counter_max(config.counting_bits)

    def stage1_gen(batches):
        # streaming per-group hybrid counter accumulation — the map-side
        # combine; emits csparse/cdense partials, never keyed rows
        import pyarrow as pa

        from .hashing import Keys

        pa_schema = pa.schema(
            [("group", pa.string()), ("rows", pa.int64()),
             ("kind", pa.string()), ("counters", pa.binary())]
        )

        def flush(states):
            cols = {"group": [], "rows": [], "kind": [], "counters": []}
            for g, (acc, rows) in sorted(states.items(), key=_group_sort_key):
                kind, _nonzero, _over, payload = acc.finish()
                cols["group"].append(g)
                cols["rows"].append(rows)
                cols["kind"].append(kind)
                cols["counters"].append(payload)
            return pa.RecordBatch.from_pydict(cols, schema=pa_schema)

        states = {}
        pending = 0
        hash_fn = get_hash_fn(method)
        for batch in batches:
            keys = Keys.from_arrow(batch.column(1))
            if len(keys) == 0:
                continue
            groups = batch.column(0).to_numpy(zero_copy_only=False)
            pos = hash_fn(keys, m, k)
            codes, uniq = _factorize_groups(groups)
            for gi, g in enumerate(uniq):
                mask = codes == gi
                st = states.setdefault(g, [_CounterAccumulator(config), 0])
                st[0].add(pos[mask])
                st[1] += int(mask.sum())
            pending += pos.size * 8
            if pending > _STAGE1_FLUSH_BYTES:
                yield flush(states)
                states, pending = {}, 0
        if states:
            yield flush(states)

    def stage2(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(m, dtype=dt)
        noop_overflow = lambda n: None  # noqa: E731 — clamp count not surfaced
        for kind, b in zip(pdf["kind"], pdf["counters"]):
            add_counting_payload(acc, kind, b, config, noop_overflow)
        return pd.DataFrame(
            {
                "group": [pdf["group"].iloc[0]],
                "rows": [int(pdf["rows"].sum())],
                "nonzero": [int(np.count_nonzero(acc))],
                "counters": [acc.tobytes()],
            }
        )

    keyed = df.select(
        F.col(group_col).cast("string").alias("__group"),
        key_column(key_col).alias("__key"),
    )
    partials = _spread_keyed(keyed, df, salt_partitions).mapInArrow(
        stage1_gen, schema="group string, rows bigint, kind string, counters binary"
    )
    return partials.groupBy("group").applyInPandas(
        stage2, schema=GROUPED_COUNTING_SCHEMA
    )


def collect_group_filters(grouped: DataFrame, config: FilterConfig) -> dict:
    """Collect a per-group build into {group: BloomFilter} (small dims).

    Uses ``toPandas()`` (Arrow path) — never row-``collect()`` binary
    partials through py4j (CLAUDE.md invariant)."""
    pdf = grouped.select("group", "bitset").toPandas()
    return {
        g: BloomFilter.from_bytes(config, bytes(b))
        for g, b in zip(pdf["group"], pdf["bitset"])
    }


def collect_group_counting_filters(grouped: DataFrame, config: FilterConfig) -> dict:
    """Collect a per-group counting build into {group: CountingBloomFilter}."""
    from .counting import CountingBloomFilter

    pdf = grouped.select("group", "counters").toPandas()
    return {
        g: CountingBloomFilter.from_bytes(config, bytes(b))
        for g, b in zip(pdf["group"], pdf["counters"])
    }


#: Above this collected-state size the "auto" probe strategy switches
#: from the broadcast-dict plan to the cogroup plan (driver + every
#: executor would otherwise hold n_groups x state_bytes resident).
DEFAULT_MAX_BROADCAST_BYTES = 512 << 20


def _resolve_probe_strategy(
    strategy: str,
    grouped_state: DataFrame,
    state_bytes: int,
    max_broadcast_bytes,
    n_groups=None,
) -> str:
    """'auto' -> 'broadcast' | 'cogroup' by estimated collected size.

    The estimate is n_groups x per-group state size (bitset/counters
    are fixed-width for a given config).  ``n_groups`` (threaded from
    the probe APIs) resolves the choice with ZERO jobs; without it,
    counting n_groups is one aggregate job over ``grouped_state`` — if
    the caller didn't persist it, that recomputes its build lineage
    once (round-4 verdict item 4: pass n_groups or an explicit
    strategy to skip the job entirely)."""
    if strategy != "auto":
        if strategy not in ("broadcast", "cogroup"):
            raise ValueError(f"unknown probe strategy {strategy!r}")
        return strategy
    if max_broadcast_bytes is None:
        return "broadcast"
    if n_groups is None:
        n_groups = grouped_state.count()
    return (
        "cogroup" if n_groups * state_bytes > max_broadcast_bytes else "broadcast"
    )


def _cogroup_probe(
    df: DataFrame,
    group_col: str,
    key_col: str,
    grouped_state: DataFrame,
    state_col: str,
    out_col: str,
    out_type,
    probe_fn,
) -> DataFrame:
    """Shared never-collected probe plan: co-partition probe rows and
    per-group state on the group value and evaluate ``probe_fn`` with
    each group's single local state row (the sharded.py cogroup shape
    generalized to arbitrary group columns).  Each group's bitset or
    counter array crosses the wire once per job — never via the driver,
    never as a per-row column — so G x state_bytes can exceed any
    broadcast or driver memory."""
    from pyspark.sql.types import StructField, StructType

    out_schema = StructType(list(df.schema.fields) + [StructField(out_col, out_type)])
    probe_side = df.withColumn("__group", F.col(group_col).cast("string")).withColumn(
        "__key", key_column(key_col)
    )
    state_side = grouped_state.select(
        F.col("group").alias("__group"), F.col(state_col).alias("__state")
    )
    orig_cols = df.columns

    def apply(pdf: pd.DataFrame, sdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[orig_cols].copy()
        if len(sdf):
            out[out_col] = probe_fn(pdf["__key"], bytes(sdf["__state"].iloc[0]))
        else:
            out[out_col] = probe_fn(pdf["__key"], None)
        return out

    return (
        probe_side.groupBy("__group")
        .cogroup(state_side.groupBy("__group"))
        .applyInPandas(apply, schema=out_schema)
    )


def with_group_estimated_count(
    df: DataFrame,
    group_col: str,
    key_col: str,
    grouped_counters: DataFrame,
    config: FilterConfig,
    *,
    out_col: str = "est_count",
    strategy: str = "auto",
    max_broadcast_bytes: int = DEFAULT_MAX_BROADCAST_BYTES,
    n_groups: Optional[int] = None,
) -> DataFrame:
    """Per-tenant frequency probe: estimate each row's key count against
    ITS OWN group's counting filter (the counting sibling of
    :func:`with_group_membership`; reference analog: pipelined bulk
    getEstimatedCount, redis/CountingBloomFilterRedis.java:159-165, at
    per-group granularity).  Default broadcast-dict shape — counters
    travel once per executor, never as a per-row column; missing groups
    estimate 0.  When the collected counter state would exceed
    ``max_broadcast_bytes`` (or ``strategy='cogroup'``), routes to the
    never-collected cogroup plan instead (see
    :func:`with_group_membership` for the trade-off)."""

    from .counting import counter_dtype
    from .hashing import get_hash_fn

    m, k, method = config.m, config.k, config.hash_method
    dt = counter_dtype(config.counting_bits)
    chosen = _resolve_probe_strategy(
        strategy, grouped_counters, m * dt.itemsize, max_broadcast_bytes,
        n_groups,
    )
    if chosen == "cogroup":
        from pyspark.sql.types import LongType

        def est(keys: pd.Series, raw):
            if raw is None:
                return np.zeros(len(keys), dtype=np.int64)
            counters = np.frombuffer(raw, dtype=dt)
            pos = get_hash_fn(method)(_series_to_keys(keys), m, k)
            return counters[pos].min(axis=1).astype(np.int64)

        return _cogroup_probe(
            df, group_col, key_col, grouped_counters, "counters",
            out_col, LongType(), est,
        )
    fdf = grouped_counters.select("group", "counters").toPandas()
    table = {g: bytes(b) for g, b in zip(fdf["group"], fdf["counters"])}
    bc = df.sparkSession.sparkContext.broadcast(table)

    from pyspark.sql.functions import arrow_udf

    @arrow_udf("long")
    def probe(groups: pa.Array, keys: pa.Array) -> pa.Array:
        from .hashing import Keys

        counters_by_group = bc.value
        kb = Keys.from_arrow(
            keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
        )
        pos = get_hash_fn(method)(kb, m, k)
        out = np.zeros(len(kb), dtype=np.int64)
        codes, uniques = _factorize_groups(
            groups.to_numpy(zero_copy_only=False)
        )
        for ui, g in enumerate(uniques):
            raw = counters_by_group.get(g)
            if raw is None:
                continue
            idx = np.nonzero(codes == ui)[0]
            counters = np.frombuffer(raw, dtype=dt)
            out[idx] = counters[pos[idx]].min(axis=1).astype(np.int64)
        return pa.array(out)

    return df.withColumn(
        out_col, probe(F.col(group_col).cast("string"), key_column(key_col))
    )


def with_group_membership(
    df: DataFrame,
    group_col: str,
    key_col: str,
    grouped_filters: DataFrame,
    config: FilterConfig,
    *,
    out_col: str = "member",
    strategy: str = "auto",
    max_broadcast_bytes: int = DEFAULT_MAX_BROADCAST_BYTES,
    n_groups: Optional[int] = None,
) -> DataFrame:
    """Probe each row's key against ITS OWN group's filter.

    ``grouped_filters`` is the output of :func:`build_bloom_per_group`
    with the same ``config``.  Two plans behind one API:

    - ``'broadcast'`` (the default when the state fits): the filters
      table is collected once on the driver (Arrow ``toPandas``) and
      broadcast to the executors as a ``{group: bitset}`` dict —
      exactly like the single-filter probe (probe.py:29-43).  The probe
      UDF receives ONLY the (group, key) columns; the multi-MB bitsets
      never appear as a per-row column, so Arrow batch volume is
      O(rows × key_bytes), not O(rows × m/8).  (Round-1 shipped the
      bitset per probe row through a broadcast join — petabytes of
      Arrow traffic at a 10⁹-row grid.)  The plan is a pure scan →
      Project → ArrowEvalPython: no join, no shuffle.
    - ``'cogroup'``: neither driver nor executors ever hold all
      filters; probe rows and filters co-partition on the group and
      each task sees one group's bitset (the sharded.py plan shape).
      One shuffle of the probe rows, but G × m/8 resident nowhere.

    ``strategy='auto'`` picks: broadcast while
    n_groups × num_bytes <= ``max_broadcast_bytes`` (pass ``n_groups``
    when known — e.g. the tenant count — and the choice costs zero
    jobs; without it, counting the groups costs one aggregate job over
    ``grouped_filters``, so persist it if that lineage is expensive),
    else cogroup — previously 10k groups
    × 1.2 MB silently meant ~12 GB on the driver AND in every executor.
    Rows whose group has no filter probe False.  This is the Spark
    shape of the reference's pipelined bulk contains
    (redis/BloomFilterRedis.java:75-97) at per-tenant granularity.
    """

    from .filter import test_positions
    from .hashing import get_hash_fn

    m, k, method = config.m, config.k, config.hash_method
    chosen = _resolve_probe_strategy(
        strategy, grouped_filters, config.num_bytes, max_broadcast_bytes,
        n_groups,
    )
    if chosen == "cogroup":
        from pyspark.sql.types import BooleanType

        def member(keys: pd.Series, raw):
            if raw is None:
                return np.zeros(len(keys), dtype=bool)
            bits = np.frombuffer(raw, dtype=np.uint8)
            pos = get_hash_fn(method)(_series_to_keys(keys), m, k)
            return test_positions(bits, pos)

        return _cogroup_probe(
            df, group_col, key_col, grouped_filters, "bitset",
            out_col, BooleanType(), member,
        )
    fdf = grouped_filters.select("group", "bitset").toPandas()
    filters = {g: bytes(b) for g, b in zip(fdf["group"], fdf["bitset"])}
    bc = df.sparkSession.sparkContext.broadcast(filters)

    from pyspark.sql.functions import arrow_udf

    @arrow_udf("boolean")
    def probe(groups: pa.Array, keys: pa.Array) -> pa.Array:
        from .hashing import Keys

        table = bc.value
        kb = Keys.from_arrow(
            keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
        )
        pos = get_hash_fn(method)(kb, m, k)
        out = np.zeros(len(kb), dtype=bool)
        # factorize by group: one vectorized bit-test per distinct filter
        codes, uniques = _factorize_groups(
            groups.to_numpy(zero_copy_only=False)
        )
        for ui, g in enumerate(uniques):
            raw = table.get(g)
            if raw is None:
                continue
            idx = np.nonzero(codes == ui)[0]
            bits = np.frombuffer(raw, dtype=np.uint8)
            out[idx] = test_positions(bits, pos[idx])
        return pa.array(out)

    return df.withColumn(
        out_col, probe(F.col(group_col).cast("string"), key_column(key_col))
    )
