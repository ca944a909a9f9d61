"""Bloom-index data skipping: per-file Bloom filters pruning a scan.

The canonical reason a data lake wants a Bloom library at 100 TB:
point lookups ("has this content sha / repo+path key ever been seen,
and where?") should not scan every file.  Iceberg and Parquet both
ship this idea as *internal* metadata (Parquet column-index bloom
filters, Iceberg data-skipping stats); here it is a FIRST-CLASS,
persistable index table the engine builds once and every query reuses:

    index = build_file_index(df, "doc_id", config)   # one row per file
    hits  = pruned_read(spark, index, "doc_id", [7, 42], config)

- ``build_file_index`` groups the scan by ``input_file_name()`` and
  builds one filter per file through the salted two-phase grouped
  build (grouped.py) — states never touch the driver, one shuffle of
  (key-hash, file) pairs, index size = n_files x m/8 bytes.
- ``prune_files`` hashes the (few) probe keys ONCE on the driver,
  broadcasts the k positions, and tests every file's bitset in one
  distributed ``mapInArrow`` pass over the index — the per-iteration
  unit is a FILE (vectorized numpy over all probe keys' positions),
  never a data row, and no bitset ever reaches the driver.
- ``pruned_read`` collects only the surviving file NAMES (strings),
  reads exactly those files, and applies the exact residual filter.
  Bloom filters have no false negatives, so the pruned scan is a
  superset of the true matches and the residual filter makes the
  result IDENTICAL to the full-scan filter — false positives cost
  only extra file reads, bounded by config.p per file.

At 10^12-file scale the index is itself a big table; pruning stays a
single distributed map over it (no driver state), and the index
persists next to the data via the Hadoop FileSystem (any scheme the
cluster mounts), kind-tagged like the sharded tier's artifacts.

Reference parity note: Orestes-Bloomfilter has no scan layer; this is
the engine applying its own sketches to its own source pruning
(SURVEY.md "sources" row), the Spark-side analog of the reference's
purpose as a pre-storage gate (README.md "avoid unnecessary lookups").
"""

from __future__ import annotations

import json
from typing import Iterable, Iterator, List, Sequence

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..build import key_column
from ..filter import test_positions
from ..grouped import build_bloom_per_group
from ..hashing import Keys, get_hash_fn
from ..params import FilterConfig

FILE_INDEX_SCHEMA = "file string, rows bigint, ones bigint, bitset binary"


def build_file_index(
    df: DataFrame,
    key_col: str,
    config: FilterConfig,
    *,
    salt_partitions: int = 8,
    zone_map: bool = False,
) -> DataFrame:
    """One Bloom filter per underlying file of a file-backed scan ->
    DataFrame (file, rows, ones, bitset).  ``config`` sizes each
    per-file filter: set ``expected_elements`` to the max distinct
    keys per FILE (not per table).  ``df`` must read from files
    (parquet/orc/...): ``input_file_name()`` is empty for in-memory
    DataFrames, which raises (executor-side, lazily) rather than
    indexing garbage under a '' file name.

    ``zone_map=True`` appends ``key_min`` / ``key_max`` columns (the
    ORIGINAL column type, not the hashed string form) — the other half
    of Iceberg/Parquet-style skipping: bloom answers point lookups,
    the zone map answers RANGE predicates with pure Catalyst
    comparisons (:func:`prune_files_range`, no probe pass at all).
    Costs one extra aggregation scan of the input at build time."""
    fname = F.input_file_name()
    guarded = F.when(
        fname == "",
        F.raise_error(
            F.lit(
                "build_file_index: input_file_name() is empty — "
                "the DataFrame is not a file-backed scan"
            )
        ),
    ).otherwise(fname)
    keyed = df.select(
        guarded.alias("__file"), key_column(key_col).alias("__key")
    )
    index = build_bloom_per_group(
        keyed, "__file", "__key", config, salt_partitions=salt_partitions
    ).withColumnRenamed("group", "file")
    if zone_map:
        zones = (
            df.select(guarded.alias("file"), F.col(key_col).alias("__z"))
            .groupBy("file")
            .agg(F.min("__z").alias("key_min"), F.max("__z").alias("key_max"))
        )
        index = index.join(zones, "file")
    return index


def update_file_index(
    index: DataFrame,
    df: DataFrame,
    key_col: str,
    config: FilterConfig,
    *,
    salt_partitions: int = 8,
) -> DataFrame:
    """Incremental index maintenance: index ONLY files of ``df`` not
    yet present in ``index`` and return the union — on an append-only
    lake the cost is proportional to the appended files, never the
    table (the property that makes a 10^12-file index maintainable).

    New-file detection is FILE-level, not row-level: ``df.inputFiles()``
    (driver-side file NAMES — strings, tiny even at 10^6 files) minus
    the names already in ``index``, then a fresh reader over exactly
    those paths — already-indexed files are never re-opened, their
    rows ride over from ``index`` verbatim.  The per-file build is
    deterministic, so the result is row-identical to a full rebuild.
    ``config`` must be the one the original index was built with
    (load_file_index returns it); zone-map presence is auto-detected
    from the index schema.  Parquet lakes only (the new-file reader is
    ``spark.read.parquet``): other formats raise here rather than
    silently re-reading bytes with the wrong reader."""
    zone = "key_min" in index.columns
    all_files = df.inputFiles()
    non_parquet = [f for f in all_files if not f.endswith(".parquet")]
    if non_parquet:
        raise ValueError(
            "update_file_index supports parquet lakes only; found "
            f"{non_parquet[:3]}"
        )
    seen = {r["file"] for r in index.select("file").collect()}
    new_files = [f for f in all_files if f not in seen]
    if not new_files:
        return index
    spark = df.sparkSession
    new_df = spark.read.schema(df.schema).parquet(*new_files)
    fresh = build_file_index(
        new_df,
        key_col,
        config,
        salt_partitions=salt_partitions,
        zone_map=zone,
    )
    return index.unionByName(fresh)


def prune_files(
    index: DataFrame, config: FilterConfig, values: Sequence
) -> DataFrame:
    """-> (file string, may_contain boolean): whether each indexed file
    MAY contain ANY of ``values``.  One distributed pass; the probe
    keys' k positions are computed once driver-side and broadcast."""
    if len(values) == 0:
        raise ValueError("values must be non-empty")
    keys = Keys.from_objects([str(v) for v in values])
    pos = get_hash_fn(config.hash_method)(keys, config.m, config.k)
    spark = index.sparkSession
    bc = spark.sparkContext.broadcast(pos)

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        positions = bc.value
        for batch in batches:
            files = batch.column(0)
            bitsets = batch.column(1)
            keep = np.empty(len(files), dtype=bool)
            for i in range(len(files)):  # per FILE, not per data row
                bits = np.frombuffer(bitsets[i].as_py(), dtype=np.uint8)
                keep[i] = bool(test_positions(bits, positions).any())
            yield pa.RecordBatch.from_arrays(
                [files, pa.array(keep)], names=["file", "may_contain"]
            )

    return index.select("file", "bitset").mapInArrow(
        gen, schema="file string, may_contain boolean"
    )


def pruned_read(
    spark: SparkSession,
    index: DataFrame,
    key_col: str,
    values: Sequence,
    config: FilterConfig,
    *,
    schema=None,
) -> DataFrame:
    """Exact ``key_col IN values`` over the indexed files, reading ONLY
    files whose Bloom filter may contain a probe key.  Identical
    results to the full-scan filter (no false negatives + exact
    residual filter); false positives only widen the file list.

    ``schema``: optional StructType for the empty-result case (all
    files pruned); defaults to peeking one indexed file's schema."""
    kept = [
        r["file"]
        for r in prune_files(index, config, values)
        .where(F.col("may_contain"))
        .select("file")
        .collect()  # file NAMES only — strings, never bitsets
    ]
    str_vals = [str(v) for v in values]
    if not kept:
        if schema is None:
            any_file = index.select("file").first()
            if any_file is None:
                raise ValueError("index is empty")
            schema = spark.read.parquet(any_file["file"]).schema
        return spark.createDataFrame([], schema)
    return spark.read.parquet(*kept).where(
        key_column(key_col).isin(str_vals)
    )


def prune_files_range(index: DataFrame, lo, hi) -> DataFrame:
    """Zone-map range pruning -> (file string, may_contain boolean):
    whether each file's [key_min, key_max] overlaps [lo, hi].  Pure
    Catalyst comparisons over the index — no probe pass, no UDF; NULL
    zone bounds (all-null key files) are conservatively kept.
    Requires an index built with ``zone_map=True``."""
    if "key_min" not in index.columns:
        raise ValueError(
            "index has no zone map — build_file_index(..., zone_map=True)"
        )
    overlap = (F.col("key_max") >= F.lit(lo)) & (F.col("key_min") <= F.lit(hi))
    return index.select(
        "file",
        F.coalesce(overlap, F.lit(True)).alias("may_contain"),
    )


def pruned_read_range(
    spark: SparkSession,
    index: DataFrame,
    key_col: str,
    lo,
    hi,
    *,
    schema=None,
) -> DataFrame:
    """Exact ``key_col BETWEEN lo AND hi`` reading ONLY files whose
    zone map overlaps the range — identical results to the full-scan
    filter (zone maps are exact bounds, the residual filter trims the
    partial-overlap files)."""
    kept = [
        r["file"]
        for r in prune_files_range(index, lo, hi)
        .where(F.col("may_contain"))
        .select("file")
        .collect()
    ]
    if not kept:
        if schema is None:
            any_file = index.select("file").first()
            if any_file is None:
                raise ValueError("index is empty")
            schema = spark.read.parquet(any_file["file"]).schema
        return spark.createDataFrame([], schema)
    return spark.read.parquet(*kept).where(
        (F.col(key_col) >= F.lit(lo)) & (F.col(key_col) <= F.lit(hi))
    )


def skipped_file_stats(
    index: DataFrame, config: FilterConfig, values: Sequence
) -> dict:
    """{'total': n_indexed_files, 'kept': n_may_contain} — the skip
    ratio a caller should monitor (kept/total ~ 1.0 means the index
    key or per-file sizing is wrong for this workload)."""
    agg = (
        prune_files(index, config, values)
        .agg(
            F.count("*").alias("total"),
            F.sum(F.col("may_contain").cast("long")).alias("kept"),
        )
        .first()
    )
    return {"total": int(agg["total"]), "kept": int(agg["kept"] or 0)}


def save_file_index(index: DataFrame, path: str, config: FilterConfig) -> None:
    """Persist (parquet index + kind-tagged config.json) through the
    Hadoop FileSystem — same discipline as save_sharded
    (sharded.py:470): any scheme the cluster mounts works."""
    from ..sharded import _hadoop_fs_and_path

    spark = index.sparkSession
    index.write.mode("overwrite").parquet(f"{path}/index")
    payload = json.dumps(
        {"config": config.to_dict(), "kind": "file_index"}
    ).encode()
    fs, cfg_path = _hadoop_fs_and_path(spark, path, "config.json")
    tmp_path = spark._jvm.org.apache.hadoop.fs.Path(path, "config.json.tmp")
    out = fs.create(tmp_path, True)
    try:
        out.write(payload)
    finally:
        out.close()
    # Hadoop FS signals failure by returning false (see save_sharded)
    if fs.exists(cfg_path) and not fs.delete(cfg_path, False):
        raise IOError(f"save_file_index: failed to delete old {cfg_path}")
    if not fs.rename(tmp_path, cfg_path):
        raise IOError(
            f"save_file_index: failed to rename {tmp_path} -> {cfg_path}"
        )


def load_file_index(spark: SparkSession, path: str):
    """-> (index DataFrame, FilterConfig); rejects non-file_index
    artifacts (kind tag), mirroring load_sharded's guard."""
    from ..sharded import _hadoop_fs_and_path

    fs, cfg_path = _hadoop_fs_and_path(spark, path, "config.json")
    stream = fs.open(cfg_path)
    try:
        raw = bytes(
            spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        )
    finally:
        stream.close()
    meta = json.loads(raw.decode("utf-8"))
    if meta.get("kind") != "file_index":
        raise ValueError(f"{path} does not hold a file_index artifact")
    config = FilterConfig.from_dict(meta["config"])
    return spark.read.parquet(f"{path}/index"), config
