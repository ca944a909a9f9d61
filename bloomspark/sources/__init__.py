"""Input sources: the synthetic source-code repository table (the
north-rule input shape), an Iceberg-or-parquet reader seam, and the
Bloom-index data-skipping layer (per-file filters pruning scans)."""

from .codetable import CODE_TABLE_SQL, source_code_table
from .reader import read_table
from .layout import range_cutpoints, repartition_balanced, with_range_bucket
from .skipping import (
    FILE_INDEX_SCHEMA,
    build_file_index,
    load_file_index,
    prune_files,
    prune_files_range,
    pruned_read,
    pruned_read_range,
    save_file_index,
    skipped_file_stats,
    update_file_index,
)

__all__ = [
    "range_cutpoints",
    "with_range_bucket",
    "repartition_balanced",
    "source_code_table",
    "CODE_TABLE_SQL",
    "read_table",
    "FILE_INDEX_SCHEMA",
    "build_file_index",
    "prune_files",
    "prune_files_range",
    "pruned_read",
    "pruned_read_range",
    "skipped_file_stats",
    "save_file_index",
    "load_file_index",
    "update_file_index",
]
