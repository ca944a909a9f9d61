"""Input sources: the synthetic source-code repository table (the
north-rule input shape) and an Iceberg-or-parquet reader seam."""

from .codetable import CODE_TABLE_SQL, source_code_table
from .reader import read_table

__all__ = ["source_code_table", "CODE_TABLE_SQL", "read_table"]
