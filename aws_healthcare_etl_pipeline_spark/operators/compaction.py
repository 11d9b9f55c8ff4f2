"""Small-file compaction: the table-maintenance half of a lakehouse
writer. Streaming ingest and per-partition appends leave thousands of
tiny files; every reader then pays one task + one footer fetch per
file. Compaction rewrites a directory to ~target-sized files.

Sizing is driven by the ACTUAL on-disk bytes (driver-side directory
listing — metadata only, no data read), not a guessed row count, so
it adapts to compression ratios. The rewrite itself is one
`repartition(n)` round-robin shuffle — at 100 TB you compact
partition-by-partition (the per-call unit here IS one directory /
hive partition), never the whole table in one job.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def directory_bytes(path: str) -> int:
    """Total bytes of data files under ``path`` (driver-side listing)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def data_file_count(path: str) -> int:
    n = 0
    for root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def compact_parquet_dir(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    n_files: int | None = None,
) -> int:
    """Rewrite ``src`` parquet into ``dst`` as ``ceil(bytes/target)``
    files (or an explicit ``n_files``). Returns the file count used.

    Writes to a NEW directory rather than in place: an in-place
    rewrite that fails mid-way loses data; swap-on-success is the
    caller's transaction (at real scale this is the commit protocol a
    table format provides)."""
    if n_files is None:
        n_files = max(1, math.ceil(directory_bytes(src) / target_bytes))
    df = spark.read.parquet(src)
    df.repartition(n_files).write.mode("overwrite").parquet(dst)
    return n_files
