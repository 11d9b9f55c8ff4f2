"""Adaptive parallelism widening for CPU-heavy per-row operators.

Parquet splits cannot be finer than row groups: a source written as one
big row group scans as ONE task no matter what
``spark.sql.files.maxPartitionBytes`` says, serializing whatever
projection sits on top of it. That is exactly the wrong shape for the
compute-dominated operators (minhash signatures, shingling, winnowing,
feature kernels), whose cost is per-row work, not IO.

``widen`` redistributes ONLY when the current plan's partition count is
materially below the session's parallelism — on a production multi-file
scan (the 100 TB case) the scan is already wide and this is a no-op, so
the big-data path never pays the extra shuffle; on a coarse-grained
source the shuffled bytes are by construction small (few splits ->
small input).

Hash-partitioning on the caller's key keeps the redistribution
deterministic (round-robin repartition is retry-order-sensitive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def widen(df: DataFrame, key: str, min_parts: int | None = None) -> DataFrame:
    """Repartition ``df`` by ``key`` iff its current partitioning is
    narrower than half the session's default parallelism.

    Two-tier introspection, cheapest first: ``inputFiles()`` (a file-
    index listing, ~30ms) proves a multi-file scan wide with no plan
    compilation — the production 100 TB path exits here. Only a few-
    files source pays the precise ``df.rdd`` partition count (a full
    physical-plan compile, ~0.1-0.5s) to distinguish one-file-many-
    row-groups (already parallel) from one-row-group (serialized).
    """
    spark = df.sparkSession
    target = min_parts or spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if len(files) * 2 >= target:
        return df
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        return df  # streaming/unresolvable plans: leave untouched
    if current * 2 >= target:
        return df
    return df.repartition(target, F.col(key))
