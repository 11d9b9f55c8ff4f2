"""MERGE / CDC emulation without a lakehouse format (SURVEY.md guide:
"CDC / SCD2 -> MERGE INTO needs Delta; emulate with anti-join + union
+ window").

Parquet has no row-level transactions, so merge = rewrite-the-snapshot:
  upsert      : updates ∪ (existing ⟕anti updates)  — last-writer-wins
  scd2_apply  : slowly-changing-dimension type 2 — close the current
                version of changed keys, append the new version, keep
                full history with validity ranges.

At 100 TB the rewrite is bounded by partitioning: merge per partition
(dynamic partition overwrite) so only touched partitions rewrite. With
Delta/Iceberg jars present, swap these for native MERGE INTO — the
gated stubs in sources/formats.py mark the seam.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert_snapshot(existing: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Last-writer-wins merge: every key in ``updates`` replaces its
    row in ``existing``; new keys append. Columns must match."""
    kept = existing.join(updates.select(key), key, "left_anti")
    return kept.unionByName(updates)


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    effective_col: str,
    current_flag: str = "is_current",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Type-2 slowly-changing dimension application.

    ``dim`` columns: business cols + [valid_from, valid_to, is_current];
    ``changes`` columns: business cols + effective_col (change time).
    Current rows of changed keys are closed (valid_to = change time,
    is_current = false); new versions append open-ended.
    """
    change_times = changes.select(
        F.col(key).alias("__k"), F.col(effective_col).alias("__eff")
    )
    # close current versions of changed keys
    closed = (
        dim.join(change_times, (F.col(key) == F.col("__k")) & F.col(current_flag), "inner")
        .withColumn(valid_to, F.col("__eff"))
        .withColumn(current_flag, F.lit(False))
        .drop("__k", "__eff")
    )
    untouched = dim.join(
        change_times.where(F.lit(True)).select("__k"),
        (F.col(key) == F.col("__k")),
        "left_anti",
    )
    still_current_history = (
        dim.join(change_times, (F.col(key) == F.col("__k")), "inner")
        .filter(~F.col(current_flag))
        .drop("__k", "__eff")
    )
    new_versions = (
        changes.withColumn(valid_from, F.col(effective_col))
        .withColumn(valid_to, F.lit(None).cast(dim.schema[valid_to].dataType))
        .withColumn(current_flag, F.lit(True))
        .drop(effective_col)
    )
    return (
        untouched.unionByName(still_current_history)
        .unionByName(closed)
        .unionByName(new_versions.select(untouched.columns))
    )
