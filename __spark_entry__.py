"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``aws_healthcare_etl_pipeline_spark.plans.REGISTRY``:
every implemented operator from SURVEY.md §2 is a named query; those
with SQL-expressible semantics carry a DuckDB oracle string.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from aws_healthcare_etl_pipeline_spark.plans import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the 5-table star join
    (lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region → revenue/region)."""
    return REGISTRY["q5_region_revenue"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented query/operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; non-SQL-expressible ops
    (LSH dedup/ANN, mapInPandas featurization) are omitted -> the
    driver applies its rows-only check."""
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
