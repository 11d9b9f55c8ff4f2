"""SparkSession factory tuned for this engine.

Local mode is the test bed (local[N], one JVM); the config block is
written so the same code lands well on a multi-executor cluster:
AQE on (runtime coalesce + skew-join splitting), shuffle partitions
sized to cores locally (set explicitly on a cluster to ~2-3x total
cores), UTC session timezone so timestamps compare bit-for-bit with
the DuckDB oracle, Arrow enabled for the few Pandas-UDF operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "aws_healthcare_etl_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults.

    Every knob here matters at 100 TB:
      - AQE coalesces post-shuffle partitions to target size and splits
        skewed join partitions at runtime, so a fixed
        ``shuffle.partitions`` doesn't have to be perfect per-query.
      - ``autoBroadcastJoinThreshold`` raised to 64 MB: every dim table
        in a TPC-H-ish star schema broadcast-joins instead of shuffling
        the fact table.
      - ``maxPartitionBytes`` 128 MB keeps scan tasks memory-bounded.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # InferFiltersFromGenerate synthesizes `size(arr) > 0` under
        # every explode(arr); for computed arrays the pushed-down filter
        # re-inlines the ENTIRE array expression (attributes become
        # inline subtrees again), re-evaluating expensive chains per row
        # — winnowing fingerprints went O(len^2) from it. Our exploded
        # arrays are non-empty by construction, so the rule only costs.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
