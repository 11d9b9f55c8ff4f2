"""Source/sink format coverage beyond the reference's CSV->Parquet pair.

The reference touches exactly two formats (CSV in, Parquet out). A
complete engine also speaks JSON-lines and ORC (both built into Spark),
and can attach JDBC sources; Delta/Iceberg/Hudi need jars not present
in this environment, so their connectors are gated stubs that fail
loudly with guidance rather than at import time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """JSON-lines scan. Pass a schema in production — inference costs a
    full extra pass, exactly like the CSV case."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_jdbc(
    spark: SparkSession, url: str, table: str, properties: dict[str, str] | None = None
) -> DataFrame:
    """JDBC source — requires the driver jar for ``url`` on the
    classpath (none ships in this environment; wiring is standard
    spark.jars config at session build)."""
    return spark.read.jdbc(url, table, properties=properties or {})


_LAKEHOUSE_HINT = (
    "{fmt} requires its runtime jar on the Spark classpath "
    "(spark.jars.packages={pkg}); not available in this environment."
)


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    try:
        return spark.read.format("delta").load(path)
    except Exception as e:  # jar missing -> actionable error
        raise NotImplementedError(
            _LAKEHOUSE_HINT.format(fmt="Delta Lake", pkg="io.delta:delta-spark_2.13")
        ) from e


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    try:
        return spark.read.format("iceberg").load(table)
    except Exception as e:
        raise NotImplementedError(
            _LAKEHOUSE_HINT.format(
                fmt="Apache Iceberg", pkg="org.apache.iceberg:iceberg-spark-runtime"
            )
        ) from e
