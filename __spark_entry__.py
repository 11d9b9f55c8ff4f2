"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``aws_healthcare_etl_pipeline_spark.plans.REGISTRY``:
every implemented operator from SURVEY.md §2 is a named query; those
with SQL-expressible semantics carry a DuckDB oracle string.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the engine package lives next to this file; make the import robust to
# however the harness loads this module (file-path import, foreign cwd)
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from aws_healthcare_etl_pipeline_spark.plans import REGISTRY  # noqa: E402

# Runtime confs the queries depend on, applied to WHATEVER session the
# driver hands us (it builds its own, not ours from session.py):
#  - UTC: timestamp/date values must match the DuckDB oracle bit-for-bit
#  - nanosAsLong: events.parquet is TIMESTAMP(NANOS), unreadable otherwise
#  - excludedRules: InferFiltersFromGenerate re-inlines computed arrays
#    under explode (see SCALE.md "Planner-level traps") — quadratic
#    blowup for the winnowing/LSH/minhash queries
_REQUIRED_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.optimizer.excludedRules": (
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    ),
}


def _prepared(spark: SparkSession) -> SparkSession:
    for k, v in _REQUIRED_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # diagnosed by the read-back below, with a clear message
    # Verify every required conf actually took effect: a session that
    # locks e.g. nanosAsLong would otherwise fail much later with an
    # opaque parquet/hash error on every events-table query.
    problems = []
    for k, v in _REQUIRED_CONFS.items():
        try:
            got = spark.conf.get(k, None)
        except Exception:
            got = None
        if got != v:
            problems.append(f"{k}={got!r} (need {v!r})")
    if problems:
        raise RuntimeError(
            "session confs required by this engine could not be applied: "
            + "; ".join(problems)
            + ". events.parquet is TIMESTAMP(NANOS) and the oracle compare "
            "is UTC-pinned — these confs must be settable on the session."
        )
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the 5-table star join
    (lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region → revenue/region)."""
    return REGISTRY["q5_region_revenue"].fn(_prepared(spark), "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented query/operator from SURVEY.md §2."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(_prepared(spark), sf_dir)

        return run

    return {name: wrap(spec.fn) for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; non-SQL-expressible ops
    (LSH dedup/ANN, mapInPandas featurization) are omitted -> the
    driver applies its rows-only check."""
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
