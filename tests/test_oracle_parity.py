"""The local replica of the driver's correctness gate: every registered
query with an oracle must match DuckDB exactly (values, not epsilon) at
sf0.001. Queries without an oracle must at least run and return a
stable schema.
"""

from __future__ import annotations

import pytest

from aws_healthcare_etl_pipeline_spark.plans import REGISTRY

from .oracle_compare import compare_frames

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle)
NO_ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, duck, sf_dir, name):
    spec = REGISTRY[name]
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    duck_pdf = duck.execute(spec.oracle).fetchdf()
    problems = compare_frames(spark_pdf, duck_pdf, name)
    assert not problems, "\n".join(problems[:10])


@pytest.mark.parametrize("name", NO_ORACLE_QUERIES)
def test_rows_only_runs(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert df.columns, f"{name}: empty schema"
    assert df.count() >= 0
