"""The __spark_entry__ contract must be self-sufficient: whatever
session the harness provides, the wrapper enforces the confs the
queries depend on (UTC, nanosAsLong, the optimizer-rule exclusion)."""

from __future__ import annotations

import importlib
import sys


def _entry_module():
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as em

    return importlib.reload(em)


def test_wrapper_enforces_confs(spark):
    em = _entry_module()
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    spark.conf.set("spark.sql.optimizer.excludedRules", "")
    try:
        df = em.queries()["ref_golden_daily_counts"](spark, "/root/testdata/sf0.001")
        assert df.count() > 0
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        assert "InferFiltersFromGenerate" in spark.conf.get(
            "spark.sql.optimizer.excludedRules"
        )
        assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_contract_shape(spark):
    em = _entry_module()
    qs, oracles = em.queries(), em.oracle_sql()
    assert len(qs) >= 78
    assert set(oracles) <= set(qs)
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oracles.values())
    # entry() returns the flagship with a stable non-empty schema
    df = em.entry(spark)
    assert df.columns == ["r_name", "revenue", "n_items"]
