"""Assumptions the oracle-parity strategy rests on, asserted so a
fixture regeneration that breaks them fails loudly (see
plans/registry.py docstring).
"""

from __future__ import annotations

import duckdb
import pytest

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
MEASURES = [
    ("lineitem", "l_extendedprice"),
    ("lineitem", "l_quantity"),
    ("lineitem", "l_discount"),
    ("lineitem", "l_tax"),
    ("orders", "o_totalprice"),
    ("customer", "c_acctbal"),
    ("supplier", "s_acctbal"),
    ("part", "p_retailprice"),
    ("events", "value"),
]


@pytest.mark.parametrize("sf", SFS)
def test_measures_are_two_decimal(sf):
    """DECIMAL(15,2) casts are lossless -> exact cross-engine sums."""
    con = duckdb.connect()
    for table, col in MEASURES:
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{sf}/{table}.parquet') "
            f"WHERE abs({col} - round({col}, 2)) > 1e-9"
        ).fetchone()[0]
        assert n == 0, f"{table}.{col} has non-2-decimal values at {sf}"


@pytest.mark.parametrize("sf", SFS)
def test_event_timestamps_are_whole_micros(sf):
    """ns -> us truncation (sources/tables.py) is lossless."""
    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{sf}/events.parquet') "
        "WHERE (epoch_ns(ts) % 1000) <> 0"
    ).fetchone()[0]
    assert n == 0
