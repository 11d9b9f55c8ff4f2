"""Upsert/SCD2 merge emulation + target-file-size writer."""

from __future__ import annotations

import datetime as dt
import glob

from pyspark.sql import functions as F

from aws_healthcare_etl_pipeline_spark.operators.scd import scd2_apply, upsert_snapshot
from aws_healthcare_etl_pipeline_spark.sources.filesize import (
    target_file_count,
    write_sized_parquet,
)
from aws_healthcare_etl_pipeline_spark.sources.tables import load_table


def test_upsert_last_writer_wins(spark):
    existing = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "id long, name string, v double"
    )
    updates = spark.createDataFrame(
        [(2, "b2", 99.0), (3, "c", 30.0)], "id long, name string, v double"
    )
    got = {r.id: (r.name, r.v) for r in upsert_snapshot(existing, updates, "id").collect()}
    assert got == {1: ("a", 10.0), 2: ("b2", 99.0), 3: ("c", 30.0)}


def test_scd2_closes_and_appends(spark):
    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 6, 1)
    dim = spark.createDataFrame(
        [
            (1, "alice@a", t0, None, True),
            (2, "bob@b", t0, None, True),
        ],
        "id long, email string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    changes = spark.createDataFrame(
        [(1, "alice@new", t1)], "id long, email string, changed_at timestamp"
    )
    out = scd2_apply(dim, changes, key="id", effective_col="changed_at")
    rows = sorted(
        ((r.id, r.email, r.is_current, r.valid_to) for r in out.collect())
    )
    assert rows == [
        (1, "alice@a", False, t1),       # closed old version
        (1, "alice@new", True, None),    # new current version
        (2, "bob@b", True, None),        # untouched
    ]
    # history preserved on a second change
    t2 = dt.datetime(2024, 9, 1)
    out2 = scd2_apply(
        out, spark.createDataFrame([(1, "alice@3", t2)], "id long, email string, changed_at timestamp"),
        key="id", effective_col="changed_at",
    )
    alice = sorted((r.email, bool(r.is_current)) for r in out2.filter(F.col("id") == 1).collect())
    assert alice == [("alice@3", True), ("alice@a", False), ("alice@new", False)]


def test_write_sized_parquet(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    n = write_sized_parquet(li, str(tmp_path / "out"), target_mb=1, mode="overwrite")
    files = glob.glob(str(tmp_path / "out" / "*.parquet"))
    assert len(files) == n >= 1
    assert spark.read.parquet(str(tmp_path / "out")).count() == li.count()
    # a tiny frame always maps to a single file
    assert target_file_count(li.limit(10), target_mb=128) == 1


def test_clustered_write_prunes(spark, sf_dir, tmp_path):
    """Range-clustered files must expose disjoint min/max key ranges
    (the property min/max pruning relies on); an unclustered control
    write of the same data must not."""
    import pyarrow.parquet as pq
    from aws_healthcare_etl_pipeline_spark.sources.filesize import (
        write_clustered_parquet,
    )

    orders = load_table(spark, sf_dir, "orders")

    def key_ranges(path):
        ranges = []
        for f in sorted(glob.glob(str(path / "*.parquet"))):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index("o_orderkey")
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            ranges.append((min(mins), max(maxs)))
        return sorted(ranges)

    def overlaps(ranges):
        return sum(
            1
            for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:])
            if hi1 >= lo2
        )

    n = write_clustered_parquet(
        orders, str(tmp_path / "clustered"), ["o_orderkey"], num_files=6
    )
    clustered = key_ranges(tmp_path / "clustered")
    assert len(clustered) == n >= 4
    # range partitioning => file key ranges are pairwise disjoint
    assert overlaps(clustered) == 0

    # control: round-robin repartition to the same file count spreads
    # the full key range into every file
    orders.repartition(n).write.mode("overwrite").parquet(
        str(tmp_path / "control")
    )
    control = key_ranges(tmp_path / "control")
    assert overlaps(control) == len(control) - 1  # every file overlaps

    # data integrity
    assert (
        spark.read.parquet(str(tmp_path / "clustered")).count() == orders.count()
    )
