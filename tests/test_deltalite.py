"""Deltalite transactional-table semantics (sources/deltalite.py):
append/overwrite versioning, time travel, merge, and the crash-safety
invariant (unreferenced data files are invisible to readers)."""

from __future__ import annotations

import os

import pytest

from aws_healthcare_etl_pipeline_spark.sources.deltalite import (
    merge_upsert,
    read_table,
    table_versions,
    write_table,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v string")


def test_versioning_append_overwrite_time_travel(spark, tmp_path):
    path = str(tmp_path / "t1")
    assert write_table(_df(spark, [(1, "a"), (2, "b")]), path) == 0
    assert write_table(_df(spark, [(3, "c")]), path, mode="append") == 1
    assert write_table(_df(spark, [(9, "z")]), path, mode="overwrite") == 2
    assert table_versions(path) == [0, 1, 2]
    assert read_table(spark, path, version=0).count() == 2
    assert read_table(spark, path, version=1).count() == 3
    assert {r.id for r in read_table(spark, path).collect()} == {9}
    with pytest.raises(ValueError):
        read_table(spark, path, version=7)
    with pytest.raises(FileNotFoundError):
        read_table(spark, str(tmp_path / "missing"))


def test_merge_upsert_updates_and_inserts(spark, tmp_path):
    path = str(tmp_path / "t2")
    write_table(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), path)
    v = merge_upsert(spark, path, _df(spark, [(2, "B"), (4, "d")]), "id")
    assert v == 1
    got = {r.id: r.v for r in read_table(spark, path).collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "d"}
    # history untouched (snapshot isolation)
    old = {r.id: r.v for r in read_table(spark, path, version=0).collect()}
    assert old == {1: "a", 2: "b", 3: "c"}


def test_orphan_data_files_are_invisible(spark, tmp_path):
    # a crash after data-file write but before commit leaks a file
    # that no manifest references — readers must not see its rows
    path = str(tmp_path / "t3")
    write_table(_df(spark, [(1, "a")]), path)
    orphan_src = str(tmp_path / "orphan_src")
    _df(spark, [(99, "ghost")]).write.parquet(orphan_src)
    part = next(f for f in os.listdir(orphan_src) if f.endswith(".parquet"))
    os.rename(
        os.path.join(orphan_src, part),
        os.path.join(path, "part-deadbeefdeadbeef.parquet"),
    )
    assert {r.id for r in read_table(spark, path).collect()} == {1}
