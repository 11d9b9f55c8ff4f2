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


def test_vacuum_removes_only_orphans(spark, tmp_path):
    from aws_healthcare_etl_pipeline_spark.sources.deltalite import vacuum

    path = str(tmp_path / "t4")
    write_table(_df(spark, [(1, "a")]), path)
    write_table(_df(spark, [(2, "b")]), path, mode="append")
    orphan_src = str(tmp_path / "o_src")
    _df(spark, [(99, "ghost")]).write.parquet(orphan_src)
    part = next(f for f in os.listdir(orphan_src) if f.endswith(".parquet"))
    os.rename(
        os.path.join(orphan_src, part),
        os.path.join(path, "part-0rphan0rphan0rph.parquet"),
    )
    # retention guard: the orphan is younger than the cutoff -> kept
    assert vacuum(path) == []
    # retention_seconds=0 = "no writer running" -> orphan removed
    deleted = vacuum(path, retention_seconds=0)
    assert deleted == ["part-0rphan0rphan0rph.parquet"]
    # both versions still fully readable (time travel intact)
    assert read_table(spark, path, version=0).count() == 1
    assert read_table(spark, path, version=1).count() == 2


def test_compact_preserves_results(spark, tmp_path):
    from aws_healthcare_etl_pipeline_spark.sources.deltalite import compact

    path = str(tmp_path / "t5")
    for i in range(4):  # four tiny appends -> many small files
        write_table(
            _df(spark, [(i, f"v{i}")]), path,
            mode="append" if i else "overwrite",
        )
    before = {(r.id, r.v) for r in read_table(spark, path).collect()}
    v = compact(spark, path, target_files=1)
    assert {(r.id, r.v) for r in read_table(spark, path).collect()} == before
    # compacted snapshot has exactly 1 file; history keeps its files
    from aws_healthcare_etl_pipeline_spark.sources.deltalite import (
        _read_manifest,
    )

    assert len(_read_manifest(path, v)["files"]) == 1
    assert read_table(spark, path, version=3).count() == 4


def test_schema_evolution_append(spark, tmp_path):
    from aws_healthcare_etl_pipeline_spark.sources.deltalite import (
        append_evolved,
    )

    path = str(tmp_path / "t6")
    write_table(_df(spark, [(1, "a")]), path)
    evolved = spark.createDataFrame(
        [(2, "b", 7.5)], "id long, v string, score double"
    )
    append_evolved(spark, path, evolved)
    rows = {r.id: (r.v, r.score) for r in read_table(spark, path).collect()}
    assert rows == {1: ("a", None), 2: ("b", 7.5)}
