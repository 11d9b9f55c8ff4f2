"""Catalog registration (crawler replacement) + multimodal plumbing."""

from __future__ import annotations

import pytest

from aws_healthcare_etl_pipeline_spark.operators.multimodal import (
    attach_binary_payload,
    decode_image_stub,
    extract_features,
)
from aws_healthcare_etl_pipeline_spark.sources.catalog import (
    refresh_partitions,
    register_parquet_table,
)
from aws_healthcare_etl_pipeline_spark.sources.csv_ingest import IngestConfig, ingest_csv


def test_catalog_register_and_recover(spark, tmp_path):
    raw = tmp_path / "raw"
    (raw / "incoming").mkdir(parents=True)
    (raw / "incoming" / "a.csv").write_text("id,v\n1,10\n2,20\n")
    curated = tmp_path / "curated"

    cfg = IngestConfig(raw_root=str(raw), curated_root=str(curated), ingest_date="2026-06-01")
    ingest_csv(spark, cfg)

    fq = register_parquet_table(
        spark, "etl_test_db", "curated_events", cfg.output_path
    )
    assert spark.table(fq).count() == 2

    # new partition lands -> recoverPartitions picks it up (MSCK parity,
    # replaces the 15-min crawler cadence main.tf:203)
    cfg2 = IngestConfig(raw_root=str(raw), curated_root=str(curated), ingest_date="2026-06-02")
    ingest_csv(spark, cfg2)
    refresh_partitions(spark, fq)
    assert spark.table(fq).count() == 4
    parts = {r.ingest_date for r in spark.table(fq).select("ingest_date").distinct().collect()}
    assert parts == {"2026-06-01", "2026-06-02"}
    spark.sql(f"DROP TABLE {fq}")
    spark.sql("DROP DATABASE etl_test_db")


def test_decode_stub_contract():
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"payload")
    img = decode_image_stub(b"payload", fake=True)
    assert img.shape == (8, 8)
    # deterministic across calls
    assert (img == decode_image_stub(b"payload", fake=True)).all()


def test_binary_payload_and_features(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "spark engine")], "doc_id long, text string"
    )
    wp = attach_binary_payload(df, "text")
    meta = {r.doc_id: r.media_meta for r in wp.collect()}
    assert meta[1].n_bytes == len(b"hello world")
    assert meta[1].format == "raw/utf-8"
    assert len(meta[1].checksum_md5) == 32

    feats = {r.doc_id: r for r in extract_features(wp).collect()}
    assert feats[1].n_bytes == 11
    assert len(feats[1].feature) == 16
    assert all(0.0 <= x <= 1.0 for x in feats[1].feature)
    # deterministic fake decode -> stable mean intensity
    again = {r.doc_id: r.mean_intensity for r in extract_features(wp).collect()}
    assert again[1] == feats[1].mean_intensity
