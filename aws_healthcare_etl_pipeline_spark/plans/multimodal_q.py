"""Multimodal-column queries (SURVEY.md §2.8): binary payload columns
with typed metadata, and Arrow-batched feature extraction.

``multimodal_payload_stats`` is fully oracle-checked (byte lengths and
md5 checksums are engine-portable). ``multimodal_features`` exercises
the mapInPandas decode/feature plumbing with the deterministic fake
decoder (rows-only check; pytest asserts the feature values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import attach_binary_payload, extract_features
from ..sources.tables import load_table
from .registry import query


@query(
    "multimodal_payload_stats",
    oracle="""
        SELECT source,
               COUNT(*) AS n_docs,
               SUM(octet_length(encode(text))) AS total_bytes,
               MIN(md5(text)) AS min_checksum,
               MAX(md5(text)) AS max_checksum
        FROM documents
        GROUP BY source
        ORDER BY source
    """,
    description="Binary payload representation: per-source byte totals + "
    "checksum extrema over the payload column.",
)
def multimodal_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    with_payload = attach_binary_payload(docs, "text")
    return (
        with_payload.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("media_meta.n_bytes")).alias("total_bytes"),
            F.min(F.col("media_meta.checksum_md5")).alias("min_checksum"),
            F.max(F.col("media_meta.checksum_md5")).alias("max_checksum"),
        )
        .orderBy("source")
    )


@query(
    "multimodal_feature_extract",
    description="mapInPandas feature extraction over binary payloads "
    "(deterministic fake decode kernel; real codec is a drop-in).",
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    with_payload = attach_binary_payload(docs, "text")
    feats = extract_features(with_payload, id_col="doc_id")
    return feats.select(
        "doc_id",
        "n_bytes",
        F.round("mean_intensity", 6).alias("mean_intensity"),
        F.size("feature").alias("feature_dim"),
    ).orderBy("doc_id")


@query(
    "multimodal_resize_stats",
    description="Resize-kernel plumbing over binary payloads (nearest-"
    "neighbor on the deterministic fake decode).",
)
def multimodal_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import resize_images

    docs = load_table(spark, sf_dir, "documents")
    with_payload = attach_binary_payload(docs, "text")
    resized = resize_images(with_payload, size=(4, 4))
    return resized.select(
        "doc_id", "width", "height", F.size("pixels").alias("n_pixels")
    ).orderBy("doc_id")


@query(
    "multimodal_frame_sample",
    description="Video frame-sampling plumbing: 1:N explode of sampled "
    "frames with per-frame checksums (fake 16-frame stream).",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents")
    with_payload = attach_binary_payload(docs, "text")
    frames = sample_frames(with_payload, every_n=4)
    return frames.orderBy("doc_id", "frame_idx")
