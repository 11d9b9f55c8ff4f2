"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Real image/audio decode libraries are not in this container, so the
decode kernel is a clearly-marked stub (``decode_image_stub`` raises
NotImplementedError unless ``fake=True``, which produces a
deterministic fake decode). Everything around the kernel — the binary
column representation, the metadata struct schema, the Arrow-batched
``mapInPandas`` plumbing, batch shapes, and partitioning — is real and
tested; swapping in Pillow/ffmpeg later changes one inner function.

Scale notes: binary payloads ride in parquet as BYTE_ARRAY; feature
extraction is a narrow mapInPandas pass (no shuffle); Arrow moves
whole batches, so per-row Python overhead is amortized.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

METADATA_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum_md5", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def attach_binary_payload(
    df: DataFrame, source_col: str, fmt: str = "raw/utf-8"
) -> DataFrame:
    """Materialize an opaque ``binary`` payload column + metadata struct.

    In production the payload arrives from the lake (image/audio bytes);
    here it is derived from a text column so the representation and
    downstream plumbing are exercised with fixture data. width/height
    are NULL for non-image formats.
    """
    payload = F.encode(F.col(source_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit(fmt).alias("format"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.md5(payload).alias("checksum_md5"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
        ),
    )


def decode_image_stub(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode kernel placeholder.

    Real implementation needs an image codec (Pillow / libjpeg) that is
    not available in this container. ``fake=True`` returns a
    deterministic 8x8 grayscale 'image' derived from the payload md5 —
    stable across runs/machines, so tests can assert on it.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires a codec library not present in this "
            "environment; pass fake=True for the deterministic test fake"
        )
    digest = hashlib.md5(payload).digest()  # 16 bytes
    arr = np.frombuffer(digest * 4, dtype=np.uint8)  # 64 bytes
    return arr.reshape(8, 8)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("pixels", T.ArrayType(T.IntegerType())),
    ]
)


def resize_images(df: DataFrame, size: tuple[int, int] = (4, 4), id_col: str = "doc_id") -> DataFrame:
    """Resize kernel plumbing (nearest-neighbor on the fake 8x8 decode).

    Swapping the inner `_decode`/`_resize` pair for Pillow calls makes
    this a real image resizer; schema, batching, and partitioning are
    already production-shaped.
    """
    w, h = size

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import numpy as _np
        import pandas as _pd

        def _decode(payload: bytes) -> "_np.ndarray":
            digest = _hashlib.md5(payload).digest()
            return _np.frombuffer(digest * 4, dtype=_np.uint8).reshape(8, 8)

        def _resize(img: "_np.ndarray") -> "_np.ndarray":
            ys = (_np.arange(h) * img.shape[0] // h)
            xs = (_np.arange(w) * img.shape[1] // w)
            return img[_np.ix_(ys, xs)]

        for pdf in it:
            resized = [_resize(_decode(p)) for p in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": w,
                    "height": h,
                    "pixels": [r.ravel().astype("int32") for r in resized],
                }
            )

    return df.select(id_col, "payload").withColumnRenamed(id_col, "doc_id").mapInPandas(
        batches, RESIZE_SCHEMA
    )


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_checksum", T.StringType()),
    ]
)


def sample_frames(df: DataFrame, every_n: int = 4, id_col: str = "doc_id") -> DataFrame:
    """Video frame-sampling plumbing: treat the payload as a frame
    sequence (fake: 16-byte strides of the md5-extended payload), emit
    every ``every_n``-th frame as its own row — the 1:N explode shape a
    real ffmpeg-backed sampler produces.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        out_ids, out_idx, out_ck = [], [], []
        for pdf in it:
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                stream = _hashlib.md5(payload).digest() * 16  # fake 16 frames
                for fi in range(0, 16, every_n):
                    frame = stream[fi * 16 : (fi + 1) * 16]
                    out_ids.append(int(doc_id))
                    out_idx.append(fi)
                    # checksum over (index ':' hex(frame)): hex keeps the
                    # check replicable by SQL engines whose md5() only
                    # accepts strings; the index makes frames distinct
                    # even when the fake decoder repeats payload bytes
                    out_ck.append(
                        _hashlib.md5(f"{fi}:{frame.hex()}".encode()).hexdigest()
                    )
            yield _pd.DataFrame(
                {"doc_id": out_ids, "frame_idx": out_idx, "frame_checksum": out_ck}
            )
            out_ids, out_idx, out_ck = [], [], []

    return df.select(id_col, "payload").withColumnRenamed(id_col, "doc_id").mapInPandas(
        batches, FRAME_SAMPLE_SCHEMA
    )


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: each batch decodes (stub) and emits a small feature
    vector — the canonical shape for any multimodal featurizer (CLIP
    embedding, mel spectrogram, frame sample) once a real codec is
    wired into ``decode_image_stub``.
    """
    id_name = id_col

    # NOTE: the closure must be self-contained (stdlib/numpy/pandas only).
    # Referencing module-level helpers would make cloudpickle serialize
    # them by reference, and Python workers launched outside the repo
    # root could not import this package.
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import numpy as _np
        import pandas as _pd

        def _decode(payload: bytes) -> "_np.ndarray":
            digest = _hashlib.md5(payload).digest()
            return _np.frombuffer(digest * 4, dtype=_np.uint8).reshape(8, 8)

        for pdf in it:
            decoded = [_decode(p) for p in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf[id_name].astype("int64"),
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "mean_intensity": [float(d.mean()) for d in decoded],
                    "feature": [
                        (d.astype("float32").ravel() / 255.0)[:16] for d in decoded
                    ],
                }
            )

    return df.select(id_col, "payload").mapInPandas(batches, FEATURE_SCHEMA)
