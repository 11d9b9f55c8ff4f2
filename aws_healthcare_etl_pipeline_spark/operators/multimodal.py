"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

The decode kernel (``decode_image``) has REAL pure-Python paths for
binary PNM (P5/P6) and uncompressed 24-bit BMP — codec-free formats
whose specs fit in a page — and raises ValueError for formats that
genuinely need a codec library (JPEG/PNG/WebP, not in this container).
``fake=True`` keeps the deterministic md5-derived 8x8 decode that the
fixture-facing oracles are built on. Everything around the kernel —
the binary column representation, the metadata struct schema, the
Arrow-batched ``mapInPandas`` plumbing, batch shapes, and partitioning
— is shared by both paths; swapping in Pillow/ffmpeg later changes one
inner function.

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


def _decode_pnm(data: bytes) -> np.ndarray:
    """Pure-Python binary PNM decode: P5 (grayscale) -> (h, w) uint8,
    P6 (RGB) -> (h, w, 3) uint8. maxval must be <= 255 (the 8-bit
    variant; 16-bit PNM is rare and out of contract)."""
    pos = 2

    def tok(p: int) -> tuple[int, int]:
        while True:
            while p < len(data) and data[p : p + 1].isspace():
                p += 1
            if p < len(data) and data[p : p + 1] == b"#":
                while p < len(data) and data[p : p + 1] != b"\n":
                    p += 1
                continue
            break
        s = p
        while p < len(data) and not data[p : p + 1].isspace():
            p += 1
        return int(data[s:p]), p

    w, pos = tok(pos)
    h, pos = tok(pos)
    maxval, pos = tok(pos)
    if maxval > 255:
        raise ValueError(f"PNM maxval {maxval} > 255 not supported")
    pos += 1  # exactly one whitespace byte separates header from raster
    ch = 3 if data[:2] == b"P6" else 1
    arr = np.frombuffer(data, dtype=np.uint8, count=w * h * ch, offset=pos)
    return arr.reshape(h, w, 3) if ch == 3 else arr.reshape(h, w)


def _decode_bmp(data: bytes) -> np.ndarray:
    """Pure-Python BMP decode: uncompressed (BI_RGB) 24-bit with a
    BITMAPINFOHEADER -> (h, w, 3) uint8 RGB. Handles 4-byte row
    padding and both bottom-up (h > 0) and top-down (h < 0) rasters."""
    import struct

    off = struct.unpack_from("<I", data, 10)[0]
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    comp = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bit BI_RGB BMP supported (bpp={bpp}, comp={comp})")
    row_size = (w * 3 + 3) // 4 * 4
    h_abs = abs(h)
    rows = [
        np.frombuffer(data, np.uint8, count=w * 3, offset=off + r * row_size)
        .reshape(w, 3)[:, ::-1]  # stored BGR -> RGB
        for r in range(h_abs)
    ]
    img = np.stack(rows)
    return img[::-1] if h > 0 else img  # bottom-up raster unless h < 0


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to a uint8 ndarray.

    Real paths (r4, replacing the r1-r3 NotImplementedError stub) are
    pure-Python/numpy decoders for the container's codec-free world:
    binary PNM (P5 grayscale / P6 RGB) and uncompressed 24-bit BMP —
    formats whose specs are trivial enough to implement exactly. JPEG/
    PNG/WebP still need a codec library and raise ValueError with an
    actionable message. ``fake=True`` keeps the deterministic 8x8
    'image' derived from the payload md5 — stable across runs and
    engines, so fixture-facing oracles are unchanged.
    """
    if fake:
        digest = hashlib.md5(payload).digest()  # 16 bytes
        return np.frombuffer(digest * 4, dtype=np.uint8).reshape(8, 8)
    if payload[:2] in (b"P5", b"P6"):
        return _decode_pnm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    raise ValueError(
        "unsupported image format (magic %r): real decode covers binary "
        "PNM (P5/P6) and 24-bit BI_RGB BMP; JPEG/PNG need a codec "
        "library not present in this environment — or pass fake=True "
        "for the deterministic test fake" % payload[:2]
    )


# Back-compat name from rounds 1-3 (operators/__init__ re-export).
decode_image_stub = decode_image


def encode_ppm(img: np.ndarray) -> bytes:
    """Binary P6 (RGB, (h, w, 3)) or P5 (grayscale, (h, w)) encoder —
    the test-side counterpart of ``decode_image``'s real path."""
    a = np.asarray(img, dtype=np.uint8)
    magic = b"P6" if a.ndim == 3 else b"P5"
    h, w = a.shape[0], a.shape[1]
    return magic + b"\n%d %d\n255\n" % (w, h) + a.tobytes()


def encode_bmp(img: np.ndarray) -> bytes:
    """Minimal 24-bit BI_RGB BMP encoder (bottom-up raster, padded
    rows) for an (h, w, 3) uint8 RGB array."""
    import struct

    a = np.asarray(img, dtype=np.uint8)
    h, w = a.shape[0], a.shape[1]
    row_size = (w * 3 + 3) // 4 * 4
    raster = b"".join(
        a[r, :, ::-1].tobytes() + b"\x00" * (row_size - w * 3)
        for r in range(h - 1, -1, -1)  # bottom-up
    )
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(raster), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    return header + info + raster


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


def extract_features(
    df: DataFrame, id_col: str = "doc_id", fake: bool = True
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: each batch decodes and emits a small feature vector —
    the canonical shape for any multimodal featurizer (CLIP embedding,
    mel spectrogram, frame sample). ``fake=True`` (default) keeps the
    deterministic md5-derived 8x8 decode the fixture oracles are built
    on; ``fake=False`` runs the REAL pure-Python decode for binary PNM
    (P5/P6) and 24-bit BMP payloads (see ``decode_image``) — color
    images are collapsed to grayscale by channel mean before the
    intensity/feature math, the standard luma-less reduction.
    """
    id_name = id_col
    use_fake = fake

    # NOTE: the closure must be self-contained (stdlib/numpy/pandas only).
    # Referencing module-level helpers would make cloudpickle serialize
    # them by reference, and Python workers launched outside the repo
    # root could not import this package — hence the real decoders are
    # REPEATED here inline (source of truth: decode_image above).
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib
        import struct as _struct

        import numpy as _np
        import pandas as _pd

        def _decode(payload: bytes) -> "_np.ndarray":
            if use_fake:
                digest = _hashlib.md5(payload).digest()
                return _np.frombuffer(digest * 4, dtype=_np.uint8).reshape(8, 8)
            if payload[:2] in (b"P5", b"P6"):
                p = 2

                def tok(p: int) -> tuple[int, int]:
                    while True:
                        while p < len(payload) and payload[p : p + 1].isspace():
                            p += 1
                        if p < len(payload) and payload[p : p + 1] == b"#":
                            while p < len(payload) and payload[p : p + 1] != b"\n":
                                p += 1
                            continue
                        break
                    s = p
                    while p < len(payload) and not payload[p : p + 1].isspace():
                        p += 1
                    return int(payload[s:p]), p

                w, p = tok(p)
                h, p = tok(p)
                maxval, p = tok(p)
                if maxval > 255:
                    raise ValueError(f"PNM maxval {maxval} > 255 not supported")
                p += 1
                ch = 3 if payload[:2] == b"P6" else 1
                arr = _np.frombuffer(payload, _np.uint8, count=w * h * ch, offset=p)
                img = arr.reshape(h, w, 3) if ch == 3 else arr.reshape(h, w)
            elif payload[:2] == b"BM":
                off = _struct.unpack_from("<I", payload, 10)[0]
                w, h = _struct.unpack_from("<ii", payload, 18)
                bpp = _struct.unpack_from("<H", payload, 28)[0]
                comp = _struct.unpack_from("<I", payload, 30)[0]
                if bpp != 24 or comp != 0:
                    raise ValueError(
                        "only 24-bit BI_RGB BMP supported "
                        f"(bpp={bpp}, comp={comp})"
                    )
                rs = (w * 3 + 3) // 4 * 4
                rows = [
                    _np.frombuffer(payload, _np.uint8, count=w * 3, offset=off + r * rs)
                    .reshape(w, 3)[:, ::-1]
                    for r in range(abs(h))
                ]
                img = _np.stack(rows)
                img = img[::-1] if h > 0 else img
            else:
                raise ValueError(f"unsupported image magic {payload[:2]!r}")
            if img.ndim == 3:  # grayscale by channel mean
                img = img.astype("float64").mean(axis=2)
            return img

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


PHASH_SCHEMA = "doc_id long, phash long"
PHASH_BITS = 60  # int64-portable, same rationale as PORTABLE_SIMHASH_BITS


def perceptual_hash(
    df: DataFrame, id_col: str = "doc_id", fake: bool = True
) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprint over binary payloads.

    mapInPandas lane: decode -> 8x8 grid -> one bit per cell, set iff
    the cell exceeds the image mean; the first ``PHASH_BITS`` cells
    (row-major) pack into an int64. ``fake=True`` uses the
    deterministic md5-derived 8x8 decode (pixels = digest bytes
    repeated 4x), with the threshold kept in EXACT integers
    (``pixel * 64 > sum(pixels)``) so an external SQL engine can
    recompute the hash bit-for-bit. ``fake=False`` decodes real
    PNM/BMP payloads and mean-pools floor-cropped 8x8 blocks (images
    must be >= 8px each side).
    """
    id_name = id_col
    use_fake = fake

    # NOTE: self-contained closure (see extract_features NOTE); the
    # real decoder is an inline copy — source of truth: decode_image,
    # equality pinned by tests/test_catalog_multimodal.py.
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib
        import struct as _struct

        import numpy as _np
        import pandas as _pd

        def _decode(payload: bytes) -> "_np.ndarray":
            if payload[:2] in (b"P5", b"P6"):
                p = 2

                def tok(p: int) -> tuple[int, int]:
                    while True:
                        while p < len(payload) and payload[p : p + 1].isspace():
                            p += 1
                        if p < len(payload) and payload[p : p + 1] == b"#":
                            while p < len(payload) and payload[p : p + 1] != b"\n":
                                p += 1
                            continue
                        break
                    s = p
                    while p < len(payload) and not payload[p : p + 1].isspace():
                        p += 1
                    return int(payload[s:p]), p

                w, p = tok(p)
                h, p = tok(p)
                maxval, p = tok(p)
                if maxval > 255:
                    raise ValueError(f"PNM maxval {maxval} > 255 not supported")
                p += 1
                ch = 3 if payload[:2] == b"P6" else 1
                arr = _np.frombuffer(payload, _np.uint8, count=w * h * ch, offset=p)
                img = arr.reshape(h, w, 3) if ch == 3 else arr.reshape(h, w)
            elif payload[:2] == b"BM":
                off = _struct.unpack_from("<I", payload, 10)[0]
                w, h = _struct.unpack_from("<ii", payload, 18)
                bpp = _struct.unpack_from("<H", payload, 28)[0]
                comp = _struct.unpack_from("<I", payload, 30)[0]
                if bpp != 24 or comp != 0:
                    raise ValueError(
                        "only 24-bit BI_RGB BMP supported "
                        f"(bpp={bpp}, comp={comp})"
                    )
                rs = (w * 3 + 3) // 4 * 4
                rows = [
                    _np.frombuffer(payload, _np.uint8, count=w * 3, offset=off + r * rs)
                    .reshape(w, 3)[:, ::-1]
                    for r in range(abs(h))
                ]
                img = _np.stack(rows)
                img = img[::-1] if h > 0 else img
            else:
                raise ValueError(f"unsupported image magic {payload[:2]!r}")
            if img.ndim == 3:
                img = img.astype("float64").mean(axis=2)
            return img

        def _phash(payload: bytes) -> int:
            if use_fake:
                pixels = list(_hashlib.md5(payload).digest()) * 4
                total = sum(pixels)  # == 64 * mean, kept exact
                h = 0
                for j in range(60):
                    if pixels[j] * 64 > total:
                        h |= 1 << j
                return h
            img = _decode(payload).astype("float64")
            ih, iw = img.shape
            if ih < 8 or iw < 8:
                raise ValueError(f"image {ih}x{iw} too small for phash")
            h8, w8 = ih // 8 * 8, iw // 8 * 8
            blocks = img[:h8, :w8].reshape(8, h8 // 8, 8, w8 // 8).mean(axis=(1, 3))
            flat = blocks.ravel()
            mean = flat.mean()
            h = 0
            for j in range(60):
                if flat[j] > mean:
                    h |= 1 << j
            return h

        for pdf in it:
            yield _pd.DataFrame(
                {
                    "doc_id": pdf[id_name].astype("int64"),
                    "phash": [_phash(p) for p in pdf["payload"]],
                }
            )

    return (
        df.select(id_col, "payload")
        .withColumnRenamed(id_col, "doc_id")
        .mapInPandas(batches, PHASH_SCHEMA)
    )
