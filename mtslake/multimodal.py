"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` operators.

The decode kernel is REAL for PPM (netpbm P6 — a public, header+raw-RGB
format needing no codec library): ``decode_ppm``/``encode_ppm`` are a
pure-numpy codec, and ``_decode_image_bytes`` routes P6 payloads
through it (resize re-encodes to P6, so a PPM pipeline round-trips
end-to-end). Formats that need external codec libraries (JPEG/PNG/AV)
fall back to a documented deterministic stub — those libs are not in
this container; a Pillow/libav call drops into the same seam. The
Spark-side plumbing — schema, batch iteration, partitioning, vectorized
UDF signature — is identical either way and fully tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("nbytes", T.LongType(), False),
        T.StructField("content_sha1", T.StringType(), False),
        T.StructField("content_md5", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ]
)

_STUBBED = True  # JPEG/PNG/AV decode needs libs absent from this container

_PPM_HEADER_RE = None  # compiled lazily


def decode_ppm(payload: bytes) -> np.ndarray:
    """Pure-numpy decoder for binary PPM (netpbm P6): ASCII header
    ``P6 <w> <h> <maxval>`` then raw interleaved RGB bytes. Returns a
    (height, width, 3) uint8 array."""
    import re

    global _PPM_HEADER_RE
    if _PPM_HEADER_RE is None:
        _PPM_HEADER_RE = re.compile(rb"^P6\s+(\d+)\s+(\d+)\s+(\d+)\s")
    m = _PPM_HEADER_RE.match(payload)
    if not m:
        raise ValueError("not a P6 PPM payload")
    w, h, maxv = (int(g) for g in m.groups())
    if maxv != 255:
        raise ValueError(f"only 8-bit PPM supported (maxval={maxv})")
    if len(payload) - m.end() < w * h * 3:
        raise ValueError("truncated PPM pixel data")
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3,
                       offset=m.end())
    return px.reshape(h, w, 3)


def encode_ppm(arr: np.ndarray) -> bytes:
    """Inverse of ``decode_ppm`` for (h, w, 3) uint8 arrays."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        arr, dtype=np.uint8
    ).tobytes()


def _decode_image_bytes(payload: bytes, width: int, height: int) -> np.ndarray:
    """Decode a payload to a pixel array.

    P6 PPM payloads decode for real (header wins over the meta struct).
    Other formats fall back to the deterministic stub — a seeded
    byte-fold into (height, width) — because their codec libraries are
    not in this container; ``np.asarray(PIL.Image.open(...))`` drops
    into this seam."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if not _STUBBED:  # pragma: no cover
        raise NotImplementedError("non-PPM decoding requires Pillow")
    arr = np.frombuffer(payload, dtype=np.uint8)
    n = max(width * height, 1)
    reps = -(-n // max(arr.size, 1))
    return np.tile(arr, reps)[:n].reshape(max(height, 1), max(width, 1))


def extract_features(media: DataFrame, n_features: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Batch shape: each pandas batch holds whole payloads; kernels are
    vectorized per payload (numpy), never per pixel in Python."""

    def gen(batches):
        for pdf in batches:
            feats, shas, md5s, sizes = [], [], [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                w = int(meta["width"] or 8) if meta is not None else 8
                h = int(meta["height"] or 8) if meta is not None else 8
                img = _decode_image_bytes(payload, w, h).astype(np.float64)
                hist, _ = np.histogram(img, bins=n_features, range=(0, 256))
                tot = max(hist.sum(), 1)
                # float64 on purpose: count/total is an exact double on
                # any engine, so features are oracle-comparable
                feats.append((hist / tot).tolist())
                shas.append(hashlib.sha1(payload).hexdigest())
                md5s.append(hashlib.md5(payload).hexdigest())
                sizes.append(len(payload))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "nbytes": sizes,
                    "content_sha1": shas,
                    "content_md5": md5s,
                    "features": feats,
                }
            )

    return media.mapInPandas(gen, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize over decoded (stub) pixels; returns new
    payload bytes + updated meta. Real pipeline: same shape, Pillow
    kernel."""
    out_schema = MEDIA_SCHEMA

    def gen(batches):
        for pdf in batches:
            payloads, metas = [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                w = int(meta["width"] or 8) if meta is not None else 8
                h = int(meta["height"] or 8) if meta is not None else 8
                img = _decode_image_bytes(payload, w, h)
                yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                small = img[np.ix_(yi, xi)]
                # real-format inputs re-encode to the same format so a
                # PPM pipeline round-trips; stub (2-D) payloads stay raw
                payloads.append(
                    encode_ppm(small) if small.ndim == 3 else small.tobytes()
                )
                metas.append(
                    {"width": out_w, "height": out_h,
                     "sample_rate": None, "n_frames": None}
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return media.mapInPandas(gen, schema=out_schema)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling for video payloads: emit one row per kept frame
    (frame framing is a fixed-size stub: 64-byte frames). ``byte_sum``
    is a frame checksum computed in the kernel — numeric, so the whole
    sampling path is oracle-comparable without binary canonicalization."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), False),
            T.StructField("frame_nbytes", T.IntegerType(), False),
            T.StructField("byte_sum", T.LongType(), False),
        ]
    )
    FRAME = 64

    def gen(batches):
        for pdf in batches:
            ids, idxs, frames, sizes, sums = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n = len(payload) // FRAME
                for i in range(0, n, every_n):
                    fr = payload[i * FRAME:(i + 1) * FRAME]
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(fr)
                    sizes.append(len(fr))
                    sums.append(
                        int(np.frombuffer(fr, dtype=np.uint8).sum())
                    )
            yield pd.DataFrame(
                {
                    "media_id": ids, "frame_idx": idxs, "frame": frames,
                    "frame_nbytes": sizes, "byte_sum": sums,
                }
            )

    return media.mapInPandas(gen, schema=schema)


def synthesize_media(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Deterministic fake media table from documents (no external
    data): payload = text bytes + a length header; meta from n_chars."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            (F.pmod(F.col("n_chars"), 16) + 4).cast("int").alias("width"),
            (F.pmod(F.col("doc_id"), 12) + 4).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def synthesize_ppm_media(docs: DataFrame) -> DataFrame:
    """Deterministic REAL P6 PPM media from documents (no external
    data): pixels are the doc's UTF-8 bytes tiled into (h, w, 3), so
    the payloads exercise the real decode path end-to-end."""
    meta_cols = (
        (F.pmod(F.col("n_chars"), 16) + 4).cast("int").alias("width"),
        (F.pmod(F.col("doc_id"), 12) + 4).cast("int").alias("height"),
    )
    base = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("_txt"),
        *meta_cols,
    )

    def gen(batches):
        for pdf in batches:
            payloads, metas = [], []
            for txt, w, h in zip(pdf["_txt"], pdf["width"], pdf["height"]):
                arr = np.frombuffer(bytes(txt), dtype=np.uint8)
                n = int(w) * int(h) * 3
                reps = -(-n // max(arr.size, 1))
                px = np.tile(arr, reps)[:n].reshape(int(h), int(w), 3)
                payloads.append(encode_ppm(px))
                metas.append(
                    {"width": int(w), "height": int(h),
                     "sample_rate": None, "n_frames": None}
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "image",
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return base.mapInPandas(gen, schema=MEDIA_SCHEMA)
