"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` operators. The image/audio codec libraries are NOT in
this container, so the *decode kernel* is stubbed (deterministic fake
behind ``_decode_image_bytes``; a real Pillow/libav call drops in), but
the Spark-side plumbing — schema, batch iteration, partitioning,
vectorized UDF signature — is real and tested.
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

_STUBBED = True  # no image/audio libs in this container


def _decode_image_bytes(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB: deterministic fake decoder.

    A real deployment replaces this body with e.g.
    ``np.asarray(PIL.Image.open(io.BytesIO(payload)))``. The fake is a
    seeded byte-fold into (height, width) so tests are reproducible.
    """
    if not _STUBBED:  # pragma: no cover
        raise NotImplementedError("real image decoding requires Pillow")
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
                payloads.append(small.tobytes())
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
