"""Chunk encode/decode — the only Python-executed operators.

Spark shape (SURVEY §3.1): the reference's thread-pool chunk loop
(Writer.compress_batch, mtscomp.py:399-423) becomes

    series → groupBy(url, chunk_id) → applyInPandas(encode) → chunks table

and the read path (Reader.read_chunk, mtscomp.py:602-635) becomes a
shuffle-free ``mapInPandas(decode)`` over pruned chunk rows — each chunk
row is independently addressable and expands to its points without any
repartition.

* chunk identity is the key ``(url, chunk_id = floor(ts_us / dur))``
  (≙ chunk_bounds, mtscomp.py:324-339) — the reference's "write in
  chunk order" barrier (mtscomp.py:473-474) disappears because identity
  lives in keys, not file offsets.
* groups are sorted by ``(ts_us, text_sha1)`` inside the UDF — the codec
  is order-sensitive; the sha1 tiebreak makes duplicate timestamps
  deterministic (web-data reality the reference never faces).
* per-chunk SHA1 of the raw bytes is carried in the row (≙ the .ch
  running sha1 ledger, mtscomp.py:321-322,481-483).
* skew stays bounded: a hot url never forms one giant group because the
  group key includes chunk_id (SURVEY §7 risk 6); AQE handles the rest.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from . import codec
from .config import EngineConfig, DEFAULT
from .series import TS_COL

SHA1_W = 20  # text_sha1 stored as fixed-width 20-byte binary stream

CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("chunk_id", T.LongType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("ts_min", T.LongType(), False),
        T.StructField("ts_max", T.LongType(), False),
        T.StructField("n_points", T.IntegerType(), False),
        T.StructField("raw_nbytes", T.LongType(), False),
        T.StructField("comp_nbytes", T.LongType(), False),
        T.StructField("raw_signal_nbytes", T.LongType(), False),
        T.StructField("comp_signal_nbytes", T.LongType(), False),
        T.StructField("sha1", T.StringType(), False),
        T.StructField("p_ts", T.BinaryType(), False),
        T.StructField("p_n_chars", T.BinaryType(), False),
        T.StructField("p_value", T.BinaryType(), False),
        T.StructField("p_sha1", T.BinaryType(), False),
    ]
)

SERIES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField(TS_COL, T.LongType(), False),
        T.StructField("n_chars", T.LongType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("text_sha1", T.StringType(), False),
    ]
)


def _encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
    # vectorized over the whole chunk; zero per-row Python
    pdf = pdf.sort_values([TS_COL, "text_sha1"], kind="stable")
    ts = pdf[TS_COL].to_numpy(np.int64)
    n_chars = pdf["n_chars"].to_numpy(np.int64)
    value = pdf["value"].to_numpy(np.float64)
    sha_bytes = np.frombuffer(
        b"".join(bytes.fromhex(s) for s in pdf["text_sha1"]), dtype=np.uint8
    )
    p_ts = codec.encode_column(ts, codec.CODEC_DOD)
    p_n_chars = codec.encode_column(n_chars, codec.CODEC_DELTA)
    p_value = codec.encode_column(value, codec.CODEC_XOR)
    p_sha1 = codec.encode_column(sha_bytes, codec.CODEC_RAW)
    # signal streams vs the (incompressible, full-entropy) sha1 ledger
    raw_sig = ts.nbytes + n_chars.nbytes + value.nbytes
    comp_sig = len(p_ts) + len(p_n_chars) + len(p_value)
    raw = raw_sig + sha_bytes.nbytes
    comp = comp_sig + len(p_sha1)
    sha1 = codec.chunk_sha1(ts, {"n_chars": n_chars, "value": value})
    return pd.DataFrame(
        {
            "url": [pdf["url"].iloc[0]],
            "chunk_id": [pdf["chunk_id"].iloc[0]],
            "lang": [pdf["lang"].iloc[0]],
            "ts_min": [int(ts[0])],
            "ts_max": [int(ts[-1])],
            "n_points": [len(ts)],
            "raw_nbytes": [raw],
            "comp_nbytes": [comp],
            "raw_signal_nbytes": [raw_sig],
            "comp_signal_nbytes": [comp_sig],
            "sha1": [sha1],
            "p_ts": [p_ts],
            "p_n_chars": [p_n_chars],
            "p_value": [p_value],
            "p_sha1": [p_sha1],
        }
    )


def compress_series(series: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """series → compressed chunk rows (one row per (url, chunk_id)).

    ≙ Writer.write (mtscomp.py:425-507): the ThreadPool becomes Spark
    tasks; ordering becomes keys. Lazy — caller writes via catalog.
    """
    keyed = series.withColumn(
        "chunk_id", F.floor(F.col(TS_COL) / F.lit(cfg.chunk_duration_us))
    )
    return keyed.groupBy("url", "chunk_id").applyInPandas(
        _encode_group, schema=CHUNK_SCHEMA
    )


def _decode_rows(batches):
    for pdf in batches:
        outs = []
        for row in pdf.itertuples(index=False):  # per-CHUNK, not per-point
            ts = codec.decode_column(row.p_ts)
            n_chars = codec.decode_column(row.p_n_chars)
            value = codec.decode_column(row.p_value)
            sha = codec.decode_column(row.p_sha1).reshape(-1, SHA1_W)
            outs.append(
                pd.DataFrame(
                    {
                        "url": np.repeat(row.url, len(ts)),
                        "lang": np.repeat(row.lang, len(ts)),
                        TS_COL: ts,
                        "n_chars": n_chars,
                        "value": value,
                        "text_sha1": [h.tobytes().hex() for h in sha],
                    }
                )
            )
        if outs:
            yield pd.concat(outs, ignore_index=True)


def decompress_chunks(chunks: DataFrame, verify: bool = False) -> DataFrame:
    """chunk rows → series rows, shuffle-free (mapInPandas).

    ≙ Reader.read_chunk → zlib → frombuffer → cumsum (mtscomp.py:602-635)
    + the parallel bulk path Reader.tofile (mtscomp.py:701-743).
    With verify=True each chunk's raw-byte SHA1 is recomputed and any
    mismatch raises (≙ post-write check, mtscomp.py:866-888: tampering
    must be a hard error, tests.py:345-379).
    """
    cols = [
        "url", "lang", "sha1", "p_ts", "p_n_chars", "p_value", "p_sha1",
    ]
    src = chunks.select(*cols)

    if not verify:
        return src.mapInPandas(_decode_rows, schema=SERIES_SCHEMA)

    def gen_verify(batches):
        for pdf in batches:
            outs = []
            for row in pdf.itertuples(index=False):
                ts = codec.decode_column(row.p_ts)
                n_chars = codec.decode_column(row.p_n_chars)
                value = codec.decode_column(row.p_value)
                got = codec.chunk_sha1(ts, {"n_chars": n_chars, "value": value})
                if got != row.sha1:
                    # ≙ "CRITICAL ERROR" hard failure, mtscomp.py:880-888
                    raise RuntimeError(
                        f"chunk integrity failure url={row.url} "
                        f"expected sha1={row.sha1} got={got}"
                    )
                sha = codec.decode_column(row.p_sha1).reshape(-1, SHA1_W)
                outs.append(
                    pd.DataFrame(
                        {
                            "url": np.repeat(row.url, len(ts)),
                            "lang": np.repeat(row.lang, len(ts)),
                            TS_COL: ts,
                            "n_chars": n_chars,
                            "value": value,
                            "text_sha1": [h.tobytes().hex() for h in sha],
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return src.mapInPandas(gen_verify, schema=SERIES_SCHEMA)
