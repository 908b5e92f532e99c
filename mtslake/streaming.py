"""Structured Streaming continuous aggregates (SURVEY §2.2: absent in
the reference — batch files only; here the streaming sibling of
rollup.py).

``readStream`` over the pages/series source → watermark on the event
time → tumbling-window aggregation → ``writeStream`` (append/update).
Late data beyond the watermark is dropped by Spark's state cleanup —
the streaming analogue of the retention horizon. State stays bounded:
one (url_prefix, lang, window) group per open window.

Aggregates carry ``(cnt, vmin, vmax, vsum)`` exactly like the batch
tiers, so a streaming 1m tier re-aggregates into batch 1h/1d tiers with
the same bit-exact tier-equality guarantee (decimal sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .config import TIER_US
from .series import url_prefix

TIER_DURATION = {"1m": "1 minute", "1h": "1 hour", "1d": "1 day"}


def streaming_rollup(
    series_stream: DataFrame,
    tier: str = "1m",
    watermark: str = "10 minutes",
) -> DataFrame:
    """series stream (url, ts_us, value, lang) → windowed aggregates.

    Emits the same schema as rollup.rollup_from_series plus nothing —
    ``bucket_us`` is derived from the window start so downstream tier
    re-aggregation is identical for batch and streaming outputs.
    """
    with_ts = series_stream.withColumn(
        "event_ts", F.timestamp_micros(F.col("ts_us"))
    ).withWatermark("event_ts", watermark)
    win = F.window("event_ts", TIER_DURATION[tier])
    return (
        with_ts.select(
            url_prefix(), F.col("lang"), F.col("event_ts"), F.col("value")
        )
        .groupBy("url_prefix", "lang", win.alias("w"))
        .agg(
            F.count("*").alias("cnt"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
            F.sum(F.col("value").cast("decimal(38,18)")).alias("vsum"),
        )
        .select(
            "url_prefix", "lang",
            F.unix_micros(F.col("w.start")).alias("bucket_us"),
            "cnt", "vmin", "vmax",
            F.col("vsum").cast("decimal(38,18)").alias("vsum"),
        )
    )


def run_stream_to_parquet(
    series_stream: DataFrame,
    out_path: str,
    checkpoint_path: str,
    tier: str = "1m",
    watermark: str = "10 minutes",
):
    """writeStream in append mode (finalized windows only) — restarts
    resume from the checkpoint (north_rule: checkpoint-resumable)."""
    rolled = streaming_rollup(series_stream, tier, watermark)
    return (
        rolled.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
    )
