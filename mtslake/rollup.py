"""Continuous aggregates: 1m/1h/1d tumbling rollups (north_rule).

The reference has no aggregation beyond metadata stats (SURVEY §2.2);
this is the lakehouse generalization. All Spark built-ins — hash
aggregation with map-side partial aggregation, whole-stage codegen, AQE
coalescing. No Python.

Invariant (SURVEY §7 risk 4): tiers carry ``(cnt, vmin, vmax, vsum)``
— never a mean — so every tier re-aggregates EXACTLY from the tier
below (sum of sums, min of mins): rollup_1d(raw) ≡ rollup_1d(rollup_1h(
rollup_1m(raw))). ``vmean = vsum/cnt`` is derived at query time.

``vsum`` is ``DECIMAL(38,18)``: double sums are not associative, so a
re-aggregated double sum would differ in the last bits from a direct
sum and break the north_rule's "rolled-up points identical at every
tier". Decimal addition is exact and order-independent — tier equality
holds bit-for-bit at any shuffle layout. (38,18) leaves 20 integer
digits: safe headroom for |v|≲10³ over 10¹² rows.

Grouping key: (url_prefix = host, lang, tumbling bucket) — via
``date_trunc``, which is also how the DuckDB oracle expresses it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .series import TS_COL, url_prefix

TIER_TRUNC = {"1m": "minute", "1h": "hour", "1d": "day"}
# finer -> coarser re-aggregation order
TIER_BELOW = {"1h": "1m", "1d": "1h"}

AGG_COLS = ["cnt", "vmin", "vmax", "vsum"]


def rollup_from_series(series: DataFrame, tier: str) -> DataFrame:
    """raw (url, ts_us, value, lang) → tier aggregates."""
    bucket = F.date_trunc(TIER_TRUNC[tier], F.timestamp_micros(F.col(TS_COL)))
    return (
        series.select(
            url_prefix(), F.col("lang"), bucket.alias("bucket_ts"), F.col("value")
        )
        .groupBy("url_prefix", "lang", "bucket_ts")
        .agg(
            F.count("*").alias("cnt"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
            F.sum(F.col("value").cast("decimal(38,18)")).alias("vsum"),
        )
        .withColumn("vsum", F.col("vsum").cast("decimal(38,18)"))
    )


def rollup_from_tier(lower: DataFrame, tier: str) -> DataFrame:
    """tier-from-tier re-aggregation — exact because partial aggregates
    compose (Spark's own partial+final aggregation, made durable)."""
    bucket = F.date_trunc(TIER_TRUNC[tier], F.col("bucket_ts"))
    return (
        lower.groupBy("url_prefix", "lang", bucket.alias("bucket_ts"))
        .agg(
            F.sum("cnt").alias("cnt"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
            F.sum("vsum").alias("vsum"),
        )
        .withColumn("vsum", F.col("vsum").cast("decimal(38,18)"))
    )


def with_mean(rolled: DataFrame) -> DataFrame:
    return rolled.withColumn(
        "vmean", (F.col("vsum") / F.col("cnt")).cast("double")
    )


def build_all_tiers(series: DataFrame) -> dict[str, DataFrame]:
    """1m from raw; 1h from 1m; 1d from 1h (each exact)."""
    tiers: dict[str, DataFrame] = {}
    tiers["1m"] = rollup_from_series(series, "1m")
    tiers["1h"] = rollup_from_tier(tiers["1m"], "1h")
    tiers["1d"] = rollup_from_tier(tiers["1h"], "1d")
    return tiers
