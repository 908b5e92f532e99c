"""Gap-fill: interval spine + last-observation-carried-forward (north_rule).

Pure Spark built-ins, two steps:

1. **Spine** — the expected bucket grid per key via
   ``sequence(min_bucket, max_bucket, interval)`` + ``explode`` —
   bounded by the key's own observed horizon (SURVEY §7 risk 5), never
   a global cross join.
2. **LOCF** — ``last(col, ignorenulls=True)`` over an
   unbounded-preceding window per key. A leading gap (no prior
   observation) stays NULL — there is nothing to carry.

The reference has no gap concept (dense sampling, implicit time); this
is the sparse-web-data generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from .rollup import TIER_TRUNC

TIER_INTERVAL = {"1m": "1 minute", "1h": "1 hour", "1d": "1 day"}

KEY_COLS = ["url_prefix", "lang"]


def spine(rolled: DataFrame, tier: str, keys: list[str] = KEY_COLS) -> DataFrame:
    """One row per (key, expected bucket) over each key's own span."""
    interval = TIER_INTERVAL[tier]
    spans = rolled.groupBy(*keys).agg(
        F.min("bucket_ts").alias("_b0"), F.max("bucket_ts").alias("_b1")
    )
    return spans.select(
        *keys,
        F.explode(
            F.sequence("_b0", "_b1", F.expr(f"INTERVAL {interval}"))
        ).alias("bucket_ts"),
    )


def gapfill_locf(
    rolled: DataFrame,
    tier: str,
    value_cols: list[str] = ("cnt", "vmin", "vmax", "vsum"),
    keys: list[str] = KEY_COLS,
) -> DataFrame:
    """Left-join rollup onto its spine, then carry forward.

    Adds ``is_filled`` so consumers can tell observations from fill.
    """
    sp = spine(rolled, tier, keys)
    joined = sp.join(rolled, [*keys, "bucket_ts"], "left")
    w = (
        W.partitionBy(*keys)
        .orderBy("bucket_ts")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = joined.withColumn(
        "is_filled", F.col(value_cols[0]).isNull()
    )
    for c in value_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out
