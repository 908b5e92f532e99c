"""Gap-fill: interval spine + last-observation-carried-forward (north_rule).

Pure Spark built-ins, two steps:

1. **Spine** — the expected bucket grid per key via a numeric
   ``sequence(min_bucket_us, max_bucket_us, tier_us)`` + ``explode`` —
   bounded by the key's own observed horizon (SURVEY §7 risk 5), never
   a global cross join, and pure int64 (timezone-free, matching
   rollup.bucket_expr).
2. **LOCF** — ``last(col, ignorenulls=True)`` over an
   unbounded-preceding window per key. A leading gap (no prior
   observation) stays NULL — there is nothing to carry.

The reference has no gap concept (dense sampling, implicit time); this
is the sparse-web-data generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from .config import TIER_US
from .rollup import AGG_COLS

KEY_COLS = ["url_prefix", "lang"]


def spine(rolled: DataFrame, tier: str, keys: list[str] = KEY_COLS) -> DataFrame:
    """One row per (key, expected bucket) over each key's own span."""
    us = TIER_US[tier]
    spans = rolled.groupBy(*keys).agg(
        F.min("bucket_us").alias("_b0"), F.max("bucket_us").alias("_b1")
    )
    return spans.select(
        *keys,
        F.explode(F.sequence("_b0", "_b1", F.lit(us))).alias("bucket_us"),
    )


def gapfill_locf(
    rolled: DataFrame,
    tier: str,
    value_cols: tuple[str, ...] = tuple(AGG_COLS),
    keys: list[str] = KEY_COLS,
) -> DataFrame:
    """Left-join rollup onto its spine, then carry forward.

    Adds ``is_filled`` so consumers can tell observations from fill.
    """
    sp = spine(rolled, tier, keys)
    joined = sp.join(rolled, [*keys, "bucket_us"], "left")
    w = (
        W.partitionBy(*keys)
        .orderBy("bucket_us")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = joined.withColumn("is_filled", F.col(value_cols[0]).isNull())
    for c in value_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out
