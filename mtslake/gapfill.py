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


_SPINE_SEGMENT = 1440  # buckets per inner sequence array


def spine(rolled: DataFrame, tier: str, keys: list[str] = KEY_COLS) -> DataFrame:
    """One row per (key, expected bucket) over each key's own span.

    Two-level explode: a single ``sequence(_b0, _b1, us)`` would build
    the key's ENTIRE grid as one in-row array before exploding — a
    decade-long key at the 1m tier is a ~5M-element (40 MB) array held
    by one task. Segmenting first (outer sequence of segment starts,
    inner sequence of ≤1440 buckets each) bounds per-row array memory
    to KBs while producing the identical row set."""
    us = TIER_US[tier]
    seg = us * _SPINE_SEGMENT
    spans = rolled.groupBy(*keys).agg(
        F.min("bucket_us").alias("_b0"), F.max("bucket_us").alias("_b1")
    )
    segs = spans.select(
        *keys, "_b1",
        F.explode(F.sequence("_b0", "_b1", F.lit(seg))).alias("_s"),
    )
    return segs.select(
        *keys,
        F.explode(
            F.sequence(
                "_s", F.least(F.col("_s") + F.lit(seg - us), F.col("_b1")),
                F.lit(us),
            )
        ).alias("bucket_us"),
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


def gapfill_interpolate(
    rolled: DataFrame,
    tier: str,
    value_cols: tuple[str, ...] = ("vmin", "vmax"),
    keys: list[str] = KEY_COLS,
) -> DataFrame:
    """Linear interpolation between the surrounding observations
    (TimescaleDB's ``interpolate()`` to LOCF's ``locf()``): a missing
    bucket gets prev + (next-prev) · (t-t_prev)/(t_next-t_prev), pure
    double arithmetic over two windows (backward LOCF + forward LOCF
    of the value AND its observation time). Boundary gaps (no prior or
    no next observation) stay NULL — there is nothing to anchor the
    line. Same spine, same shuffle shape as gapfill_locf.
    """
    sp = spine(rolled, tier, keys)
    joined = sp.join(rolled, [*keys, "bucket_us"], "left")
    wb = (
        W.partitionBy(*keys)
        .orderBy("bucket_us")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy(*keys)
        .orderBy("bucket_us")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    probe = value_cols[0]
    out = joined.withColumn("is_filled", F.col(probe).isNull())
    obs_ts = F.when(
        F.col(probe).isNotNull(), F.col("bucket_us")
    )
    out = out.withColumn("_tp", F.last(obs_ts, ignorenulls=True).over(wb))
    out = out.withColumn("_tn", F.first(obs_ts, ignorenulls=True).over(wf))
    frac = F.when(
        F.col("_tn") == F.col("_tp"), F.lit(0.0)
    ).otherwise(
        (F.col("bucket_us") - F.col("_tp")).cast("double")
        / (F.col("_tn") - F.col("_tp")).cast("double")
    )
    for c in value_cols:
        prev = F.last(c, ignorenulls=True).over(wb).cast("double")
        nxt = F.first(c, ignorenulls=True).over(wf).cast("double")
        out = out.withColumn(
            c,
            F.when(~F.col("is_filled"), F.col(c).cast("double")).otherwise(
                prev + (nxt - prev) * frac
            ),
        )
    return out.drop("_tp", "_tn")
