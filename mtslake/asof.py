"""As-of join: each left event matched to the latest right event at or
before it, per key.

Spark lacks a native as-of join; rather than a Pandas-UDF merge, this is
a **composition of built-ins** (union + window last(ignorenulls)) that
whole-stage-codegens and shuffles each side exactly once on
(key, time):

    L(key, ts, ...), R(key, ts, payload)
    → union with a side tag
    → window per key ordered by (ts, side)  [right sorts before left at
      equal ts so same-timestamp right rows ARE visible — 'at or before']
    → LOCF the right payload onto left rows
    → filter back to left rows

Equivalent to DuckDB's ASOF JOIN (the oracle) and pandas.merge_asof.
Tolerance: optional max staleness (ts_l - ts_r <= tolerance_us).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "url",
    ts: str = "ts_us",
    right_cols: list[str] | None = None,
    tolerance_us: int | None = None,
    suffix: str = "_r",
) -> DataFrame:
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (key, ts)]

    l_tag = left.withColumn("_side", F.lit(1))
    for c in right_cols:
        l_tag = l_tag.withColumn(f"{c}{suffix}", F.lit(None).cast(
            dict(right.dtypes)[c]))
    l_tag = l_tag.withColumn(f"{ts}{suffix}", F.lit(None).cast("long"))

    r_tag = right.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        F.col(ts).alias(f"{ts}{suffix}"),
    )
    left_cols = [c for c in left.columns]
    union = l_tag.select(
        key, ts, "_side",
        *[c for c in left_cols if c not in (key, ts)],
        *[f"{c}{suffix}" for c in right_cols],
        f"{ts}{suffix}",
    ).unionByName(
        r_tag.select(
            key, ts, "_side",
            *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
              for c in left_cols if c not in (key, ts)],
            *[f"{c}{suffix}" for c in right_cols],
            f"{ts}{suffix}",
        )
    )
    w = (
        W.partitionBy(key)
        .orderBy(ts, "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = union
    for c in [*[f"{c}{suffix}" for c in right_cols], f"{ts}{suffix}"]:
        filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
    out = filled.filter(F.col("_side") == 1).drop("_side")
    if tolerance_us is not None:
        stale = F.col(ts) - F.col(f"{ts}{suffix}") > F.lit(int(tolerance_us))
        for c in [*[f"{c}{suffix}" for c in right_cols], f"{ts}{suffix}"]:
            out = out.withColumn(
                c, F.when(stale, F.lit(None)).otherwise(F.col(c))
            )
    return out
