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
    direction: str = "backward",
) -> DataFrame:
    """``direction`` (pandas.merge_asof parity):

    * ``backward`` (default) — latest right row at or before the left
      row (the TSDB "state as of" read).
    * ``forward`` — earliest right row at or after it.
    * ``nearest`` — whichever of those is closer in time; exact ties
      resolve BACKWARD (deterministic).

    All three run in the same single-shuffle union plan: forward adds
    a second window over the SAME (key) partition with the frame
    reversed (an extra partition-local sort, no extra exchange);
    nearest computes both fills and selects per row. ``tolerance_us``
    bounds |ts_l − ts_r| in every direction.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction: {direction!r}")
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
    cols = [*[f"{c}{suffix}" for c in right_cols], f"{ts}{suffix}"]
    # backward: right (side 0) sorts BEFORE left at equal ts, so an
    # equal-ts right row is inside [unboundedPreceding, current] —
    # "at or before". forward mirrors it: left sorts first, frame
    # [current, unboundedFollowing] — "at or after".
    # DUPLICATE right rows at one (key, ts) need a total order or the
    # fill is partition-layout-dependent (last() returns whichever row
    # the sort happened to place last — a different value after a
    # repartition). Tiebreak on the right payload columns themselves:
    # the fill is deterministic across runs (left rows carry NULL
    # payloads, so the extra keys never reorder the left side). NOTE
    # the fill stays per-COLUMN last/first(ignorenulls): when duplicate
    # same-ts right rows hold NULLs in DIFFERENT payload columns, each
    # column takes its own greatest non-NULL value, so the result row
    # can mix columns from different right rows (deterministic, but
    # not any single right row).
    tiebreak = [F.col(f"{c}{suffix}") for c in right_cols]
    wb = (
        W.partitionBy(key)
        .orderBy(ts, "_side", *tiebreak)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy(key)
        .orderBy(ts, F.desc("_side"), *[t.desc() for t in tiebreak])
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    filled = union
    if direction in ("backward", "nearest"):
        for c in cols:
            filled = filled.withColumn(
                f"_b{c}", F.last(c, ignorenulls=True).over(wb)
            )
    if direction in ("forward", "nearest"):
        for c in cols:
            filled = filled.withColumn(
                f"_f{c}", F.first(c, ignorenulls=True).over(wf)
            )
    out = filled.filter(F.col("_side") == 1)
    if direction == "nearest":
        bts, fts = F.col(f"_b{ts}{suffix}"), F.col(f"_f{ts}{suffix}")
        pick_b = fts.isNull() | (
            bts.isNotNull() & (F.col(ts) - bts <= fts - F.col(ts))
        )
        for c in cols:
            out = out.withColumn(
                c, F.when(pick_b, F.col(f"_b{c}")).otherwise(F.col(f"_f{c}"))
            )
    else:
        pre = "_b" if direction == "backward" else "_f"
        for c in cols:
            out = out.withColumn(c, F.col(f"{pre}{c}"))
    out = out.drop(
        "_side", *[f"_b{c}" for c in cols], *[f"_f{c}" for c in cols]
    )
    if tolerance_us is not None:
        stale = (
            F.abs(F.col(ts) - F.col(f"{ts}{suffix}"))
            > F.lit(int(tolerance_us))
        )
        for c in cols:
            out = out.withColumn(
                c, F.when(stale, F.lit(None)).otherwise(F.col(c))
            )
    return out


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    key: str = "url",
    ts_col: str = "ts_us",
    start_col: str = "start_us",
    end_col: str = "end_us",
    bucket_us: int = 3_600_000_000,
) -> DataFrame:
    """Batch range join — which events fall inside which half-open
    [start, end) interval per key (maintenance windows, incident
    spans, ad campaigns)? Spark has no native range join; the naive
    formulation `events JOIN intervals ON key AND ts BETWEEN s AND e`
    plans an equi-join on key with the range as a post-filter — one
    hot key degenerates to an in-task cross product.

    This implementation buckets time: intervals explode into their
    covered tumbling buckets (gapfill.explode_bucket_overlaps — the
    memory-bounded two-level explode shared with time_weighted/
    uptime), events map to ONE bucket each, and the join runs on
    (key, bucket) — an equi-join whose per-task work is bounded by
    events-per-bucket × intervals-overlapping-that-bucket, not by
    per-key row counts. The exact containment predicate then trims
    bucket-grain false pairs. Each qualifying (event, interval) pair
    appears EXACTLY once: the event's single bucket occurs once in
    the interval's bucket set — no dedup pass.

    ``bucket_us`` is the skew/blowup knob: it should sit near the
    TYPICAL interval length (explode rows ≈ len/bucket + 1 per
    interval; a bucket far below interval length inflates the build
    side, far above it re-concentrates hot keys).

    Inner join; events in no interval drop (anti-join the result for
    the complement). Interval frames carry any payload columns along.
    """
    us = int(bucket_us)
    from .gapfill import explode_bucket_overlaps

    ev = events.withColumn(
        "_b", F.col(ts_col) - F.pmod(F.col(ts_col), F.lit(us))
    )
    iv = explode_bucket_overlaps(
        intervals, us, start_col, end_col
    ).drop("_overlap")
    joined = ev.join(iv, on=[key, "_b"], how="inner").where(
        (F.col(ts_col) >= F.col(start_col))
        & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop("_b")
