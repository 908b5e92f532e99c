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
    """LOCF gap fill by GENERATION instead of spine-join: each observed
    bucket emits itself plus one carried row per missing bucket up to
    (exclusive) the key's next observation — the carry IS the
    generator, so the whole operator is one key-partitioned window
    (lead + per-column last) and an answer-sized two-level explode.
    The old shape (per-key span aggregate → spine explode → left JOIN
    → LOCF window) paid two extra exchanges and a sort for the same
    rows: the join shuffled spine and tier by (keys, bucket) and the
    window then re-shuffled by (keys).

    Adds ``is_filled`` so consumers can tell observations from fill.
    Row-identical to the join form for tier-shaped input — bucket
    values unique per key and aligned to the tier grid (what
    ``rollup.bucket_expr`` produces; the spine grid always started at
    an observed ALIGNED bucket, so generation lands on the same grid).
    NULL semantics are preserved exactly: a NULL inside an observed
    row's ``value_cols[0]`` still marks it filled, and per-column
    last-non-null carry happens on the observation rows before they
    generate (same torn-row behavior as the old per-column LOCF).
    Non-value columns (e.g. a partition id riding the tier) are NULL
    on generated rows, as the left join left them.
    """
    us = TIER_US[tier]
    w = W.partitionBy(*keys).orderBy("bucket_us")
    w_run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    other_cols = [
        c for c in rolled.columns
        if c not in (*keys, "bucket_us", *value_cols)
    ]
    seg = rolled.withColumn(
        "_next_b",
        F.coalesce(F.lead("bucket_us").over(w),
                   F.col("bucket_us") + F.lit(us)),
    ).withColumn("_obs_null", F.col(value_cols[0]).isNull())
    for c in value_cols:
        seg = seg.withColumn(c, F.last(c, ignorenulls=True).over(w_run))
    x = explode_bucket_overlaps(seg, us, "bucket_us", "_next_b")
    gen = F.col("_b") != F.col("bucket_us")
    out = x.withColumn("is_filled", gen | F.col("_obs_null"))
    for c in other_cols:
        out = out.withColumn(
            c, F.when(gen, F.lit(None)).otherwise(F.col(c))
        )
    return (
        out.withColumn("bucket_us", F.col("_b"))
        .drop("_b", "_overlap", "_next_b", "_obs_null")
    )


def gapfill_interpolate(
    rolled: DataFrame,
    tier: str,
    value_cols: tuple[str, ...] = ("vmin", "vmax"),
    keys: list[str] = KEY_COLS,
) -> DataFrame:
    """Linear interpolation between the surrounding observations
    (TimescaleDB's ``interpolate()`` to LOCF's ``locf()``): a missing
    bucket gets prev + (next-prev) · (t-t_prev)/(t_next-t_prev), pure
    double arithmetic. Boundary gaps (no prior or no next observation)
    stay NULL — there is nothing to anchor the line.

    Gap-fill by GENERATION, the gapfill_locf shape: all anchors (the
    per-column last/first non-NULL values and the probe-observation
    times, backward inclusive + forward exclusive) are window exprs
    over the TIER rows sharing ONE key-partitioned sort; each tier row
    then generates the missing buckets up to (exclusive) its
    successor, interpolating from its own anchors. The old shape
    (per-key span aggregate → spine explode → left join → two windows
    over the spine) paid two extra exchanges plus the join sort to
    compute the same anchors — generated spine rows are all-NULL, so
    last/first(ignorenulls) over the spine can only ever anchor on
    tier rows, which is what the tier-side windows read directly.

    Row- and BIT-identical to the join form for tier-shaped input
    (bucket values unique per key, tier-grid aligned — what
    ``rollup.bucket_expr`` produces): the emitted expression is the
    same sub → cast → div → sub → mul → add over the same operand
    values, so the raw doubles the contract hashes are unchanged.
    Semantics preserved exactly: ``is_filled`` keys on the probe
    column alone (other value_cols stay NULL-as-is on observed rows);
    a probe-NULL tier row still anchors its own non-NULL columns
    (inclusive frames — the torn-row behavior of the join form); and
    non-value columns are NULL on generated rows, as the left join
    left them.
    """
    us = TIER_US[tier]
    w = W.partitionBy(*keys).orderBy("bucket_us")
    wb = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    wf1 = w.rowsBetween(1, W.unboundedFollowing)
    probe = value_cols[0]
    other_cols = [
        c for c in rolled.columns
        if c not in (*keys, "bucket_us", *value_cols)
    ]
    obs_ts = F.when(
        F.col(probe).isNotNull(), F.col("bucket_us")
    )
    seg = (
        rolled.withColumn(
            "_next_b",
            F.coalesce(F.lead("bucket_us").over(w),
                       F.col("bucket_us") + F.lit(us)),
        )
        .withColumn("_tp", F.last(obs_ts, ignorenulls=True).over(wb))
        .withColumn("_tn_x", F.first(obs_ts, ignorenulls=True).over(wf1))
    )
    for c in value_cols:
        seg = seg.withColumn(
            f"_p_{c}",
            F.last(c, ignorenulls=True).over(wb).cast("double"),
        ).withColumn(
            f"_n_{c}",
            F.first(c, ignorenulls=True).over(wf1).cast("double"),
        )
    x = explode_bucket_overlaps(seg, us, "bucket_us", "_next_b")
    gen = F.col("_b") != F.col("bucket_us")
    out = x.withColumn("is_filled", gen | F.col(probe).isNull())
    # forward anchors are EXCLUSIVE window values; on the tier row
    # itself the join form's inclusive frame means its own non-NULL
    # value wins — fold that in per expression. _tn is MATERIALIZED
    # before the loop because the loop replaces the probe column it
    # reads (a lazy expr would resolve against the interpolated probe)
    out = out.withColumn(
        "_tn",
        F.when(
            ~gen & F.col(probe).isNotNull(), F.col("bucket_us")
        ).otherwise(F.col("_tn_x")),
    )
    frac = F.when(
        F.col("_tn") == F.col("_tp"), F.lit(0.0)
    ).otherwise(
        (F.col("_b") - F.col("_tp")).cast("double")
        / (F.col("_tn") - F.col("_tp")).cast("double")
    )
    for c in value_cols:
        prev = F.col(f"_p_{c}")
        nxt = F.when(
            ~gen & F.col(c).isNotNull(), F.col(c).cast("double")
        ).otherwise(F.col(f"_n_{c}"))
        out = out.withColumn(
            c,
            F.when(~F.col("is_filled"), F.col(c).cast("double")).otherwise(
                prev + (nxt - prev) * frac
            ),
        )
    for c in other_cols:
        out = out.withColumn(
            c, F.when(gen, F.lit(None)).otherwise(F.col(c))
        )
    rest = [c for c in rolled.columns if c not in (*keys, "bucket_us")]
    return (
        out.withColumn("bucket_us", F.col("_b"))
        .select(*keys, "bucket_us", *rest, "is_filled")
    )


def explode_bucket_overlaps(
    intervals: DataFrame,
    us: int,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Half-open [start, end) interval rows → one row per covered
    tumbling bucket, with ``_b`` (bucket start) and ``_overlap``
    (covered μs in that bucket, exact long) appended. Zero- and
    negative-length intervals produce no rows.

    The explode is two-level (outer segment starts, inner ≤
    ``_SPINE_SEGMENT`` buckets) — the spine() memory bound, so a
    month-long interval at the 1m tier never builds a multi-MB in-row
    array. Output size is proportional to buckets covered — the size
    of the ANSWER, not of the interval.
    """
    us = int(us)
    seg_us = _SPINE_SEGMENT * us
    s, e = F.col(start_col), F.col(end_col)
    seg = (
        intervals.where(e > s)
        .withColumn("_f0", s - F.pmod(s, F.lit(us)))
        .withColumn("_fl", (e - 1) - F.pmod(e - 1, F.lit(us)))
    )
    out = (
        seg.withColumn(
            "_o", F.explode(F.sequence("_f0", "_fl", F.lit(seg_us)))
        )
        .withColumn(
            "_b",
            F.explode(
                F.sequence(
                    "_o",
                    F.least(F.col("_o") + F.lit(seg_us - us), F.col("_fl")),
                    F.lit(us),
                )
            ),
        )
        .withColumn(
            "_overlap",
            (F.least(e, F.col("_b") + F.lit(us)) - F.greatest(s, F.col("_b")))
            .cast("long"),
        )
    )
    return out.drop("_f0", "_fl", "_o")


def time_weighted(
    series: DataFrame,
    tier: str,
    keys: list[str] | None = None,
    ts_col: str = "ts_us",
    value_col: str = "value",
) -> DataFrame:
    """Time-weighted average per tumbling bucket under LOCF weighting
    (TimescaleDB ``time_weight('LOCF')`` semantics) — the right mean
    for irregularly sampled series, where the arithmetic ``vmean``
    over-weights bursts: each observation covers [its ts, the next
    observation's ts), the key's LAST observation covers to the end of
    its own bucket, and a bucket's average weights each value by its
    covered microseconds. A gap therefore carries the last value
    across every bucket it spans (twa = that value, covered_us =
    full bucket) — the continuous-aggregate view of gapfill_locf.

    ``keys`` must identify ONE logical series (default ``["url"]``) —
    time-weighting across interleaved series is ill-defined. Duplicate
    timestamps are ordered by (ts, value): the larger value wins the
    carry (zero-length segments drop out of the weighting either way).

    Output per (keys…, bucket_us): ``covered_us`` (exact long),
    ``vtw_sum`` (exact DECIMAL Σ value·overlap_us — quantized via
    rollup.vsum_cast, same |v| < 1e9 loud-overflow domain),
    ``twa`` (vtw_sum / covered_us, one double division at the end).

    Plan shape: one key-partitioned window (lead) → per-segment
    two-level bucket explode (the spine() memory bound: inner arrays
    ≤ 1440 buckets, so a month-long gap at the 1m tier never builds a
    40 MB in-row array) → partial-aggregated groupBy. Per-row state is
    O(1); the explode's output is proportional to buckets covered —
    the size of the ANSWER, not of the gap.
    """
    from .rollup import vsum_cast

    keys = keys or ["url"]
    us = int(TIER_US[tier])
    w = W.partitionBy(*keys).orderBy(ts_col, value_col)
    start = F.col(ts_col)
    b0 = start - F.pmod(start, F.lit(us))
    end = F.coalesce(F.lead(ts_col).over(w), b0 + F.lit(us))
    seg = series.select(*keys, ts_col, value_col).withColumn("_end", end)
    exploded = explode_bucket_overlaps(seg, us, ts_col, "_end")
    overlap = F.col("_overlap")
    agg = (
        exploded.groupBy(*keys, F.col("_b").alias("bucket_us"))
        .agg(
            F.sum(overlap).cast("long").alias("covered_us"),
            # overlap as DECIMAL(12,0), NOT long: decimal(18,9)×long
            # would need precision 39 > 38, so Spark silently REDUCES
            # the result scale to 8 — a per-row rounding. (18,9)×(12,0)
            # fits at (31,9) and stays exact.
            F.sum(
                vsum_cast(value_col) * overlap.cast("decimal(12,0)")
            ).alias("vtw_sum"),
        )
    )
    return agg.withColumn(
        "twa",
        F.col("vtw_sum").cast("double") / F.col("covered_us").cast("double"),
    )


def state_durations(
    series: DataFrame,
    tier: str,
    keys: list[str] | None = None,
    ts_col: str = "ts_us",
    state_col: str = "state",
) -> DataFrame:
    """Time spent in each categorical state per tumbling bucket
    (TimescaleDB ``state_agg`` / ``duration_in`` semantics) — "how
    long was each url serving lang X / status Y today": an observation
    puts its key INTO its state until the next observation; the last
    observation holds to the end of its own bucket (the
    time_weighted conventions applied to a categorical channel, same
    shared machinery).

    Duplicate timestamps order by (ts, state) — deterministic; the
    lexicographically LATER state wins the carry, the earlier one's
    zero-length segment drops out.

    Output per (keys…, state, bucket_us): ``dur_us`` (exact long) and
    ``n_segments`` (observation segments touching the bucket). Within
    a bucket, Σ dur_us over states equals the key's covered time —
    states partition the timeline (pytest-asserted).

    Plan shape: identical to time_weighted — ONE exchange (window
    hash(key) clusters the (key, state, bucket) aggregation),
    answer-sized explode.
    """
    keys = keys or ["url"]
    us = int(TIER_US[tier])
    w = W.partitionBy(*keys).orderBy(ts_col, state_col)
    start = F.col(ts_col)
    b0 = start - F.pmod(start, F.lit(us))
    end = F.coalesce(F.lead(ts_col).over(w), b0 + F.lit(us))
    seg = series.select(*keys, ts_col, state_col).withColumn("_end", end)
    x = explode_bucket_overlaps(seg, us, ts_col, "_end")
    return (
        x.groupBy(*keys, F.col(state_col).alias("state"),
                  F.col("_b").alias("bucket_us"))
        .agg(
            F.sum("_overlap").cast("long").alias("dur_us"),
            F.count("*").cast("long").alias("n_segments"),
        )
    )
