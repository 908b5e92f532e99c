"""Sessionization — the classic event-stream operator the reference's
dense-sampling model never needs, but per-user web event streams do:
a session is a maximal run of events per key with no gap exceeding
``gap_us``.

Pure built-ins, one shuffle on the key:

    lag(ts) over (key order by ts)        previous event time
    boundary = ts - lag > gap (or first)  session-start flag
    session_seq = sum(boundary) over (key order by ts)  [running count]

``session_seq`` is 1-based and deterministic; ``(key, session_seq)`` is
the session identity. Window semantics are identical in every SQL
engine, so the whole operator is oracle-replayable.

Scale shape: the default path is one hash shuffle on the key + a
partition-local sort — the same shape as any per-key window. NOTE that
a window partition is ONE task's sort-and-scan: AQE's skew handling
splits join/agg partitions, never window partitions, so a Zipf-hot key
(a celebrity user with 10⁹ events) serializes. ``block_us`` enables the
**two-phase** variant for that regime: partition-local session runs
inside fixed time blocks — the hot key spreads over (key, block) — plus
a boundary-merge pass over the tiny per-block summary (classic
split-session repair; the same bounded-unit design as the reference's
per-chunk groups, mtscomp.py:324-339). Output is provably identical to
the single-window path (pytest equality on randomized inputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts_us",
    gap_us: int = 30 * 60 * 1_000_000,
    tiebreak: str | None = None,
    block_us: int | None = None,
) -> DataFrame:
    """Add ``session_seq`` (1-based per-key session number).

    ``tiebreak``: extra ordering column for deterministic sessionization
    when timestamps collide (e.g. an event id).

    ``block_us``: when set, run the two-phase hot-key-safe variant —
    sessionize within ``block_us`` time blocks, then renumber across
    block boundaries. Identical output, bounded task size (no single
    key ever sorts in one task). Pick a block several× the expected
    session length; events-per-(key, block) bounds the task."""
    if block_us is not None:
        return _sessionize_two_phase(events, key, ts, gap_us, tiebreak,
                                     block_us)
    order = [ts, tiebreak] if tiebreak else [ts]
    w = W.partitionBy(key).orderBy(*order)
    prev = F.lag(ts).over(w)
    boundary = F.when(
        prev.isNull() | (F.col(ts) - prev > F.lit(int(gap_us))), 1
    ).otherwise(0)
    run = (
        W.partitionBy(key).orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return events.withColumn(
        "session_seq", F.sum(boundary).over(run).cast("long")
    )


def _sessionize_two_phase(
    events: DataFrame,
    key: str,
    ts: str,
    gap_us: int,
    tiebreak: str | None,
    block_us: int,
) -> DataFrame:
    """Split-session repair:

    1. **local**: sessionize within (key, block = ts // block_us)
       windows — the hot key's events spread over its blocks, so no
       task ever holds more than one block of one key;
    2. **merge**: per (key, block) summary (first/last ts, #local
       sessions) — tiny (one row per non-empty block) — decides for
       each block whether its first local session continues the
       previous non-empty block's last session (gap ≤ gap_us), and
       derives the block's global numbering offset:
       ``offset = Σ_{earlier blocks} n_sessions − Σ_{≤ this block} merged``
       (each merged boundary collapses two sessions into one, shifting
       every later number down by one);
    3. **apply**: join offsets back on (key, block) — the events side
       is already partitioned by (key, block) from phase 1.

    A block's first event starts a new LOCAL session by construction,
    and whether it truly continues the previous session depends only on
    its gap to the immediately preceding event globally — which is the
    previous non-empty block's last event: exactly what the summary
    lag sees. Hence global numbering is identical to the single-window
    path (tested on randomized inputs including a hot key).
    """
    order = [ts, tiebreak] if tiebreak else [ts]
    blocked = events.withColumn(
        "_blk", F.floor(F.col(ts) / F.lit(int(block_us)))
    )
    wl = W.partitionBy(key, "_blk").orderBy(*order)
    prev = F.lag(ts).over(wl)
    boundary = F.when(
        prev.isNull() | (F.col(ts) - prev > F.lit(int(gap_us))), 1
    ).otherwise(0)
    runl = wl.rowsBetween(W.unboundedPreceding, W.currentRow)
    local = blocked.withColumn(
        "_lseq", F.sum(boundary).over(runl).cast("long")
    )

    # per-(key, block) summary: one row per NON-EMPTY block — the merge
    # pass runs over this metadata-scale frame, never the events
    summary = local.groupBy(key, "_blk").agg(
        F.min(ts).alias("_first_ts"),
        F.max(ts).alias("_last_ts"),
        F.max("_lseq").alias("_n_sess"),
    )
    wk = W.partitionBy(key).orderBy("_blk")
    merged = F.when(
        F.col("_first_ts") - F.lag("_last_ts").over(wk)
        <= F.lit(int(gap_us)),
        1,
    ).otherwise(0)
    prev_total = F.coalesce(
        F.sum("_n_sess").over(
            wk.rowsBetween(W.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    merged_cum = F.sum(merged).over(
        wk.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    offsets = summary.select(
        key, "_blk", (prev_total - merged_cum).alias("_off")
    )

    return (
        local.join(offsets, [key, "_blk"])
        .withColumn(
            "session_seq", (F.col("_off") + F.col("_lseq")).cast("long")
        )
        .drop("_blk", "_lseq", "_off")
    )


def session_stats(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts_us",
    gap_us: int = 30 * 60 * 1_000_000,
    tiebreak: str | None = None,
    block_us: int | None = None,
) -> DataFrame:
    """One row per session: event count, start/end, duration."""
    s = sessionize(events, key, ts, gap_us, tiebreak, block_us)
    return s.groupBy(key, "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min(ts).alias("ts_start"),
        F.max(ts).alias("ts_end"),
        (F.max(ts) - F.min(ts)).alias("duration_us"),
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, int] | None = None,
    seed: int = 0,
) -> DataFrame:
    """Deterministic train/val/test assignment by id hash — the
    sampling primitive of every training pipeline: stable across runs
    and cluster layouts, no RNG state, joins and re-runs land every row
    in the same split.

    ``weights``: {split_name: percent} summing to 100 (default
    95/3/2). Assignment = bucket(xxhash64(id, seed) mod 100) walked in
    the dict's insertion order."""
    if weights is None:
        weights = {"train": 95, "val": 3, "test": 2}
    if sum(weights.values()) != 100:
        raise ValueError(f"split weights must sum to 100: {weights}")
    # seed as a chained LONG field (Spark's multi-column xxhash64 chains
    # the accumulator; mtslake.hashing.spark_xxhash64_longs reproduces it
    # for oracle-side recomputation)
    bucket = F.pmod(
        F.xxhash64(F.col(id_col), F.lit(seed).cast("long")), F.lit(100)
    )
    expr = None
    lo = 0
    for name, pct in weights.items():
        cond = (bucket >= lo) & (bucket < lo + pct)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += pct
    return df.withColumn("split", expr)


def uptime(
    pings: DataFrame,
    lease_us: int,
    tier: str,
    key: str = "url",
    ts: str = "ts_us",
    tiebreak: str | None = None,
    block_us: int | None = None,
) -> DataFrame:
    """Heartbeat / liveness aggregation (TimescaleDB ``heartbeat_agg``
    semantics): each ping keeps its key "live" for ``lease_us``; the
    per-bucket uptime is the length of the UNION of those
    [ts, ts + lease) intervals intersected with each tumbling bucket.
    For a crawl fleet this is crawler liveness; for the page-history
    table it is "url observed fresh within its recrawl lease".

    Interval union via sessionize: with a constant lease, overlapping
    leases are exactly the sessions at ``gap_us = lease_us`` (a ping
    more than one lease after its predecessor starts a new island), so
    one island = one maximal covered interval
    [min ts, max ts + lease). Islands then explode into buckets
    through gapfill.explode_bucket_overlaps (two-level, memory-
    bounded) and sum EXACT long overlaps.

    Output per (key, bucket_us): ``uptime_us`` (exact long),
    ``n_islands`` (islands touching the bucket, exact long),
    ``uptime_ratio`` (one double division at the end).

    Scale shape: sessionize's key-partitioned window (pass
    ``block_us`` for the two-phase hot-key-safe variant), a same-key
    island aggregation that reuses the exchange, then an explode
    proportional to covered buckets and one final (key, bucket)
    aggregation. No step holds more than one island per row.
    """
    from .config import TIER_US
    from .gapfill import explode_bucket_overlaps

    us = int(TIER_US[tier])
    islands = _lease_islands(pings, lease_us, key, ts, tiebreak, block_us)
    x = explode_bucket_overlaps(islands, us, "_start", "_end")
    return (
        x.groupBy(key, F.col("_b").alias("bucket_us"))
        .agg(
            F.sum("_overlap").cast("long").alias("uptime_us"),
            F.count("*").cast("long").alias("n_islands"),
        )
        .withColumn(
            "uptime_ratio",
            F.col("uptime_us").cast("double") / F.lit(float(us)),
        )
    )


def _lease_islands(
    pings: DataFrame,
    lease_us: int,
    key: str,
    ts: str,
    tiebreak: str | None,
    block_us: int | None,
) -> DataFrame:
    """Maximal covered intervals under a constant lease: one island
    per session at gap = lease, spanning [min ts, max ts + lease).
    Shared by uptime (interval ∩ bucket) and downtime_gaps (interval
    complement)."""
    s = sessionize(pings, key=key, ts=ts, gap_us=int(lease_us),
                   tiebreak=tiebreak, block_us=block_us)
    return s.groupBy(key, "session_seq").agg(
        F.min(ts).alias("_start"),
        (F.max(ts) + F.lit(int(lease_us))).alias("_end"),
    )


def downtime_gaps(
    pings: DataFrame,
    lease_us: int,
    key: str = "url",
    ts: str = "ts_us",
    k: int | None = None,
    tiebreak: str | None = None,
    block_us: int | None = None,
) -> DataFrame:
    """Dead intervals — the complement of uptime's islands: for each
    consecutive island pair of a key, the gap [island end, next island
    start), which is strictly positive by construction (a new island
    only starts when a ping arrives past the previous island's lease
    horizon). The "where are my biggest coverage holes" report a crawl
    scheduler reads next to the uptime surface.

    ``k``: keep only each key's k longest gaps (ties broken by
    earlier start — fully deterministic rank). None keeps all gaps.

    Output per gap: ``gap_start_us`` / ``gap_end_us`` (exact longs),
    ``gap_us`` (their difference), ``rank`` (1 = longest).

    Scale shape: islands ride sessionize's key partition; the lead
    window and the rank window reuse that same hash(key) exchange —
    the whole report is ONE shuffle, and every window's input is the
    ISLAND list (bounded by sessions/key), never the raw pings.
    """
    islands = _lease_islands(pings, lease_us, key, ts, tiebreak, block_us)
    w = W.partitionBy(key).orderBy("_start")
    nxt = F.lead("_start").over(w)
    gaps = (
        islands.withColumn("_nxt", nxt)
        .where(F.col("_nxt").isNotNull())
        .select(
            key,
            F.col("_end").alias("gap_start_us"),
            F.col("_nxt").alias("gap_end_us"),
            (F.col("_nxt") - F.col("_end")).cast("long").alias("gap_us"),
        )
    )
    rw = W.partitionBy(key).orderBy(F.desc("gap_us"), F.asc("gap_start_us"))
    ranked = gaps.withColumn("rank", F.row_number().over(rw).cast("int"))
    if k is not None:
        ranked = ranked.where(F.col("rank") <= int(k))
    return ranked


SAMPLE_RESOLUTION = 1 << 20


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic weighted Bernoulli sampling — the quality-
    proportional downsampling pass of a training pipeline (keep
    high-quality documents with probability ∝ their score): row kept
    iff ``u(id) < weight``, where ``u = xxhash64(id, seed) mod 2^20 /
    2^20`` is the same stable per-id uniform family hash_split draws
    from. Like hash_split it is stateless and layout-independent:
    re-runs, joins, and cluster re-partitioning keep exactly the same
    rows, and the kept set is monotone in the weight (raising a doc's
    score never evicts it).

    Weights outside [0, 1] behave as clamped: w ≤ 0 keeps nothing,
    w ≥ 1 keeps everything. NULL weights drop the row (a loud
    upstream bug is better caught by count deltas than by silently
    keeping).
    """
    u = F.pmod(
        F.xxhash64(F.col(id_col), F.lit(int(seed)).cast("long")),
        F.lit(SAMPLE_RESOLUTION),
    ) / F.lit(float(SAMPLE_RESOLUTION))
    return df.where(u < F.col(weight_col))


def funnel(
    events: DataFrame,
    steps: list[str],
    key: str = "user_id",
    ts_col: str = "ts_us",
    type_col: str = "event_type",
    within_us: int | None = None,
) -> DataFrame:
    """Ordered-funnel analysis — per key, the earliest strictly-
    increasing completion chain through ``steps`` (view → click →
    purchase): t₁ = first step-1 event; tᵢ = first step-i event AFTER
    tᵢ₋₁ (earliest-chain semantics: greedy min at each step, the
    standard product-analytics definition). ``within_us`` bounds the
    whole chain to a conversion horizon from t₁. Output: one row per
    key that entered the funnel — t_1..t_n (null from the first
    uncompleted step on) and ``depth`` (steps completed).

    Steps must be distinct event types; ties at the same μs do NOT
    advance the chain (strict >), so duplicate-timestamp streams
    can't self-convert.

    Scale shape: n−1 chained [filtered single-type events ⋈ key
    aggregate] rounds — each a partial-aggregated groupBy(key) plus
    an equi-join on key against an aggregate that has ONE row per
    key (AQE broadcasts it when small); the funnel length is a small
    constant, the data passes are each O(step's events). No windows
    over the full stream, no per-key sort.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct: {steps}")
    t = F.col(ts_col)
    cur = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(key)
        .agg(F.min(t).cast("long").alias("t_1"))
    )
    for i, s in enumerate(steps[1:], start=2):
        prev = f"t_{i - 1}"
        cond = t > F.col(prev)
        if within_us is not None:
            cond = cond & (t <= F.col("t_1") + int(within_us))
        step_ev = events.where(F.col(type_col) == s)
        nxt = (
            step_ev.join(cur.select(key, "t_1", prev), key)
            .where(cond)
            .groupBy(key)
            .agg(F.min(t).cast("long").alias(f"t_{i}"))
        )
        cur = cur.join(nxt.select(key, f"t_{i}"), key, "left")
    depth = F.lit(1)
    for i in range(2, len(steps) + 1):
        depth = depth + F.col(f"t_{i}").isNotNull().cast("int")
    return cur.select(
        key, *[f"t_{i}" for i in range(1, len(steps) + 1)],
        depth.cast("int").alias("depth"),
    )


def cohort_retention(
    events: DataFrame,
    tier_us: int,
    key: str = "user_id",
    ts_col: str = "ts_us",
) -> DataFrame:
    """Cohort retention curves — keys grouped by FIRST-SEEN bucket
    (the cohort), counted per later bucket-offset they remain active
    in: the "day-N retention" read behind every growth dashboard.

    Output: (cohort_us, offset, n_active, n_cohort, ret_frac) — one
    row per (cohort, offset) with any activity; offset 0 is the
    cohort size by construction (every key is active in its first
    bucket), so n_cohort joins from the offset-0 row and
    ret_frac = n_active/n_cohort divides identical integers in any
    engine (bit-stable IEEE; = 1.0 at offset 0).

    Scale shape: activity dedups to DISTINCT (key, bucket) FIRST —
    the explode-proof aggregate — then one window min per key (hash
    on key), one groupBy (cohort, offset) over rows already reduced
    to key-bucket grain, and a broadcast-sized cohort-total join.
    """
    from pyspark.sql import Window as W

    us = int(tier_us)
    b = (F.col(ts_col) - F.pmod(F.col(ts_col), F.lit(us))).cast("long")
    act = events.select(F.col(key), b.alias("_b")).distinct()
    first = F.min("_b").over(W.partitionBy(key))
    keyed = act.select(
        key, "_b", first.alias("_c"),
    )
    per = (
        keyed.groupBy(
            F.col("_c").alias("cohort_us"),
            # integer `div` (house rule): `/` would be IEEE double
            F.expr(f"(_b - _c) div {us}").alias("offset"),
        )
        .agg(F.count("*").cast("long").alias("n_active"))
    )
    totals = per.where(F.col("offset") == 0).select(
        "cohort_us", F.col("n_active").alias("n_cohort")
    )
    return per.join(totals, "cohort_us").select(
        "cohort_us", "offset", "n_active", "n_cohort",
        (F.col("n_active").cast("double")
         / F.col("n_cohort").cast("double")).alias("ret_frac"),
    )


def stratified_sample(
    df: DataFrame,
    strata: list[str],
    n_per_stratum: int,
    id_col: str = "doc_id",
    seed: int = 0,
    order_hash=None,
) -> DataFrame:
    """Deterministic stratified sampling — exactly ``n_per_stratum``
    rows from every stratum (fewer iff the stratum is smaller): the
    balanced-corpus primitive (equal docs per language/source for
    training mixes) that a global Bernoulli sample can't provide
    (rare strata under-draw). The sample is a pure function of
    (id, seed): stable across runs, partitionings, and cluster
    layouts — re-runs and joins see the same rows (the hash_split
    property, per stratum).

    ``order_hash``: optional Column replacing the xxhash64(id, seed)
    ranking key (e.g. md5 for an engine-portable contract replay).

    Scale shape: ONE hash partition by strata + per-stratum TOP-N
    (rank window) — Spark plans a partial top-N before the shuffle
    for window rank filters over sorted groups; strata counts are
    typically few thousand, and per-task memory is bounded by the
    winners, not stratum size.
    """
    from pyspark.sql import Window as W

    h = (
        order_hash
        if order_hash is not None
        else F.xxhash64(F.col(id_col), F.lit(int(seed)).cast("long"))
    )
    w = W.partitionBy(*strata).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= int(n_per_stratum))
        .drop("_rk")
    )
