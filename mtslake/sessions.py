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

Scale shape: one hash shuffle on the key + a partition-local sort —
the same shape as any per-key window; hot keys are bounded by the
key's own event count (AQE skew split applies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts_us",
    gap_us: int = 30 * 60 * 1_000_000,
    tiebreak: str | None = None,
) -> DataFrame:
    """Add ``session_seq`` (1-based per-key session number).

    ``tiebreak``: extra ordering column for deterministic sessionization
    when timestamps collide (e.g. an event id)."""
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


def session_stats(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts_us",
    gap_us: int = 30 * 60 * 1_000_000,
    tiebreak: str | None = None,
) -> DataFrame:
    """One row per session: event count, start/end, duration."""
    s = sessionize(events, key, ts, gap_us, tiebreak)
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
