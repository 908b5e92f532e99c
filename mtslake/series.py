"""pages → per-url event streams (the engine's long-format IR).

The reference's IR is a dense ``(n_samples, n_channels)`` matrix with
implicit time (mtscomp.py:115-140,271). Web snapshots are sparse and
irregular, so our IR is long format:

    series(url STRING, ts_us LONG, n_chars LONG, value DOUBLE,
           text_sha1 STRING)

* ``ts_us``   — explicit μs timestamps (delta-of-delta encoded)
* ``n_chars`` — integer channel (≙ the int16 channel matrix,
                tests.py:100-102): ``length(text)``
* ``value``   — float channel, a deterministic signal of
                ``(url, warc_ts)`` covering the reference's four signal
                families (tests.py:66-97): zeros / noise / white_sine /
                colored_sine — Gorilla-XOR encoded
* ``text_sha1`` — per-row hash backing the byte-identical-text-per-url
                invariant (input_hint)

All pure Spark built-ins — no Python in this path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# (name, numpy dtype, is_ts) — the channel layout every chunk stores
TS_COL = "ts_us"
CHANNELS = [("n_chars", "int64"), ("value", "float64")]


def pages_to_series(pages: DataFrame) -> DataFrame:
    ts_us = F.unix_micros(F.col("warc_ts"))
    fam = F.pmod(F.xxhash64(F.col("url")), F.lit(4))
    t = ts_us.cast("double") / F.lit(1e6)
    noise = (
        F.pmod(F.xxhash64(F.col("url"), ts_us), F.lit(1_000_000)).cast("double")
        / F.lit(1e6)
        - F.lit(0.5)
    )
    value = (
        F.when(fam == 0, F.lit(0.0))
        .when(fam == 1, noise * F.lit(0.5))
        .when(fam == 2, F.sin(t / F.lit(3600.0)) + noise * F.lit(0.25))
        .otherwise(F.sin(t / F.lit(86400.0)))
    )
    return pages.select(
        F.col("url"),
        ts_us.alias(TS_COL),
        F.length("text").cast("long").alias("n_chars"),
        value.alias("value"),
        # cast-to-binary reuses the row's UTF-8 bytes; encode() round-trips
        # through a Java String re-encode (same sha1, measurably slower)
        F.sha1(F.col("text").cast("binary")).alias("text_sha1"),
        F.col("lang"),
    )


def events_to_series(events: DataFrame) -> DataFrame:
    """Adapter: the driver's ``events`` table (event_id, ts, user_id,
    event_type, value, props) as per-user streams — same IR, used for
    DuckDB-oracle-checked queries. ``ts`` arrives as TIMESTAMP_NTZ;
    the cast to TIMESTAMP is UTC-safe because every caller pins
    spark.sql.session.timeZone=UTC."""
    return events.select(
        F.concat(
            F.lit("https://user-"),
            F.col("user_id").cast("string"),
            F.lit(".example.com/events"),
        ).alias("url"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias(TS_COL),
        F.length("props").cast("long").alias("n_chars"),
        F.col("value"),
        F.sha1(F.col("props").cast("binary")).alias("text_sha1"),
        F.lit("en").alias("lang"),
    )


def url_prefix(col: str = "url") -> F.Column:
    """Grouping key for continuous aggregates: the url's host
    (north_rule: 'per url-prefix and lang'). substring_index instead of
    parse_url: same host extraction, ~2× cheaper per row (no Java URI
    machinery) — measurable when the rollup shuffles 10⁷+ rows."""
    return F.substring_index(
        F.substring_index(F.col(col), "://", -1), "/", 1
    ).alias("url_prefix")


def rate(
    series: DataFrame,
    key: str = "url",
    ts_col: str = TS_COL,
    value_col: str = "value",
    per_seconds: float = 1.0,
    tiebreak: str | None = None,
) -> DataFrame:
    """Counter/gauge rate — the TSDB derivative query: per key, the
    value delta between consecutive observations divided by the time
    delta (scaled to ``per_seconds``). First observation per key has no
    predecessor and is dropped. One key shuffle + partition-local sort;
    division of exact deltas is one IEEE op, so the SQL oracle replays
    it bit-for-bit.

    ``tiebreak``: extra ordering column when timestamps can collide —
    without it, rate over duplicate timestamps is order-dependent.
    Duplicate (zero-delta) observations are KEPT with ``rate`` null —
    via ``try_divide``, so the semantics hold under BOTH ANSI modes
    (ANSI-on, Spark 4's default, would otherwise hard-fail the job on
    the zero divisor; ANSI-off would return null) — the caller sees
    the collision instead of losing the row or the job; pre-aggregate
    to unique timestamps for the canonical shape. Only each key's
    first observation (no predecessor) is dropped."""
    from pyspark.sql import Window as W

    order = [ts_col, tiebreak] if tiebreak else [ts_col]
    w = W.partitionBy(key).orderBy(*order)
    prev_v = F.lag(value_col).over(w)
    prev_t = F.lag(ts_col).over(w)
    return (
        series.withColumn("_prev_t", prev_t)
        .withColumn(
            "rate",
            F.try_divide(
                F.col(value_col) - prev_v,
                (F.col(ts_col) - F.col("_prev_t")).cast("double")
                / F.lit(1e6 * per_seconds),
            ),
        )
        .filter(F.col("_prev_t").isNotNull())
        .select(key, ts_col, value_col, "rate")
    )


def topk_per_bucket(
    series: DataFrame,
    tier_us: int,
    k: int = 5,
    key: str = "url",
    ts_col: str = TS_COL,
) -> DataFrame:
    """Heavy hitters per time bucket: the top-``k`` keys by event count
    in every ``tier_us`` window (ties: key asc). One hash aggregation +
    one per-bucket rank window over the already-aggregated (bucket,
    key, cnt) rows — the window input is the aggregate, never the raw
    events."""
    from pyspark.sql import Window as W

    b = (F.col(ts_col) - F.pmod(F.col(ts_col), F.lit(int(tier_us)))).cast(
        "long"
    )
    counts = (
        series.select(b.alias("bucket_us"), F.col(key))
        .groupBy("bucket_us", key)
        .agg(F.count("*").alias("cnt"))
    )
    w = W.partitionBy("bucket_us").orderBy(F.desc("cnt"), F.asc(key))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= int(k))
    )


def anomaly_flags(
    rolled: DataFrame,
    tier_us: int,
    n_buckets: int = 24,
    k: int = 3,
    min_points: int = 12,
    value_col: str = "cnt",
    keys: tuple[str, ...] = ("url_prefix", "lang"),
) -> DataFrame:
    """Per-bucket anomaly flags over a rollup tier: a bucket's count is
    anomalous when it deviates from the trailing-window baseline by
    more than ``k`` standard deviations (the monitoring primitive —
    traffic spikes / crawl outages per url-prefix).

    The baseline window is RANGE-framed on the numeric bucket and
    STRICTLY PRECEDING (``[-n_buckets·tier_us, -tier_us]``): the
    current bucket never contaminates its own baseline, and sparse
    holes are not smoothed over (the ``moving_aggregate`` rationale).

    Determinism: the k·sigma test never touches a float. With integer
    window sums S = Σx, S2 = Σx² over n baseline points,

        |x − S/n| > k·σ  ⟺  (n·x − S)² > k²·(n·S2 − S²)

    and both sides are computed in DECIMAL(38,0) from integer inputs —
    exact in Spark and any SQL replayer, no sqrt, no division, no
    rounding ties (σ = 0 degenerates correctly: any deviation flags).
    Operand bounds: |n·x − S| and k·S must stay below ~9.2·10^18
    (BIGINT) — counts per (key, bucket) beyond 10^17/n_buckets are out
    of scope. ``base_mean`` is emitted for dashboards only (one double
    division, rounded once).

    Scale shape: one per-key window pass + narrow projections — the
    single-shuffle shape of ``moving_aggregate``; runs over the TIER
    (bounded buckets/key), never raw events.
    """
    from pyspark.sql import Window as W

    us = int(tier_us)
    w = (
        W.partitionBy(*keys)
        .orderBy("bucket_us")
        .rangeBetween(-int(n_buckets) * us, -us)
    )
    x = F.col(value_col).cast("long")
    n = F.count(value_col).over(w)
    s = F.sum(x).over(w)
    s2 = F.sum(x * x).over(w)
    d = n * x - s                      # BIGINT-exact deviation numerator
    dec19 = "decimal(19,0)"
    lhs = d.cast(dec19) * d.cast(dec19)
    ks = (F.lit(int(k)) * s).cast(dec19)
    # (k²·n)·S2 − (k·S)²   — every product width ≤ 38 in both engines
    k2n = (F.lit(int(k) * int(k)) * n).cast("decimal(18,0)")
    rhs = k2n * s2.cast("decimal(20,0)") - ks * ks
    flag = (n >= int(min_points)) & (lhs > rhs)
    return rolled.select(
        *keys,
        "bucket_us",
        x.alias(value_col),
        n.cast("long").alias("base_n"),
        F.round(F.try_divide(s.cast("double"), n.cast("double")), 6).alias(
            "base_mean"
        ),
        flag.alias("is_anomaly"),
        F.when(flag, F.signum(d.cast("double")).cast("int"))
        .otherwise(F.lit(0))
        .alias("direction"),
    )


def counter_rate(
    series: DataFrame,
    key: str = "url",
    ts_col: str = TS_COL,
    value_col: str = "value",
    tiebreak: str | None = None,
) -> DataFrame:
    """Reset-aware monotonic-counter rate (the Prometheus ``rate()``
    reset rule, public docs): counters only grow; a NEGATIVE delta
    means the process restarted and the counter rebegan near zero, so
    the increase since the previous sample is taken as the counter's
    CURRENT value (everything it accumulated since the reset), never
    the negative delta a gauge derivative would report.

        increase = x − x_prev   if x ≥ x_prev      (normal growth)
                 = x            otherwise           (reset detected)

    Emits per observation: ``increase`` (exact — same type as the
    counter) and ``rate_per_s`` (one double division of exact deltas,
    rounded once). First observation per key is dropped (no
    predecessor); duplicate-timestamp rows keep ``rate_per_s`` null
    via ``try_divide`` (the :func:`rate` ANSI-mode rationale).
    NULL counter observations are excluded up front (the
    :func:`value_changes` convention): a NULL riding the lag chain
    would make ``x >= prev`` NULL and fire the OTHERWISE branch —
    i.e. a phantom reset reporting the full counter value as
    increase. Same single-shuffle shape as :func:`rate`."""
    from pyspark.sql import Window as W

    series = series.where(F.col(value_col).isNotNull())
    order = [ts_col, tiebreak] if tiebreak else [ts_col]
    w = W.partitionBy(key).orderBy(*order)
    x = F.col(value_col)
    prev_v = F.lag(value_col).over(w)
    prev_t = F.lag(ts_col).over(w)
    inc = F.when(x >= prev_v, x - prev_v).otherwise(x)
    return (
        series.withColumn("_prev_t", prev_t)
        .withColumn("increase", inc)
        .withColumn(
            "rate_per_s",
            F.round(
                F.try_divide(
                    F.col("increase").cast("double"),
                    (F.col(ts_col) - F.col("_prev_t")).cast("double"),
                )
                * F.lit(1_000_000),
                6,
            ),
        )
        .filter(F.col("_prev_t").isNotNull())
        .select(key, ts_col, value_col, "increase", "rate_per_s")
    )


def ewma_smooth(
    df: DataFrame,
    alpha: float = 0.5,
    key_cols: tuple[str, ...] = ("url_prefix", "lang"),
    order_col: str = "bucket_us",
    value_col: str = "cnt",
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially-weighted moving average per key — the classic
    recursive smoother ``y₀ = x₀; yᵢ = α·xᵢ + (1−α)·yᵢ₋₁`` behind
    trend baselines and EWMA control charts (Roberts 1959).

    The recursion is ORDER-DEPENDENT — no SQL window frame or
    prefix-scan built-in expresses it — so this is the documented
    sequential-operator case (like LTTB): ``applyInPandas`` per key,
    one Arrow batch per group, a single linear pass inside. Keys
    partition the work, so the shuffle is one exchange on
    ``key_cols`` and scale comes from key parallelism; per-key state
    is one double. The arithmetic is exactly ``α·x + (1−α)·acc`` per
    step (both factors computed once, as IEEE doubles), so an engine
    replaying the same recursion — e.g. a recursive CTE — produces
    bit-identical values; with the default α = 0.5 both coefficients
    are exact binary fractions.

    Output: input columns (keys, order, value) + ``out_col`` double.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    a = float(alpha)
    one_minus = 1.0 - a
    in_fields = [df.schema[c] for c in (*key_cols, order_col, value_col)]
    schema = T.StructType(
        list(in_fields) + [T.StructField(out_col, T.DoubleType())]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort",
                              ignore_index=True)
        xs = pdf[value_col].to_numpy(np.float64)
        ys = np.empty_like(xs)
        acc = 0.0
        for i, x in enumerate(xs):
            acc = x if i == 0 else a * x + one_minus * acc
            ys[i] = acc
        out = pdf[[*key_cols, order_col, value_col]].copy()
        out[out_col] = ys
        return out

    return (
        df.select(*key_cols, order_col, value_col)
        .groupBy(*key_cols)
        .applyInPandas(fn, schema=schema)
    )


def exact_quantiles(
    df: DataFrame,
    keys: list,
    value_col: str,
    qs: dict,
) -> DataFrame:
    """Exact discrete per-key quantiles — the latency-percentile read
    (p50/p95/p99) every TSDB dashboard runs. ``qs`` maps output column
    name → quantile in (0, 1].

    Selection rule: the SMALLEST value whose cumulative distribution
    reaches q (``min(value) where cume_dist >= q``). Discrete selection
    returns an EXISTING input value — no interpolation arithmetic — so
    results are bit-stable across engines (interpolating percentiles
    average two doubles and inherit rounding ties; the moving-avg
    lesson). NULL values are excluded up front (engines disagree on
    NULL sort position: Spark ASC is NULLS FIRST, ANSI/DuckDB NULLS
    LAST).

    Plan shape: one hash partition by key carrying BOTH the cume_dist
    window and the same-key groupBy (Catalyst reuses the exchange —
    single shuffle), with a per-key sort for the window. The sort is
    the honest cost of exactness; its input is one key's rows, not the
    table. At 100 TB the first-pass dashboard read should use Spark's
    ``approx_percentile`` (a mergeable sketch with map-side partial
    aggregation and bounded rank error — asserted against this exact
    operator in tests); this operator is the exact tier the sketch is
    audited against, and the reduced rollup tiers keep its per-key
    sort input small.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.col(value_col))
    d = df.where(F.col(value_col).isNotNull()).withColumn(
        "_cd", F.cume_dist().over(w)
    )
    aggs = [F.count("*").cast("long").alias("n")]
    for name, q in qs.items():
        if not 0.0 < q <= 1.0:
            raise ValueError(f"quantile {name}={q} outside (0, 1]")
        aggs.append(
            F.min(
                F.when(F.col("_cd") >= F.lit(float(q)), F.col(value_col))
            ).alias(name)
        )
    return d.groupBy(*keys).agg(*aggs)


def corr_stats(
    df: DataFrame,
    keys: list,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-key Pearson correlation between two channels (e.g. does a
    page's size track its signal?) carried as EXACT decimal component
    sums — the mergeable form: (n, Σx, Σy, Σx², Σy², Σxy) add across
    partitions/tiers like the rollup's (cnt, vsum), so correlation
    composes over time tiers exactly the way the continuous
    aggregates do, and r is derived once at read time:

        r = (n·Σxy − Σx·Σy) / sqrt((n·Σx²−Σx²)·(n·Σy²−Σy²))

    Inputs are quantized via rollup.vsum_cast (DECIMAL(18,9), loud
    |v| < 1e9 overflow guard); products are (18,9)×(18,9) →
    DECIMAL(37,18) — exact, no precision-38 scale reduction. Rows
    where either channel is NULL are excluded (pairwise-complete).
    ``r`` is NULL for degenerate (zero-variance) keys — detected
    EXACTLY as min(x)==max(x) on the quantized decimals, never from
    the double variance term: n·Σx²−(Σx)² evaluated in doubles can
    round to a small NEGATIVE for a constant channel (observed:
    −65536.0 at n=28, x≈8.6e8), and sqrt(negative) would leak r=NaN
    past isNull() filters. The double terms are additionally clamped
    at 0 so near-degenerate keys can't NaN either — they fall to
    sqrt(0) → try_divide → NULL.

    One partial-aggregated groupBy — a single narrow shuffle of six
    numbers per key.
    """
    from .rollup import vsum_cast

    pair = df.where(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    )
    x, y = vsum_cast(x_col), vsum_cast(y_col)
    agg = pair.groupBy(*keys).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
        F.min(x).alias("_xmin"), F.max(x).alias("_xmax"),
        F.min(y).alias("_ymin"), F.max(y).alias("_ymax"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    degenerate = (F.col("_xmin") == F.col("_xmax")) | (
        F.col("_ymin") == F.col("_ymax")
    )
    vx = F.greatest(F.lit(0.0), n * sxx - sx * sx)
    vy = F.greatest(F.lit(0.0), n * syy - sy * sy)
    return agg.withColumn(
        "r",
        F.when(degenerate, F.lit(None).cast("double")).otherwise(
            F.try_divide(n * sxy - sx * sy, F.sqrt(vx * vy))
        ),
    ).drop("_xmin", "_xmax", "_ymin", "_ymax")


def ohlc(
    df: DataFrame,
    keys: list,
    ts_col: str = TS_COL,
    value_col: str = "value",
) -> DataFrame:
    """Per-key OHLC (open/high/low/close) — the candlestick aggregate
    every financial/metrics dashboard draws; open/close are the
    bucket's first/last observed values.

    First/last selection is ORDER-STRUCT min/max:
    ``min(struct(ts, value)).value`` — lexicographic struct comparison
    makes duplicate timestamps deterministic (earliest ts, tie → the
    SMALLER value opens; latest ts, tie → the LARGER value closes),
    unlike bare ``min_by``/``arg_min`` whose tie choice is
    unspecified in both Spark and DuckDB. Every emitted number is an
    existing input double (pure selection, no arithmetic) — bit-stable
    across engines. NULL values are excluded (a NULL inside the
    ordering struct would poison the comparison).

    One groupBy with a map-side partial phase — min/max of a 2-field
    struct combines like any min/max (Spark plans it as SortAggregate
    since struct keys aren't hash-aggregable, but the partial/final
    split and the single narrow shuffle of four numbers + count per
    key are the same; plan-asserted in tests).
    """
    # ts must be non-null too: struct comparison orders a NULL ts
    # FIRST, so a timestamp-less row would hijack `open` — the exact
    # poisoning the docstring promises to prevent
    pair = df.where(
        F.col(value_col).isNotNull() & F.col(ts_col).isNotNull()
    )
    o_struct = F.struct(F.col(ts_col).alias("t"),
                        F.col(value_col).alias("v"))
    return pair.groupBy(*keys).agg(
        F.count("*").cast("long").alias("n"),
        F.min(o_struct)["v"].alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.max(o_struct)["v"].alias("close"),
    )


def topk_with_other(
    series: DataFrame,
    tier_us: int,
    k: int = 5,
    key: str = "url",
    ts_col: str = TS_COL,
) -> DataFrame:
    """Heavy hitters per bucket WITH the remainder folded into one
    ``__other__`` row (rank k+1) — the dashboard form of
    topk_per_bucket: a panel showing top-k series plus "everything
    else" must CONSERVE the bucket total, which a plain top-k filter
    silently drops. Per bucket: Σ cnt over the k+1 rows equals the
    bucket's event count exactly; ``n_keys`` says how many real keys
    each row folds (1 for top rows).

    Scale shape: one hash aggregation over (bucket, key), one rank
    window whose input is the AGGREGATE (never raw events), and a
    same-key remainder aggregation that reuses the bucket clustering
    — the remainder never materializes per-key rows downstream.
    """
    from pyspark.sql import Window as W

    b = (F.col(ts_col) - F.pmod(F.col(ts_col), F.lit(int(tier_us)))).cast(
        "long"
    )
    counts = (
        series.select(b.alias("bucket_us"), F.col(key))
        .groupBy("bucket_us", key)
        .agg(F.count("*").alias("cnt"))
    )
    w = W.partitionBy("bucket_us").orderBy(F.desc("cnt"), F.asc(key))
    ranked = counts.withColumn("rank", F.row_number().over(w))
    top = ranked.where(F.col("rank") <= int(k)).select(
        "bucket_us", F.col(key).alias("key"),
        F.col("cnt").cast("long").alias("cnt"),
        F.col("rank").cast("int").alias("rank"),
        F.lit(1).cast("long").alias("n_keys"),
    )
    other = (
        ranked.where(F.col("rank") > int(k))
        .groupBy("bucket_us")
        .agg(
            F.sum("cnt").cast("long").alias("cnt"),
            F.count("*").cast("long").alias("n_keys"),
        )
        .select(
            "bucket_us", F.lit("__other__").alias("key"), "cnt",
            F.lit(int(k) + 1).cast("int").alias("rank"), "n_keys",
        )
    )
    return top.unionByName(other)


def counter_resets(
    series: DataFrame,
    tier_us: int,
    key: str = "url",
    ts_col: str = TS_COL,
    value_col: str = "value",
    tiebreak: str | None = None,
) -> DataFrame:
    """Prometheus ``resets()``: how many times a monotonic counter
    restarted (negative delta vs the previous sample) per key and
    tumbling bucket — the process-restart/crash dashboard next to
    counter_rate, sharing its ordering conventions (a reset is
    attributed to the bucket of the FIRST sample after it). Also emits
    ``n_deltas`` (sample pairs observed in the bucket) so a
    reset-free quiet bucket (0/0) is distinguishable from a busy one
    (0/n). Exact longs only. Same single-shuffle shape: the bucket
    aggregate is partial-aggregated above the key window."""
    from pyspark.sql import Window as W

    order = [ts_col, tiebreak] if tiebreak else [ts_col]
    w = W.partitionBy(key).orderBy(*order)
    prev = F.lag(value_col).over(w)
    b = (F.col(ts_col) - F.pmod(F.col(ts_col), F.lit(int(tier_us)))).cast(
        "long"
    )
    d = (
        series.withColumn("_prev", prev)
        .where(F.col("_prev").isNotNull())
        .select(
            F.col(key),
            b.alias("bucket_us"),
            (F.col(value_col) < F.col("_prev")).cast("long").alias("_r"),
        )
    )
    return d.groupBy(key, "bucket_us").agg(
        F.sum("_r").cast("long").alias("n_resets"),
        F.count("*").cast("long").alias("n_deltas"),
    )


def holt_smooth(
    df: DataFrame,
    alpha: float = 0.5,
    beta: float = 0.5,
    key_cols: tuple[str, ...] = ("url_prefix", "lang"),
    order_col: str = "bucket_us",
    value_col: str = "cnt",
) -> DataFrame:
    """Holt's linear-trend double exponential smoothing per key — the
    step past ewma_smooth when the series has drift (Holt 1957):

        l₀ = x₀;  b₀ = 0
        lᵢ = α·xᵢ + (1−α)·(lᵢ₋₁ + bᵢ₋₁)
        bᵢ = β·(lᵢ − lᵢ₋₁) + (1−β)·bᵢ₋₁

    Emits ``level``, ``trend``, and the one-step-ahead ``forecast``
    (lᵢ₋₁ + bᵢ₋₁ seen by row i; null for the first row) — the
    capacity-planning primitive. Same execution contract as
    ewma_smooth: the two-state recursion is order-dependent, so
    ``applyInPandas`` per key, one exchange, one linear pass, O(1)
    state; each step is the exact written IEEE expression, so a
    recursive-CTE replay is bit-identical (α = β = 0.5 keeps every
    coefficient an exact binary fraction).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    a, b = float(alpha), float(beta)
    ia, ib = 1.0 - a, 1.0 - b
    in_fields = [df.schema[c] for c in (*key_cols, order_col, value_col)]
    schema = T.StructType(
        list(in_fields) + [
            T.StructField("level", T.DoubleType()),
            T.StructField("trend", T.DoubleType()),
            T.StructField("forecast", T.DoubleType()),
        ]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort",
                              ignore_index=True)
        xs = pdf[value_col].to_numpy(np.float64)
        n = len(xs)
        ls = np.empty(n)
        bs = np.empty(n)
        fc = np.empty(n)
        lev, tr = 0.0, 0.0
        for i, x in enumerate(xs):
            if i == 0:
                lev, tr = x, 0.0
                fc[i] = np.nan
            else:
                fc[i] = lev + tr
                new_lev = a * x + ia * (lev + tr)
                tr = b * (new_lev - lev) + ib * tr
                lev = new_lev
            ls[i] = lev
            bs[i] = tr
        out = pdf[[*key_cols, order_col, value_col]].copy()
        out["level"] = ls
        out["trend"] = bs
        out["forecast"] = fc
        return out

    return (
        df.select(*key_cols, order_col, value_col)
        .groupBy(*key_cols)
        .applyInPandas(fn, schema=schema)
    )


def regr_components(
    df: DataFrame,
    keys: list,
    t_col: str,
    y_col: str,
    t_origin_col: str | None = None,
) -> DataFrame:
    """Per-key least-squares regression of a channel on time —
    Prometheus ``deriv()`` / ``predict_linear()`` parity — carried as
    EXACT decimal component sums (n, Σt, Σy, Σt², Σty), the mergeable
    form (components add across partitions/tiers like corr_stats);
    slope and intercept are derived once at read time:

        slope     = (n·Σty − Σt·Σy) / (n·Σt² − (Σt)²)
        intercept = (Σy − slope·Σt) / n

    ``t_origin_col``: optional per-row origin (e.g. the bucket start)
    subtracted from ``t_col`` so t offsets stay small: t as
    DECIMAL(12,0) μs (< 10¹², i.e. offsets up to ~11.5 days) keeps
    t² at (25,0) and t·y at (31,9) — all exact, no precision-38 scale
    loss. y is quantized via rollup.vsum_cast (|y| < 1e9 domain).
    NULL y rows are excluded. Degenerate keys (all observations at
    one instant) yield NULL slope AND intercept — detected EXACTLY as
    min(t)==max(t) on the decimal offsets, never from the double
    denominator: n·Σt²−(Σt)² evaluated in doubles can round to a
    small NONZERO for a constant t (observed: 2³¹ at n=41,
    t≈8.4e10), so try_divide alone would emit a bogus slope up to
    ~1.5e-5 (or IEEE −0.0, the hash hazard) instead of NULL.

    One partial-aggregated groupBy — a narrow shuffle of five numbers
    per key.
    """
    from .rollup import vsum_cast

    t_rel = F.col(t_col) - (
        F.col(t_origin_col) if t_origin_col else F.lit(0)
    )
    pair = df.where(F.col(y_col).isNotNull())
    t = t_rel.cast("decimal(12,0)")
    y = vsum_cast(y_col)
    agg = pair.groupBy(*keys).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(t).alias("st"),
        F.sum(y).alias("sy"),
        F.sum(t * t).alias("stt"),
        F.sum(t * y).alias("sty"),
        F.min(t).alias("_tmin"), F.max(t).alias("_tmax"),
    )
    n = F.col("n").cast("double")
    st, sy = F.col("st").cast("double"), F.col("sy").cast("double")
    stt, sty = F.col("stt").cast("double"), F.col("sty").cast("double")
    slope = F.when(
        F.col("_tmin") == F.col("_tmax"), F.lit(None).cast("double")
    ).otherwise(F.try_divide(n * sty - st * sy, n * stt - st * st))
    return agg.withColumn("slope", slope).withColumn(
        "intercept", (sy - slope * st) / n
    ).drop("_tmin", "_tmax")


def cusum_flags(
    rolled: DataFrame,
    h_mult: int = 8,
    min_points: int = 24,
    value_col: str = "cnt",
    keys: tuple[str, ...] = ("url_prefix", "lang"),
) -> DataFrame:
    """Two-sided CUSUM change-point detection over a rollup tier —
    the drift alarm behind "this url-prefix's crawl volume shifted
    regime" (Page 1954's cumulative-sum chart, the sequential
    complement of anomaly_flags' per-bucket k·sigma test: CUSUM
    accumulates many SMALL same-signed deviations that no single
    bucket would flag).

    The classic recursion S_t = max(0, S_{t-1} + (x_t − μ)) looks
    inherently sequential, but with P_t = Σ_{i≤t}(x_i − μ) it closes
    to pure window algebra:  S_t = P_t − min(0, min_{j≤t} P_j)  — a running
    sum plus a running min, both plain window functions, no
    applyInPandas, no recursion (the EWMA/Holt operators need the
    sequential Arrow pass; CUSUM provably does not).

    Determinism (the anomaly_flags discipline): no float ever enters
    the statistic. With N = per-key bucket count and S = per-key total
    of the integer ``value_col``, scale everything by N so the mean
    needs no division:

        G_t     = N·RunningSum_t − t·S        (≡ N·P_t, exact)
        cusum⁺  = G_t − min(0, min_{j≤t} G_j)  (≡ N·S_t)
        cusum⁻  = max(0, max_{j≤t} G_j) − G_t

    computed in DECIMAL(38,0) from longs. The alarm threshold is
    mean-relative: flag when cusum⁺ > h_mult·S ⟺ S_t > h_mult·μ —
    i.e. the accumulated excess exceeds ``h_mult`` bucket-means
    (σ-relative thresholds need a sqrt; the mean-relative form keeps
    the flag float-free and SQL-replayable bit-for-bit).

    Scale shape: ONE hash partition by key carries every window
    (full-frame totals + both running frames share the sort);
    runs over the TIER (bounded buckets/key), never raw events.
    Operand bound: N·S < 10³⁸ (buckets/key × total points — beyond
    any real tenant).
    """
    from pyspark.sql import Window as W

    dec = "decimal(38,0)"
    w_full = W.partitionBy(*keys)
    w_ord = W.partitionBy(*keys).orderBy("bucket_us")
    w_run = w_ord.rowsBetween(W.unboundedPreceding, W.currentRow)
    x = F.col(value_col).cast("long")
    n_total = F.count(value_col).over(w_full)
    s_total = F.sum(x).over(w_full)
    t_idx = F.row_number().over(w_ord)
    run_sum = F.sum(x).over(w_run)
    g = (n_total.cast(dec) * run_sum.cast(dec)
         - t_idx.cast(dec) * s_total.cast(dec))
    base = rolled.select(
        *keys, "bucket_us", x.alias(value_col),
        n_total.alias("_n"), s_total.alias("_s"), g.alias("_g"),
    )
    run_min = F.min(F.least(F.col("_g"), F.lit(0).cast(dec))).over(w_run)
    run_max = F.max(F.greatest(F.col("_g"), F.lit(0).cast(dec))).over(w_run)
    pos = (F.col("_g") - run_min).alias("cusum_pos")
    neg = (run_max - F.col("_g")).alias("cusum_neg")
    thresh = F.lit(int(h_mult)).cast(dec) * F.col("_s").cast(dec)
    ok = F.col("_n") >= int(min_points)
    return base.select(
        *keys, "bucket_us", value_col,
        pos, neg,
        (ok & (pos > thresh)).alias("shift_up"),
        (ok & (neg > thresh)).alias("shift_down"),
    )


def acf_stats(
    rolled: DataFrame,
    tier_us: int,
    lag: int = 1,
    value_col: str = "cnt",
    keys: tuple[str, ...] = ("url_prefix", "lang"),
) -> DataFrame:
    """Per-key autocorrelation of a rollup tier at ``lag`` buckets —
    "does this hour's traffic track the same hour yesterday?"
    (lag = 24 on the 1h tier): Pearson correlation of
    (x_t, x_{t+lag}) carried as corr_stats' EXACT mergeable decimal
    component sums; ``r`` derives once at read time and stays out of
    any hashed projection.

    Pairs come from an equi-self-join on the EXACT bucket offset
    (bucket_us = bucket_us + lag·tier_us), not a row-offset lag():
    the tier is sparse, and a ROWS-frame lag over holes would pair
    values ``lag`` OBSERVATIONS apart instead of ``lag`` BUCKETS
    apart (the moving_aggregate RANGE-frame rationale applied to
    joins). Buckets whose lagged partner is missing drop out —
    pairwise-complete over observed buckets, holes are not imputed.

    Scale shape: a co-partitioned narrow self-join (both sides hash
    on (keys, bucket) — one shuffle each over tier-sized input) into
    corr_stats' single partial-aggregated groupBy.
    """
    off = int(lag) * int(tier_us)
    a = rolled.select(
        *keys, "bucket_us", F.col(value_col).alias("_x")
    )
    b = rolled.select(
        *keys,
        (F.col("bucket_us") - F.lit(off)).alias("bucket_us"),
        F.col(value_col).alias("_y"),
    )
    return corr_stats(a.join(b, on=[*keys, "bucket_us"]),
                      list(keys), "_x", "_y")


def mad_flags(
    rolled: DataFrame,
    k: int = 5,
    min_points: int = 24,
    value_col: str = "cnt",
    keys: tuple[str, ...] = ("url_prefix", "lang"),
) -> DataFrame:
    """Robust per-bucket outlier flags over a rollup tier via median
    absolute deviation — the companion anomaly_flags needs when the
    baseline itself is contaminated: mean/σ move with every outlier
    (masking), medians don't (50% breakdown point).

    Both medians use exact_quantiles' DISCRETE selection rule (the
    smallest value whose cume_dist reaches 0.5 — an existing input
    value, no interpolation arithmetic), so with integer inputs the
    whole chain — med, dev = |x − med|, mad = med(dev), flag
    dev > k·mad — is EXACT LONGS end to end; a SQL replayer agrees
    bit-for-bit. Degenerate keys (mad = 0: over half the buckets sit
    at the median) flag any deviating bucket, like anomaly_flags'
    σ = 0 case.

    Scale shape: one hash partition by key reused by all four
    windows; two per-key sorts (by value, then by deviation) are the
    honest cost of exact medians — over the TIER, never raw events.
    The first-pass read at 100 TB is approx_percentile's mergeable
    sketch; this is the exact tier it's audited against.
    """
    from pyspark.sql import Window as W

    w_full = W.partitionBy(*keys)
    x = F.col(value_col).cast("long")
    cd_v = F.cume_dist().over(w_full.orderBy(F.col(value_col)))
    base = rolled.select(
        *keys, "bucket_us", x.alias(value_col), cd_v.alias("_cdv"),
    )
    med = F.min(
        F.when(F.col("_cdv") >= 0.5, F.col(value_col))
    ).over(w_full)
    base = base.select(
        *keys, "bucket_us", value_col, med.alias("_med"),
        (F.abs(F.col(value_col) - med)).alias("_dev"),
    )
    cd_d = F.cume_dist().over(w_full.orderBy(F.col("_dev")))
    base = base.withColumn("_cdd", cd_d)
    mad = F.min(F.when(F.col("_cdd") >= 0.5, F.col("_dev"))).over(w_full)
    n = F.count("*").over(w_full)
    flag = (n >= int(min_points)) & (
        F.col("_dev") > F.lit(int(k)) * mad
    )
    return base.select(
        *keys, "bucket_us", value_col,
        F.col("_med").alias("med"),
        F.col("_dev").alias("abs_dev"),
        mad.alias("mad"),
        flag.alias("is_outlier"),
        F.when(flag, F.signum((F.col(value_col) - F.col("_med"))
                              .cast("double")).cast("int"))
        .otherwise(F.lit(0)).alias("direction"),
    )


def json_field_rollup(
    events: DataFrame,
    field: str,
    group_col: str = "event_type",
    props_col: str = "props",
) -> DataFrame:
    """Schema-on-read over a semi-structured JSON column — the
    payload-mining query every event pipeline runs before anyone
    agrees on a schema: extract one numeric field from ``props_col``
    and aggregate it per group.

    Extraction uses ``from_json`` with an explicit single-field
    schema, NOT get_json_object: the typed parse is a Catalyst
    expression (whole-stage codegen, one parse per row even when
    multiple fields are later projected), and malformed rows yield
    NULL (counted out via n_parsed vs n) instead of failing the job
    under ANSI. All aggregates are exact longs.

    Scale shape: one partial-aggregated groupBy — parsing happens
    map-side inside codegen; nothing but (group, 4 longs) shuffles.
    """
    parsed = F.from_json(
        F.col(props_col), f"{field} BIGINT"
    )[field]
    return events.select(
        F.col(group_col), parsed.alias("_v")
    ).groupBy(group_col).agg(
        F.count("*").cast("long").alias("n"),
        F.count("_v").cast("long").alias("n_parsed"),
        F.sum("_v").cast("long").alias("vsum"),
        F.min("_v").cast("long").alias("vmin"),
        F.max("_v").cast("long").alias("vmax"),
    )


def value_changes(
    series: DataFrame,
    tier_us: int,
    key: str = "url",
    ts_col: str = TS_COL,
    value_col: str = "value",
    tiebreak: str | None = None,
) -> DataFrame:
    """Prometheus ``changes()`` parity: per (key, bucket), how many
    times the series' value CHANGED between consecutive observations
    — the flap/instability counter (a gauge oscillating between two
    values has high changes() and near-zero rate()). A change is
    attributed to the bucket of the LATER observation (the moment the
    new value was seen — the counter_resets attribution rule); each
    key's first observation has no predecessor and counts 0. Exact
    longs; NULL-value rows are excluded up front (engines disagree on
    NULL equality semantics in lag comparisons).

    Scale shape: one key-partitioned lag window + one (key, bucket)
    aggregation on the SAME hash — Catalyst reuses the exchange
    (the sessionize single-shuffle shape).
    """
    from pyspark.sql import Window as W

    order = [ts_col, tiebreak] if tiebreak else [ts_col]
    w = W.partitionBy(key).orderBy(*order)
    d = series.where(F.col(value_col).isNotNull())
    prev = F.lag(value_col).over(w)
    changed = (
        prev.isNotNull() & (F.col(value_col) != prev)
    ).cast("long")
    b = (F.col(ts_col) - F.pmod(F.col(ts_col), F.lit(int(tier_us)))) \
        .cast("long")
    return (
        d.select(F.col(key), b.alias("bucket_us"),
                 changed.alias("_chg"))
        .groupBy(key, "bucket_us")
        .agg(
            F.count("*").cast("long").alias("n_obs"),
            F.sum("_chg").cast("long").alias("n_changes"),
        )
    )
