"""Display downsampling: M4 and Largest-Triangle-Three-Buckets.

The rollup tiers answer aggregate queries; LTTB (Sveinn Steinarsson,
"Downsampling Time Series for Visual Representation", MSc thesis,
University of Iceland 2013 — public) answers *plotting*: pick the
``n_out`` points that preserve the visual shape of a series, exactly
what every dashboard's zoomed-out view needs.

LTTB is inherently sequential per series (each kept point depends on
the previous kept point), so this is the documented
``applyInPandas``-per-group case (SURVEY: custom operators Spark
lacks): one group = one (url, channel) series, vectorized numpy inside
the kernel (per-bucket argmax of the triangle areas — no per-point
Python). Scale shape: one hash shuffle on the series key; per-task
memory is one series' plotted RANGE, which a display query has already
pruned to a window via ``read_range`` — you downsample what you plot,
not the corpus. For an unboundedly long range, downsample a rollup
tier instead of raw points (the tiers exist precisely to bound that).

Determinism: ties in the triangle-area argmax take the FIRST maximal
point (np.argmax), so output is reproducible and the contract query
grades it against an independent scalar transcription of the published
algorithm.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def m4_downsample(
    series: DataFrame,
    bucket_us: int,
    key_cols: tuple[str, ...] = ("url",),
    ts_col: str = "ts_us",
    value_col: str = "value",
) -> DataFrame:
    """M4 downsampling (Jugel et al., "M4: A Visualization-Oriented
    Time Series Data Aggregation", PVLDB 7(10), 2014 — public): per
    (key, pixel-column bucket) keep exactly the rows that realize the
    four extremes — first ts, last ts, min value, max value. M4 is
    error-free for line visualizations at the chosen pixel width, and
    unlike LTTB it is a pure relational composition, so it runs
    JVM-side end to end:

        bucket = ts div bucket_us
        agg    = per-(key, bucket) min/max of (ts, value)   -- partial
                                                            -- agg, tiny
        keep   = raw ⋈ agg ON (key, bucket) WHERE ts IN (ts_min, ts_max)
                                               OR value IN (vmin, vmax)

    Scale shape: the aggregate is |buckets| rows (≪ raw — that is the
    point of downsampling), so AQE turns the equi-join into a broadcast
    and the raw side NEVER shuffles; rows whose bucket lacks extremes
    are filtered map-side. Duplicate-extreme ties keep every achieving
    row then DISTINCT on the projected columns — deterministic, and
    replayed verbatim by the SQL oracle.
    """
    b = (F.col(ts_col) - F.pmod(F.col(ts_col), F.lit(bucket_us))).alias("bucket_us")
    raw = series.select(*key_cols, b, ts_col, value_col)
    agg = raw.groupBy(*key_cols, "bucket_us").agg(
        F.min(ts_col).alias("_ts_min"),
        F.max(ts_col).alias("_ts_max"),
        F.min(value_col).alias("_vmin"),
        F.max(value_col).alias("_vmax"),
    )
    keep = (
        raw.join(agg, [*key_cols, "bucket_us"])  # AQE: broadcast at runtime
        .where(
            (F.col(ts_col) == F.col("_ts_min"))
            | (F.col(ts_col) == F.col("_ts_max"))
            | (F.col(value_col) == F.col("_vmin"))
            | (F.col(value_col) == F.col("_vmax"))
        )
        .select(*key_cols, "bucket_us", ts_col, value_col)
        .distinct()
    )
    return keep


def _lttb_kernel(ts: np.ndarray, vs: np.ndarray, n_out: int) -> np.ndarray:
    """Indices kept by LTTB over one sorted series (vectorized per
    bucket). First and last points are always kept."""
    n = ts.size
    if n_out >= n or n_out < 3:
        return np.arange(n)
    # bucket boundaries over the interior points (exclude first/last)
    edges = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
    kept = [0]
    a = 0  # index of the previously kept point
    for b in range(n_out - 2):
        lo, hi = edges[b], edges[b + 1]
        if hi <= lo:  # degenerate bucket (n_out close to n): nothing
            continue  # to pick here; output just has < n_out points
        nlo, nhi = edges[b + 1], (edges[b + 2] if b + 2 < len(edges) else n)
        # average of the NEXT bucket = the third triangle vertex (for
        # the last interior bucket this collapses to the final point,
        # as in the published algorithm)
        if nhi <= nlo:
            nlo, nhi = n - 1, n
        cx = ts[nlo:nhi].mean()
        cy = vs[nlo:nhi].mean()
        # triangle area for every candidate in this bucket (vectorized)
        ax, ay = ts[a], vs[a]
        bx, by = ts[lo:hi], vs[lo:hi]
        area = np.abs((ax - cx) * (by - ay) - (ax - bx) * (cy - ay))
        a = lo + int(np.argmax(area))
        kept.append(a)
    kept.append(n - 1)
    return np.asarray(kept)


def lttb_downsample(
    series: DataFrame,
    n_out: int = 200,
    key_cols: tuple[str, ...] = ("url",),
    ts_col: str = "ts_us",
    value_col: str = "value",
) -> DataFrame:
    """Per-key LTTB: keep ≤ ``n_out`` visually-representative points.

    Input rows need ``key_cols + (ts_col, value_col)``; output keeps
    those columns plus ``pt_seq`` (0-based kept-point order)."""
    from pyspark.sql import types as T

    # key columns keep their INPUT types (the ewma/holt convention):
    # hardcoding them as string broke long keys (user_id) with an
    # Arrow schema mismatch at the applyInPandas boundary
    out_schema = T.StructType(
        [series.schema[c] for c in key_cols]
        + [T.StructField(ts_col, T.LongType()),
           T.StructField(value_col, T.DoubleType()),
           T.StructField("pt_seq", T.IntegerType())]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort", ignore_index=True)
        ts = pdf[ts_col].to_numpy(np.int64)
        vs = pdf[value_col].to_numpy(np.float64)
        idx = _lttb_kernel(ts.astype(np.float64), vs, n_out)
        out = pdf.iloc[idx][list(key_cols) + [ts_col, value_col]].copy()
        out["pt_seq"] = np.arange(len(idx), dtype=np.int32)
        return out

    return (
        series.select(*key_cols, ts_col, value_col)
        .groupBy(*key_cols)
        .applyInPandas(fn, schema=out_schema)
    )


def sax_symbolize(
    rolled: DataFrame,
    alphabet: int = 8,
    value_col: str = "cnt",
    keys: tuple[str, ...] = ("url_prefix", "lang"),
) -> DataFrame:
    """SAX-style symbolic approximation over a rollup tier (Lin et
    al. 2003): each bucket's aggregate becomes one letter of an
    ``alphabet``-sized alphabet, turning a numeric series into a
    string for motif/novelty search and cheap similarity pruning. The
    tier IS the PAA step (piecewise aggregate means over fixed
    windows — exactly the rollup's (cnt, vsum) carry); this adds the
    symbolization.

    VARIANT — rank-SAX, by design: classic SAX z-normalizes and cuts
    at Gaussian quantile breakpoints (mean/σ + Φ⁻¹ — two
    transcendental steps no SQL replayer reproduces bit-for-bit).
    Equi-depth rank binning gives the same equiprobable-symbol
    property directly on the EMPIRICAL distribution:

        sym = ((row_number − 1) · alphabet) div n     (exact integers)

    ordered by (value, bucket_us) per key — the only float the
    operator touches is the ordering itself, and ordering under IEEE
    comparison is engine-portable. Degenerate keys (constant value)
    still spread deterministically by bucket order — equal values may
    straddle a bin boundary, split by time order, never arbitrarily.

    Scale shape: one hash partition by key + one per-key sort (the
    exact_quantiles shape); input is the TIER, never raw events.
    """
    from pyspark.sql import Window as W

    if not 2 <= int(alphabet) <= 26:
        raise ValueError(f"alphabet must be in [2, 26]: {alphabet}")
    a = int(alphabet)
    w_full = W.partitionBy(*keys)
    w_ord = w_full.orderBy(F.col(value_col), F.col("bucket_us"))
    staged = rolled.select(
        *keys, "bucket_us", value_col,
        F.row_number().over(w_ord).cast("long").alias("_rn"),
        F.count("*").over(w_full).cast("long").alias("_n"),
    )
    # integer `div`, NOT `/`: Spark's `/` is IEEE double division, and
    # a truncating cast back to long can land one off when the true
    # quotient sits within one ulp of an integer
    sym = F.expr(f"(( _rn - 1) * {a}) div _n")
    return staged.select(
        *keys, "bucket_us", value_col,
        sym.cast("int").alias("sym"),
        F.char(sym + F.lit(97)).alias("sym_char"),
    )
