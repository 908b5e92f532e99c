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
        F.sha1(F.encode(F.col("text"), "UTF-8")).alias("text_sha1"),
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
        F.sha1(F.encode(F.col("props"), "UTF-8")).alias("text_sha1"),
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
