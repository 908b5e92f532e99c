"""Deterministic synthetic Common-Crawl-style pages table.

Input-hint shape (BASELINE.json:16):
``(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)``

Everything is a pure deterministic function of ``(url_id, snap_idx)``
computed with Spark built-ins over ``spark.range`` — no driver-side
loops, no RNG state, no external data — so any scale factor regenerates
identically on any cluster (the property that makes checkpoint-resume
and cross-run verification testable, ≙ the reference's seeded fixtures,
tests.py:39-97).

Fixtures baked in (FIXTURES.md §1,§4):
  * Zipf-ish skew: a few hot domains get ~100× snapshot density
  * seeded jitter on a 15-minute base grid
  * dropped intervals (gap-fill / LOCF fixture)
  * occasional duplicate ``warc_ts`` per url (tiebreak fixture)
  * ``lang`` fixed per url from {en,de,fr,zh,es}
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# epoch seconds of 2024-01-01T00:00:00Z, as a NUMERIC literal: deriving
# it via unix_timestamp(cast(string)) made the whole dataset depend on
# spark.sql.session.timeZone — a non-UTC cluster shifted every
# timestamp (and chunk_id) by its offset, breaking the "regenerates
# identically on any cluster" determinism contract
START_EPOCH_S = 1_704_067_200
GRID_S = 900  # 15-minute base grid
LANGS = ["en", "de", "fr", "zh", "es"]


def generate_pages(
    spark: SparkSession,
    n_urls: int = 100,
    snapshots_per_url: int = 64,
    n_hot: int = 2,
    hot_factor: int = 100,
    with_gaps: bool = True,
) -> DataFrame:
    """Deterministic pages table; ~n_urls*snapshots_per_url rows plus
    hot-url amplification (skew fixture, north_rule)."""
    urls = (
        spark.range(n_urls)
        .withColumnRenamed("id", "url_id")
        .withColumn(
            "n_snaps",
            F.when(F.col("url_id") < n_hot, F.lit(snapshots_per_url * hot_factor))
            .otherwise(F.lit(snapshots_per_url)),
        )
        .withColumn(
            "domain",
            F.concat(
                F.lit("d"),
                (F.pmod(F.xxhash64(F.col("url_id")), F.lit(max(n_urls // 10, 1)))).cast(
                    "string"
                ),
            ),
        )
        .withColumn(
            "url",
            F.concat(
                F.lit("https://"),
                F.col("domain"),
                F.lit(".example.com/page/"),
                F.col("url_id").cast("string"),
            ),
        )
        .withColumn(
            "lang",
            F.element_at(
                F.array(*[F.lit(x) for x in LANGS]),
                (F.pmod(F.xxhash64(F.col("url_id"), F.lit(7)), F.lit(len(LANGS))) + 1)
                .cast("int"),
            ),
        )
    )

    snaps = urls.withColumn(
        "snap_idx", F.explode(F.sequence(F.lit(0), F.col("n_snaps") - 1))
    )

    h = F.xxhash64(F.col("url_id"), F.col("snap_idx"))
    # 15-min grid + ±60 s seeded jitter (order-preserving: |jitter| < grid/2)
    jitter_s = F.pmod(h, F.lit(121)) - F.lit(60)
    # duplicate-ts fixture: every ~50th snapshot of some urls repeats
    # the previous snapshot's FULL offset — grid point INCLUDING its
    # jitter. (Repeating only the bare grid point collided with the
    # jittered neighbor only when that row's jitter happened to be 0,
    # p≈1/121 — the documented tiebreak fixture was effectively inert.)
    prev_jitter_s = F.pmod(
        F.xxhash64(F.col("url_id"), F.col("snap_idx") - 1), F.lit(121)
    ) - F.lit(60)
    is_dup = (F.pmod(F.col("url_id"), F.lit(17)) == 0) & (
        F.pmod(F.col("snap_idx"), F.lit(50)) == 1
    )
    offset_s = F.when(
        is_dup, (F.col("snap_idx") - 1) * GRID_S + prev_jitter_s
    ).otherwise(F.col("snap_idx") * GRID_S + jitter_s)

    snaps = snaps.withColumn(
        "warc_ts",
        F.timestamp_micros(
            (F.lit(START_EPOCH_S) + offset_s) * F.lit(1_000_000)
        ),
    )

    if with_gaps:
        # dropped-interval fixture: deterministic ~8% holes (never the
        # first snapshot, so every url keeps an anchor point)
        keep = (F.pmod(F.xxhash64(F.col("url_id"), F.col("snap_idx"), F.lit(13)),
                       F.lit(12)) != 0) | (F.col("snap_idx") == 0)
        snaps = snaps.filter(keep)

    # deterministic text: token run whose length varies by snapshot
    n_rep = (F.pmod(F.xxhash64(F.col("url_id"), F.col("snap_idx"), F.lit(3)),
                    F.lit(40)) + 1).cast("int")
    # concat(cast) not format_string: identical bytes for non-negative
    # longs (%d is plain toString), but java.util.Formatter costs ~2 µs
    # per call — a visible slice of datagen wall at 10⁷ rows
    text = F.concat(
        F.lit("page "), F.col("url_id").cast("string"),
        F.lit(" snapshot "), F.col("snap_idx").cast("string"),
        F.lit(" lang "),
        F.repeat(F.lit("lorem ipsum dolor sit amet "), n_rep),
    )
    snaps = (
        snaps.withColumn("text", text)
        .withColumn(
            "html",
            F.encode(
                F.concat(F.lit("<html><body>"), F.col("text"), F.lit("</body></html>")),
                "UTF-8",
            ),
        )
    )
    return snaps.select("url", "warc_ts", "html", "text", "lang")
