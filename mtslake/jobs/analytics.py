"""Analytics job: decoded series → dashboard read surfaces — OHLC
candles, exact percentiles, LOCF time-weighted averages, cross-channel
correlation — as parquet outputs next to the rollup tiers.

spark-submit --py-files mtslake.zip mtslake/jobs/analytics.py \\
    --store /data/lake --out /data/analytics \\
    --tier 1h --quantiles 0.5,0.9,0.99

Writes under ``--out`` (each selectable; default: all):
  * ``ohlc/``       — per (url_prefix, lang, bucket) candles
  * ``quantiles/``  — exact discrete percentiles of the float channel
  * ``twa/``        — LOCF time-weighted average per url and bucket
  * ``corr/``       — mergeable Pearson component sums
    (n, Σx, Σy, Σx², Σy², Σxy) between n_chars and value + derived r

All four are single-exchange plans per key (plan tests in
tests/test_plans.py); the job is one decoded scan fanned into four
key-partitioned passes.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from mtslake.catalog import ChunkStore
from mtslake.config import TIER_US
from mtslake.gapfill import time_weighted
from mtslake.jobs.common import base_parser, build_session
from mtslake.read import read_range
from mtslake.series import TS_COL, exact_quantiles, ohlc, url_prefix


def main(argv=None) -> None:
    p = base_parser("mtslake analytics surfaces")
    p.add_argument("--out", required=True, help="output root")
    p.add_argument("--tier", default="1h", help="bucket tier (1m/1h/1d)")
    p.add_argument("--quantiles", default="0.5,0.9,0.99",
                   help="comma-separated quantiles in (0,1]")
    p.add_argument("--surfaces", default="ohlc,quantiles,twa,corr,m4",
                   help="comma-separated subset to compute")
    p.add_argument("--m4-width", type=int, default=512,
                   help="pixel columns per key for the m4 surface")
    args = p.parse_args(argv)
    spark = build_session("mtslake-analytics", args)
    store = ChunkStore(spark, args.store)
    surfaces = {s.strip() for s in args.surfaces.split(",") if s.strip()}

    series = read_range(store)
    us = int(TIER_US[args.tier])
    keyed = series.select(
        url_prefix().alias("url_prefix"),
        "lang",
        (F.col(TS_COL) - F.pmod(F.col(TS_COL), F.lit(us)))
        .alias("bucket_us"),
        TS_COL, "url", "n_chars", "value",
    )
    keys = ["url_prefix", "lang", "bucket_us"]

    def _write_count(df, path: str) -> int:
        # count the PARQUET just written, not the source DataFrame —
        # df.count() after df.write would re-execute the whole
        # decode/window/join plan a second time
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path).count()

    if "ohlc" in surfaces:
        out = ohlc(keyed, keys, ts_col=TS_COL, value_col="value")
        print(f"ohlc buckets           {_write_count(out, f'{args.out}/ohlc')}")
    if "quantiles" in surfaces:
        # label from the %g decimal form so sub-percent quantiles
        # don't collide (0.999 -> p99_9, not the same p99 as 0.99)
        qs = {"p" + ("%g" % (float(q) * 100)).replace(".", "_"): float(q)
              for q in args.quantiles.split(",") if q.strip()}
        out = exact_quantiles(keyed, keys, "value", qs)
        print(f"quantile buckets       {_write_count(out, f'{args.out}/quantiles')}")
    if "twa" in surfaces:
        out = time_weighted(series, args.tier, keys=["url"])
        print(f"twa buckets            {_write_count(out, f'{args.out}/twa')}")
    if "corr" in surfaces:
        from mtslake.series import corr_stats

        out = corr_stats(keyed, keys, "n_chars", "value")
        print(f"corr groups            {_write_count(out, f'{args.out}/corr')}")
    if "m4" in surfaces:
        from mtslake.downsample import m4_downsample

        span = series.agg(
            F.min(TS_COL).alias("a"), F.max(TS_COL).alias("b")
        ).first()
        px_us = max(1, (int(span["b"]) - int(span["a"])) // args.m4_width)
        out = m4_downsample(series, px_us, key_cols=("url",))
        print(f"m4 rows                {_write_count(out, f'{args.out}/m4')}")


if __name__ == "__main__":
    main(sys.argv[1:])
