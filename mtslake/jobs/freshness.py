"""Crawl-freshness job: page-history parquet → change stats, drift
magnitude, and liveness/uptime → parquet outputs.

spark-submit --py-files mtslake.zip mtslake/jobs/freshness.py \\
    --pages /data/pages --out /data/freshness \\
    --shingle-k 1 --lease-minutes 30 --uptime-tier 1d

Writes under ``--out``:
  * ``change_stats/`` — per-url snapshot counts, detected changes,
    change ratio, recrawl-interval estimate (freshness.change_stats)
  * ``drift/``        — per-url pooled shingle-Jaccard drift
    (freshness.drift_stats; --shingle-k words per shingle)
  * ``uptime/``       — per-(url, bucket) observed-fresh liveness
    under a --lease-minutes recrawl lease (sessions.uptime)

One shared scan of the pages table; each operator is a single-exchange
plan over the url key (plan tests in tests/test_plans.py), so the job
is three key-partitioned passes — no O(corpus²) step anywhere.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mtslake.freshness import change_stats, drift_stats
from mtslake.jobs.common import base_parser, build_session
from mtslake.sessions import uptime


def main(argv=None) -> None:
    p = base_parser("mtslake freshness")
    p.add_argument("--pages", required=True,
                   help="page-history parquet (url, warc_ts, text, ...)")
    p.add_argument("--out", required=True, help="output root")
    p.add_argument("--shingle-k", type=int, default=1,
                   help="words per shingle for drift magnitude")
    p.add_argument("--lease-minutes", type=int, default=30,
                   help="freshness lease for the uptime surface")
    p.add_argument("--uptime-tier", default="1d",
                   help="uptime bucket tier (1m/1h/1d)")
    args = p.parse_args(argv)
    spark = build_session("mtslake-freshness", args)

    pages = spark.read.parquet(args.pages)

    def _write_count(df, path: str) -> int:
        # count the written parquet — df.count() after the write would
        # re-execute the full plan a second time
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path).count()

    cs = change_stats(pages)
    print(f"change_stats urls      "
          f"{_write_count(cs, f'{args.out}/change_stats')}")

    dr = drift_stats(pages, k=args.shingle_k)
    print(f"drift urls             {_write_count(dr, f'{args.out}/drift')}")

    pings = pages.select(
        "url", F.unix_micros(F.col("warc_ts")).alias("ts_us"))
    up = uptime(pings, lease_us=args.lease_minutes * 60 * 1_000_000,
                tier=args.uptime_tier)
    print(f"uptime buckets         {_write_count(up, f'{args.out}/uptime')}")


if __name__ == "__main__":
    main()
