"""Ingest job: deterministic pages table → parquet (input_hint shape).

spark-submit --py-files mtslake.zip mtslake/jobs/ingest.py \
    --store /data/lake --n-urls 100000 --snapshots 96
"""

from __future__ import annotations

import sys

from mtslake.datagen import generate_pages
from mtslake.jobs.common import base_parser, build_session


def main(argv=None) -> None:
    p = base_parser("mtslake ingest: synthesize the pages table")
    p.add_argument("--n-urls", type=int, default=1000)
    p.add_argument("--snapshots", type=int, default=96)
    p.add_argument("--hot", type=int, default=2)
    args = p.parse_args(argv)
    spark = build_session("mtslake-ingest", args)
    pages = generate_pages(
        spark, n_urls=args.n_urls, snapshots_per_url=args.snapshots,
        n_hot=args.hot,
    )
    pages.write.mode("overwrite").parquet(f"{args.store}/pages")


if __name__ == "__main__":
    main(sys.argv[1:])
