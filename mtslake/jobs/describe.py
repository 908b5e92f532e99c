"""Describe job (≙ mtsdesc, mtscomp.py:1131-1150): dataset stats from
the chunk catalog only — payloads are never read.

spark-submit --py-files mtslake.zip mtslake/jobs/describe.py --store /data/lake
"""

from __future__ import annotations

import sys

from mtslake.catalog import ChunkStore
from mtslake.jobs.common import base_parser, build_session


def main(argv=None) -> None:
    p = base_parser("mtslake describe")
    args = p.parse_args(argv)
    spark = build_session("mtslake-describe", args)
    store = ChunkStore(spark, args.store)
    for k, v in store.describe().first().asDict().items():
        print(f"{k:22s} {v}")


if __name__ == "__main__":
    main(sys.argv[1:])
