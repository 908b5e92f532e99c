"""Rollup job: decode chunks → 1m/1h/1d continuous-aggregate tiers.

spark-submit --py-files mtslake.zip mtslake/jobs/rollup.py --store /data/lake
"""

from __future__ import annotations

import sys

from mtslake.catalog import ChunkStore
from mtslake.jobs.common import base_parser, build_session
from mtslake.read import read_range
from mtslake.rollup import materialize_tiers


def main(argv=None) -> None:
    p = base_parser("mtslake rollup tiers")
    p.add_argument(
        "--units", default=None,
        help="comma-separated chunk units to refresh incrementally "
             "(tier partitions overlapping them are recomputed; "
             "everything else untouched). Omit for a full rebuild.",
    )
    args = p.parse_args(argv)
    spark = build_session("mtslake-rollup", args)
    store = ChunkStore(spark, args.store)
    if args.units:
        from mtslake.rollup import refresh_tiers

        units = [int(u) for u in args.units.split(",") if u.strip()]
        print(refresh_tiers(store, units))
    else:
        decoded = read_range(store)
        materialize_tiers(store, decoded)


if __name__ == "__main__":
    main(sys.argv[1:])
