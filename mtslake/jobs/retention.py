"""Retention job: expire raw chunks + tier rows past their horizons.

Idempotent; metadata-only partition drops for raw (≙ chop,
mtscomp.py:750-796).

spark-submit --py-files mtslake.zip mtslake/jobs/retention.py \
    --store /data/lake --now-us 1706745600000000
"""

from __future__ import annotations

import sys

from mtslake.catalog import ChunkStore
from mtslake.jobs.common import base_parser, build_session, config_from
from mtslake.retention import apply_retention


def main(argv=None) -> None:
    p = base_parser("mtslake retention")
    p.add_argument("--now-us", type=int, required=True)
    p.add_argument("--dry-run", action="store_true",
                   help="print the doomed-partition plan; delete nothing")
    args = p.parse_args(argv)
    spark = build_session("mtslake-retention", args)
    store = ChunkStore(spark, args.store)
    # store-pinned layout fields override site/CLI config
    print(apply_retention(store, now_us=args.now_us,
                          cfg=store.cfg_for_store(config_from(args)),
                          dry_run=args.dry_run))


if __name__ == "__main__":
    main(sys.argv[1:])
