"""Compaction job: re-encode fragmented chunks (multiple payload rows
per (url, chunk_id) left by hot-chunk segmentation or streaming
sealing) into the canonical batch layout. O(fragmented partitions).

spark-submit --py-files mtslake.zip mtslake/jobs/compact.py --store /data/lake
"""

from __future__ import annotations

import sys

from mtslake.catalog import ChunkStore
from mtslake.compact import compact
from mtslake.jobs.common import base_parser, build_session, config_from


def main(argv=None) -> None:
    p = base_parser("mtslake compact")
    args = p.parse_args(argv)
    spark = build_session("mtslake-compact", args)
    store = ChunkStore(spark, args.store)
    print(compact(store, cfg=store.cfg_for_store(config_from(args))))


if __name__ == "__main__":
    main(sys.argv[1:])
