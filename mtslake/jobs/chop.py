"""Chop job (≙ mtschop, mtscomp.py:1153-1179): keep only chunks before
a cutoff by metadata-only partition drops — surviving payload bytes are
untouched (the reference's byte-copy truncation property).

spark-submit --py-files mtslake.zip mtslake/jobs/chop.py \
    --store /data/lake --keep-chunks-before 19740
"""

from __future__ import annotations

import sys

from mtslake.catalog import ChunkStore
from mtslake.jobs.common import base_parser, build_session
from mtslake.retention import chop


def main(argv=None) -> None:
    p = base_parser("mtslake chop")
    p.add_argument(
        "--keep-chunks-before", type=int, required=True,
        help="first chunk_id to drop (all chunk_ids >= this are removed)",
    )
    args = p.parse_args(argv)
    spark = build_session("mtslake-chop", args)
    store = ChunkStore(spark, args.store)
    dropped = chop(store, keep_chunks_before=args.keep_chunks_before)
    print(f"dropped {dropped} chunk partitions")


if __name__ == "__main__":
    main(sys.argv[1:])
