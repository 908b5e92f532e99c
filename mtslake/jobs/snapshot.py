"""Snapshot management job — Iceberg-style table versioning for the
chunk store (catalog.py snapshot section; reference analogue: the .ch
offset table frozen per version, mtscomp.py:341-358).

spark-submit --py-files mtslake.zip mtslake/jobs/snapshot.py \
    --store /data/lake commit --operation nightly-ingest
    ... list
    ... rollback --to 3
"""

from __future__ import annotations

import sys

from mtslake.catalog import ChunkStore
from mtslake.jobs.common import base_parser, build_session


def main(argv=None) -> None:
    p = base_parser("mtslake snapshot")
    p.add_argument("action", choices=["commit", "list", "rollback"])
    p.add_argument("--operation", default="manual",
                   help="label recorded in the manifest (commit)")
    p.add_argument("--to", type=int, default=None,
                   help="snapshot id to roll back to (rollback)")
    args = p.parse_args(argv)
    spark = build_session("mtslake-snapshot", args)
    store = ChunkStore(spark, args.store)
    if args.action == "commit":
        sid = store.commit_snapshot(args.operation)
        print(f"committed snapshot {sid}")
    elif args.action == "list":
        for s in store.snapshot_status():
            live = "live" if s["live"] else "EXPIRED"
            print(f"v{s['snapshot_id']:<4d} {s['operation']:<24s} "
                  f"{s['n_chunk_files']:>6d} chunk files  {live}")
    else:
        if args.to is None:
            p.error("rollback requires --to <snapshot_id>")
        store.rollback_to(args.to)
        print(f"rolled back to snapshot {args.to}")


if __name__ == "__main__":
    main(sys.argv[1:])
