"""Nightly dedup job: build or probe the incremental MinHash index.

Two subcommands, the operational shape of a training-data pipeline's
ingest-time near-dup pass:

    # one-time (or rebuild): index the existing corpus
    spark-submit ... mtslake/jobs/dedup.py build \
        --store /data/lake --docs /data/corpus --index /data/mh_index

    # nightly: probe the new batch against the index, emit pairs,
    # append the batch to the index
    spark-submit ... mtslake/jobs/dedup.py probe \
        --store /data/lake --docs /data/corpus --index /data/mh_index \
        --new-docs /data/ingest/2024-01-02 --out /data/dup_pairs/2024-01-02
"""

from __future__ import annotations

import sys

from mtslake.dedup import build_minhash_index, incremental_minhash_pairs
from mtslake.jobs.common import base_parser, build_session


def main(argv=None) -> None:
    p = base_parser("mtslake dedup (incremental MinHash index)")
    p.add_argument("cmd", choices=["build", "probe"])
    p.add_argument("--docs", required=True,
                   help="corpus documents parquet (doc_id, text, ...)")
    p.add_argument("--index", required=True, help="MinHash index path")
    p.add_argument("--new-docs", default=None,
                   help="probe: new-batch parquet")
    p.add_argument("--out", default=None, help="probe: pairs output path")
    p.add_argument("--n-hashes", type=int, default=64)
    p.add_argument("--bands", type=int, default=16)
    p.add_argument("--jaccard-threshold", type=float, default=0.5)
    p.add_argument("--max-bucket", type=int, default=1000)
    p.add_argument("--no-index-update", action="store_true",
                   help="probe: do not append the batch to the index")
    args = p.parse_args(argv)
    spark = build_session("mtslake-dedup", args)
    docs = spark.read.parquet(args.docs)
    if args.cmd == "build":
        build_minhash_index(
            docs, args.index, n_hashes=args.n_hashes, bands=args.bands,
        )
        print({"index": args.index, "built_from": args.docs})
        return
    if not args.new_docs or not args.out:
        p.error("probe requires --new-docs and --out")
    new_docs = spark.read.parquet(args.new_docs)
    pairs = incremental_minhash_pairs(
        new_docs, args.index, docs,
        jaccard_threshold=args.jaccard_threshold,
        max_bucket=args.max_bucket,
        update_index=not args.no_index_update,
    )
    pairs.write.mode("overwrite").parquet(args.out)
    print({
        "pairs_out": args.out,
        "n_pairs": spark.read.parquet(args.out).count(),
        "index_updated": not args.no_index_update,
    })


if __name__ == "__main__":
    main(sys.argv[1:])
