"""Compress job: pages → series → chunked codec → chunks + catalog.

Checkpoint-resumable (per-partition lineage + metrics): rerun after a
kill resumes at the first unfinished chunk unit (≙ the reference's
deterministic chop/rerun property, tests.py:451-492).

spark-submit --py-files mtslake.zip mtslake/jobs/compress.py \
    --store /data/lake --job-id nightly-2024-01-02
"""

from __future__ import annotations

import sys

from mtslake.catalog import ChunkStore
from mtslake.jobs.common import base_parser, build_session, config_from
from mtslake.lineage import ResumableCompressJob
from mtslake.series import pages_to_series


def main(argv=None) -> None:
    p = base_parser("mtslake compress")
    p.add_argument("--job-id", required=True)
    p.add_argument("--units-per-batch", type=int, default=16)
    args = p.parse_args(argv)
    spark = build_session("mtslake-compress", args)
    cfg = config_from(args)
    store = ChunkStore(spark, args.store)
    pages = spark.read.parquet(f"{args.store}/pages")
    series = pages_to_series(pages)
    job = ResumableCompressJob(
        store, args.job_id, cfg, units_per_batch=args.units_per_batch
    )
    print(job.run(series))


if __name__ == "__main__":
    main(sys.argv[1:])
