"""Verification job (≙ check(), mtscomp.py:866-888): decode every chunk
with SHA1 verification and join against a reference series; any
mismatch is a hard failure.

spark-submit --py-files mtslake.zip mtslake/jobs/verify.py --store /data/lake
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from mtslake.catalog import ChunkStore
from mtslake.jobs.common import base_parser, build_session
from mtslake.read import read_range
from mtslake.series import pages_to_series, TS_COL


def main(argv=None) -> None:
    p = base_parser("mtslake verify")
    args = p.parse_args(argv)
    spark = build_session("mtslake-verify", args)
    store = ChunkStore(spark, args.store)
    decoded = read_range(store, verify=True)
    orig = pages_to_series(spark.read.parquet(f"{args.store}/pages"))
    cols = ["url", TS_COL, "value", "n_chars", "text_sha1"]

    # multiset comparison: duplicate warc_ts per url are legal (the
    # codec preserves them), so an equi-join on (url, ts) would
    # cross-match; instead count each full row on both sides
    def counted(df, alias):
        return df.select(*cols).groupBy(*cols).agg(F.count("*").alias(alias))

    j = counted(orig, "n_orig").join(
        counted(decoded, "n_dec"), cols, "full_outer"
    )
    bad = j.filter(
        F.col("n_orig").isNull() | F.col("n_dec").isNull()
        | (F.col("n_orig") != F.col("n_dec"))
    ).count()
    if bad:
        # ≙ "CRITICAL ERROR" hard failure, mtscomp.py:880-888
        raise RuntimeError(f"CRITICAL ERROR: {bad} mismatching points")

    # catalog consistency: write_chunks appends chunks THEN catalog, so
    # a crash in between leaves the catalog missing rows (and a retried
    # plain append can duplicate them). This job already scans both
    # tables — detect divergence here and point at the repair tool.
    n_chunks = store.chunks().count()
    n_cat = store.catalog().count()
    if n_chunks != n_cat:
        raise RuntimeError(
            f"CRITICAL ERROR: catalog has {n_cat} rows but chunks table "
            f"has {n_chunks} — run ChunkStore.rebuild_catalog() "
            "(a crash between the chunk and catalog writes, or a "
            "retried append, left them diverged)"
        )
    print("verify OK")


if __name__ == "__main__":
    main(sys.argv[1:])
