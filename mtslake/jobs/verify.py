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
    j = orig.select("url", TS_COL, "value", "n_chars", "text_sha1").join(
        decoded.select(
            "url", TS_COL,
            F.col("value").alias("dv"), F.col("n_chars").alias("dn"),
            F.col("text_sha1").alias("dsha"),
        ),
        ["url", TS_COL],
        "full_outer",
    )
    bad = j.filter(
        F.col("value").isNull() | F.col("dv").isNull()
        | (F.col("value") != F.col("dv")) | (F.col("n_chars") != F.col("dn"))
        | (F.col("text_sha1") != F.col("dsha"))
    ).count()
    if bad:
        raise RuntimeError(f"CRITICAL ERROR: {bad} mismatching points")
    print("verify OK")


if __name__ == "__main__":
    main(sys.argv[1:])
