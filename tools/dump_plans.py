"""Dump .explain('formatted') for benched operators into plans/<tag>/.

Usage: python tools/dump_plans.py <tag> [suffix] [name ...]
  tag     e.g. r06  -> writes plans/r06/<name>_<suffix>.txt
  suffix  'before' or 'after' (default 'before')
  names   subset filter (default: all)

Covers the bench-timed surface: the pipeline operators (compress
encode, decode, rollup 1m, gapfill) built over a tiny throwaway store,
plus the entry queries bench.py times.
"""

from __future__ import annotations

import contextlib
import io
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ENTRY_QUERIES = [
    "ts_rollup_1h_codec", "emb_cosine_topk", "ts_time_weighted_1h",
    "ts_uptime_1d", "ts_cusum_1h", "doc_lm_bigram", "doc_corpus_clean",
]


def fmt(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r06"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3:])
    outdir = os.path.join(REPO, "plans", tag)
    os.makedirs(outdir, exist_ok=True)

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("dump-plans")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    plans: dict[str, str] = {}

    # -- pipeline operators over a tiny store --------------------------
    from mtslake import chunk, gapfill, read, rollup
    from mtslake.catalog import ChunkStore
    from mtslake.config import DEFAULT
    from mtslake.datagen import generate_pages
    from mtslake.series import pages_to_series
    from mtslake.dedup import minhash_lsh_pairs

    tmp = tempfile.mkdtemp(prefix="mtslake_plans_")
    try:
        pages = generate_pages(spark, n_urls=50, snapshots_per_url=8)
        series = pages_to_series(pages).repartition(8, "url")
        chunks_df = chunk.compress_series(series, DEFAULT,
                                          pre_partitioned=True)
        plans["compress_encode"] = fmt(chunks_df)
        store = ChunkStore(spark, tmp)
        store.write_chunks(chunks_df, mode="overwrite")
        rollup.materialize_tiers(store, read.read_range(store,
                                                        columns=["value"]))
        plans["decode_value"] = fmt(read.read_range(store,
                                                    columns=["value"]))
        plans["decode_full"] = fmt(read.read_range(store))
        plans["read_range_1d"] = fmt(read.read_range(
            store, 1_704_067_200_000_000,
            1_704_067_200_000_000 + 86_400_000_000))
        plans["rollup_1m"] = fmt(
            rollup.rollup_from_series(read.read_range(store,
                                                      columns=["value"]),
                                      "1m"))
        plans["gapfill_1h"] = fmt(gapfill.gapfill_locf(
            spark.read.parquet(store.path("rollup_1h")), "1h"))

        sf_dir = "/root/testdata/sf0.01"
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        plans["doc_minhash_lsh"] = fmt(
            minhash_lsh_pairs(docs, jaccard_threshold=0.5))

        import __spark_entry__ as entry

        qs = entry.queries()
        for name in ENTRY_QUERIES:
            plans[name] = fmt(qs[name](spark, sf_dir))

        for name, text in plans.items():
            if only and name not in only:
                continue
            path = os.path.join(outdir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(text)
            print("wrote", path)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
