"""Stage-isolation benchmark (guide §1.4) — NOT the graded bench.

Times each pipeline stage with the noop sink so computation is
attributed to stages, not sinks. Same session config as bench.py.
Prints one JSON line per run; takes the same env knobs as bench.py.

Usage:  python bench_extra.py [stage ...]
  stages: datagen series compress_encode compress_write decode
          rollup_agg tiers_write all (default: all)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = 0.1
    n_urls = int(os.environ.get("SPARK_GRAFT_BENCH_URLS",
                                str(int(800000 * sf_num))))
    stages = set(sys.argv[1:]) or {"all"}

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("mtslake-bench-extra")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 64)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from mtslake import chunk, read, rollup
    from mtslake.catalog import ChunkStore
    from mtslake.config import DEFAULT
    from mtslake.datagen import generate_pages
    from mtslake.series import pages_to_series

    tmp = tempfile.mkdtemp(prefix="mtslake_benchx_")
    store = ChunkStore(spark, tmp)
    t: dict[str, float] = {}

    def timed(name, fn, n=2):
        spark.sparkContext.setJobDescription(name)
        for _ in range(n):
            t0 = time.monotonic()
            fn()
            dt = round(time.monotonic() - t0, 3)
            if name not in t or dt < t[name]:
                t[name] = dt
        spark.sparkContext.setJobDescription(None)

    def _warm():
        def _imp(it):
            from mtslake import chunk as _c  # noqa: F401
            for b in it:
                yield b
        spark.range(cpus * 2).repartition(cpus * 2).mapInArrow(
            _imp, "id long").count()

    try:
        _warm()
        pages = generate_pages(
            spark, n_urls=n_urls, snapshots_per_url=192,
            n_hot=max(n_urls // 500, 1), hot_factor=20,
        )
        if "datagen" in stages or "all" in stages:
            # pages w/o sha1: isolates datagen text-gen vs sha1 cost
            timed("datagen_noop", lambda: noop(
                pages.select("url", "warc_ts", F.length("text").alias("l"),
                             "lang")))
            timed("series_noop", lambda: noop(pages_to_series(pages)))

        series = pages_to_series(pages).repartition(64, "url").persist()
        timed("series_cache_count", series.count, n=1)

        chunks_df = chunk.compress_series(series, DEFAULT,
                                          pre_partitioned=True)
        if "compress_encode" in stages or "all" in stages:
            # encode only, no store write
            timed("encode_noop", lambda: noop(chunks_df))
            # IPC-only probe: identity kernel over the same projection
            import pyarrow as pa

            def ident(batches):
                for rb in batches:
                    yield pa.RecordBatch.from_arrays(
                        [pa.array([rb.num_rows])], names=["n"])
            keyed = series.withColumn(
                "chunk_id",
                F.floor(F.col("ts_us") / F.lit(DEFAULT.chunk_duration_us)))
            keyed = keyed.withColumn("text_sha1", F.unhex("text_sha1"))
            proj = keyed.withColumn(
                "_gh", F.xxhash64("url")).sortWithinPartitions(
                "_gh", "chunk_id", "ts_us", "text_sha1").select(
                "url", "lang", "ts_us", "n_chars", "value", "text_sha1")
            timed("ipc_sorted_noop",
                  lambda: noop(proj.mapInArrow(ident, "n long")))

        timed("compress_write",
              lambda: store.write_chunks(chunks_df, mode="overwrite"), n=2)

        decoded_v = read.read_range(store, columns=["value"])
        if "decode" in stages or "all" in stages:
            timed("decode_value_noop", lambda: noop(decoded_v))
            timed("decode_full_noop", lambda: noop(read.read_range(store)))
            timed("decode_full_count",
                  lambda: read.read_range(store).count())

        if "rollup_agg" in stages or "all" in stages:
            timed("rollup_1m_noop", lambda: noop(
                rollup.rollup_from_series(decoded_v, "1m")))

        if "tiers_write" in stages or "all" in stages:
            timed("tiers_write",
                  lambda: rollup.materialize_tiers(store, decoded_v), n=2)

        if "graph" in stages or "all" in stages:
            # iterative-graph cost evidence (pagerank/HITS/LPA, 10
            # rounds) at two SFs, per-edge-normalized — the measured
            # form of the eager-checkpointed O(1)-frontier claim
            import __spark_entry__ as entry
            from mtslake import ckpt
            from mtslake.graph import hits, label_propagation, pagerank
            from mtslake.urlops import extract_links, host_edges

            sf_small = os.path.join(
                os.path.dirname(sf_dir.rstrip("/")), "sf0.01")
            for tag, d in (("sf001", sf_small), ("sf", sf_dir)):
                if not os.path.isdir(d):
                    continue
                edges = host_edges(
                    extract_links(entry._linked_pages(spark, d)))
                t[f"graph_edges_{tag}"] = edges.count()

                def run_pr(edges=edges):
                    out = pagerank(edges, iters=10, damping=0.85)
                    out.count(); ckpt.release(out)

                def run_hits(edges=edges):
                    out = hits(edges, iters=10)
                    out.count(); ckpt.release(out)

                def run_lpa(edges=edges):
                    out = label_propagation(edges, iters=10)
                    out.count(); ckpt.release(out)

                timed(f"pagerank10_{tag}", run_pr)
                timed(f"hits10_{tag}", run_hits)
                timed(f"lpa10_{tag}", run_lpa)

        t["loadavg_end"] = round(os.getloadavg()[0], 2)
        print(json.dumps({"stages": t, "sf": sf_num, "cpus": cpus}))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
