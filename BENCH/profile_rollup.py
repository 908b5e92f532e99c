"""Decode+rollup sub-stage profiler (one-off).

    taskset -c 0-(N-1) python BENCH/profile_rollup.py N
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cpus = int(sys.argv[1])

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", os.environ.get("COAL", "true"))
    .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
    .config("spark.driver.memory", "48g")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
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

tmp = tempfile.mkdtemp(prefix="mtslake_prof_")
store = ChunkStore(spark, tmp)
pages = generate_pages(spark, n_urls=80000, snapshots_per_url=192,
                       n_hot=160, hot_factor=20)
series = pages_to_series(pages).repartition(64, "url").persist()
series.count()
store.write_chunks(chunk.compress_series(series, DEFAULT,
                                         pre_partitioned=True),
                   mode="overwrite")
series.unpersist()


def t(name, fn):
    t0 = time.monotonic()
    fn()
    print(f"{name:26s} {time.monotonic() - t0:7.2f}s", flush=True)


decoded = read.read_range(store, columns=["value"])
t("decode_only_count", lambda: decoded.count())
one_m = rollup.rollup_from_series(decoded, "1m")
t("decode_rollup1m_count", lambda: one_m.count())
one_m_p = one_m.persist()
t("rollup1m_persist_write", lambda: (
    one_m_p.write.mode("overwrite").parquet(store.path("rollup_1m"))))
t("tier_1h_1d", lambda: (
    rollup.rollup_from_tier(one_m_p, "1h").persist().count()))
t("full_materialize", lambda: rollup.materialize_tiers(store, decoded))
shutil.rmtree(tmp, ignore_errors=True)
spark.stop()
