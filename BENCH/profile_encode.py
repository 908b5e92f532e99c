"""Encode-stage-only profiler (one-off).

    python BENCH/profile_encode.py CPUS [arrow_batch] [n_urls]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cpus = int(sys.argv[1])
arrow_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
n_urls = int(sys.argv[3]) if len(sys.argv) > 3 else 80000

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 64)))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "48g")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from mtslake import chunk
from mtslake.config import DEFAULT
from mtslake.datagen import generate_pages
from mtslake.series import pages_to_series

pages = generate_pages(spark, n_urls=n_urls, snapshots_per_url=192,
                       n_hot=max(n_urls // 500, 1), hot_factor=20)
series = pages_to_series(pages).repartition(64, "url").persist()
n = series.count()

chunks = chunk.compress_series(series, DEFAULT, pre_partitioned=True)
t0 = time.monotonic(); chunks.count(); cold = time.monotonic() - t0
t0 = time.monotonic(); chunks.count(); warm = time.monotonic() - t0
print(f"cpus={cpus} arrow_batch={arrow_batch} n={n} "
      f"encode cold={cold:.2f}s warm={warm:.2f}s")
spark.stop()
