"""spark-submit job smoke tests (≙ the reference CLI pipeline test,
tests.py:533-712: compress → desc → decomp via entry points)."""

import pytest
from pyspark.sql import functions as F

from mtslake.jobs import compress as job_compress
from mtslake.jobs import ingest as job_ingest
from mtslake.jobs import retention as job_retention
from mtslake.jobs import rollup as job_rollup
from mtslake.jobs import verify as job_verify


def test_full_job_pipeline(spark, tmp_path):
    store = str(tmp_path / "lake")
    # --hot 0: hot-url amplification would stretch the span past the
    # 30-day raw retention horizon and make the no-drop assert wrong
    job_ingest.main(["--store", store, "--n-urls", "20", "--snapshots", "48",
                     "--hot", "0"])
    pages = spark.read.parquet(f"{store}/pages")
    assert pages.count() > 0
    assert set(pages.columns) == {"url", "warc_ts", "html", "text", "lang"}

    job_compress.main(["--store", store, "--job-id", "t1"])
    chunks = spark.read.parquet(f"{store}/chunks")
    assert chunks.count() > 0

    job_rollup.main(["--store", store])
    for tier in ("1m", "1h", "1d"):
        assert spark.read.parquet(f"{store}/rollup_{tier}").count() > 0

    # verify must pass on an untampered store
    job_verify.main(["--store", store])

    now = chunks.agg(F.max("ts_max")).first()[0]
    job_retention.main(["--store", store, "--now-us", str(int(now))])
    # default raw horizon (30d) > fixture span -> nothing dropped
    assert spark.read.parquet(f"{store}/chunks").count() == chunks.count()

    # re-running compress is a checkpoint no-op
    job_compress.main(["--store", store, "--job-id", "t1"])
    assert spark.read.parquet(f"{store}/chunks").count() == chunks.count()


def test_verify_job_fails_on_tamper(spark, tmp_path):
    store = str(tmp_path / "lake2")
    job_ingest.main(["--store", store, "--n-urls", "5", "--snapshots", "24"])
    job_compress.main(["--store", store, "--job-id", "t2"])
    # tamper: flip bytes in one chunk payload and rewrite the store
    chunks = spark.read.parquet(f"{store}/chunks")
    bad = chunks.withColumn(
        "p_value",
        F.when(
            F.col("chunk_id") == chunks.select("chunk_id").first()[0],
            F.concat(F.expr("substring(p_value, 1, 18)"), F.lit(b"\x00\x01"),
                     F.expr("substring(p_value, 21, 100000000)")),
        ).otherwise(F.col("p_value")),
    )
    bad.write.mode("overwrite").parquet(f"{store}/chunks_bad")
    import shutil
    shutil.rmtree(f"{store}/chunks")
    shutil.move(f"{store}/chunks_bad", f"{store}/chunks")
    with pytest.raises(Exception):
        job_verify.main(["--store", store])
