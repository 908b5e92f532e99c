"""Shared spark-submit plumbing for mtslake jobs.

≙ the reference CLI layer (mtscomp/mtsdecomp/mtsdesc/mtschop console
scripts + _args_to_config, mtscomp.py:1004-1179): argparse → config →
pipeline. Deployment: ``spark-submit --py-files mtslake.zip
mtslake/jobs/<job>.py ...``.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession

from ..config import EngineConfig, write_persisted


def build_session(app: str, args: argparse.Namespace) -> SparkSession:
    b = (
        SparkSession.builder.appName(app)
        .config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.files.maxPartitionBytes", "32m")
    )
    if args.master:
        b = b.master(args.master)
    return b.getOrCreate()


def base_parser(desc: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("--store", required=True, help="engine store root path")
    p.add_argument("--master", default=None, help="override spark master")
    p.add_argument("--shuffle-partitions", type=int, default=64)
    p.add_argument("--chunk-duration-us", type=int, default=None)
    p.add_argument(
        "--set-default", action="append", default=[], metavar="KEY=JSON",
        help="persist an engine default to the site config file "
        "(≙ mtscomp --set-default, mtscomp.py:1080-1081), e.g. "
        "--set-default chunk_duration_us=3600000000",
    )
    p.add_argument("--debug", action="store_true")
    return p


def config_from(args: argparse.Namespace) -> EngineConfig:
    """Layered config: code defaults ← persisted site file
    (~/.mtslake / $MTSLAKE_CONFIG) ← CLI flags; --set-default writes
    the file first so the new default applies to this run too."""
    if getattr(args, "set_default", None):
        kv = {}
        for item in args.set_default:
            k, _, v = item.partition("=")
            kv[k] = json.loads(v)
        write_persisted(**kv)
    return EngineConfig.load(chunk_duration_us=args.chunk_duration_us)
