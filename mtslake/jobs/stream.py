"""Streaming job: readStream over a series directory → watermarked
surfaces → parquet sinks with checkpoints (north_rule: checkpoint-
resumable; a restart resumes from the sink checkpoints without
duplicating sealed output).

spark-submit --py-files mtslake.zip mtslake/jobs/stream.py \\
    --src /data/series_stream --out /data/stream --store /data/lake \\
    --surfaces rollup,seal,uptime --tier 1m --available-now

Surfaces (each with its own checkpoint under ``--out/ck_*``):
  * ``rollup/``  — tumbling tier aggregates (streaming_rollup)
  * ``chunks/``  — watermark-sealed compressed chunks, bit-identical
    to the batch codec (streaming_compress)
  * ``uptime/``  — sealed per-bucket liveness (streaming_uptime)
  * ``ohlc/``    — sealed candlesticks (streaming_ohlc)

``--available-now`` drains the current source content and stops (the
batch-catchup form); omit it for a continuous run.
"""

from __future__ import annotations

import sys

from mtslake.config import DEFAULT
from mtslake.jobs.common import base_parser, build_session


def main(argv=None) -> None:
    p = base_parser("mtslake streaming surfaces")
    p.add_argument("--src", required=True,
                   help="series parquet directory to stream from")
    p.add_argument("--out", required=True, help="output root")
    p.add_argument("--surfaces", default="rollup,seal,uptime,ohlc")
    p.add_argument("--tier", default="1m")
    p.add_argument("--watermark", default="0 seconds")
    p.add_argument("--lease-minutes", type=int, default=30)
    p.add_argument("--available-now", action="store_true")
    args = p.parse_args(argv)
    spark = build_session("mtslake-stream", args)
    from mtslake import streaming

    surfaces = {s.strip() for s in args.surfaces.split(",") if s.strip()}
    schema = spark.read.parquet(args.src).schema
    queries = []

    def _sink(df, name):
        w = (df.writeStream.format("parquet")
             .option("path", f"{args.out}/{name}")
             .option("checkpointLocation", f"{args.out}/ck_{name}")
             .outputMode("append"))
        if args.available_now:
            w = w.trigger(availableNow=True)
        return w.start()

    def _stream():
        return spark.readStream.schema(schema).parquet(args.src)

    if "rollup" in surfaces:
        queries.append(_sink(
            streaming.streaming_rollup(_stream(), args.tier,
                                       args.watermark), "rollup"))
    if "seal" in surfaces:
        queries.append(_sink(
            streaming.streaming_compress(_stream(), DEFAULT,
                                         args.watermark), "chunks"))
    if "uptime" in surfaces:
        queries.append(_sink(
            streaming.streaming_uptime(
                _stream().select("url", "ts_us"),
                args.lease_minutes * 60 * 1_000_000,
                tier="1h", watermark=args.watermark), "uptime"))
    if "ohlc" in surfaces:
        queries.append(_sink(
            streaming.streaming_ohlc(_stream(), tier="1h",
                                     watermark=args.watermark), "ohlc"))
    for q in queries:
        q.awaitTermination()
    for name in sorted(surfaces):
        tbl = {"seal": "chunks"}.get(name, name)
        try:
            n = spark.read.parquet(f"{args.out}/{tbl}").count()
        except Exception:
            n = 0
        print(f"{tbl:<22} {n}")


if __name__ == "__main__":
    main(sys.argv[1:])
