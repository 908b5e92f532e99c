"""Decompress job (≙ mtsdecomp, mtscomp.py:1085-1128): full decode of a
time/url range to a plain Parquet series table.

Honors ``check_after_decompress`` (≙ DEFAULT_CONFIG, mtscomp.py:50):
when on, every decoded chunk's SHA1 is recomputed during the decode and
a mismatch hard-fails the job — the integrity check the reference runs
when saving decompressed output to disk.

spark-submit --py-files mtslake.zip mtslake/jobs/decompress.py \
    --store /data/lake --out /data/decoded --t0-us ... --t1-us ...
"""

from __future__ import annotations

import sys

from mtslake.catalog import ChunkStore
from mtslake.jobs.common import base_parser, build_session, config_from
from mtslake.read import read_range


def main(argv=None) -> None:
    p = base_parser("mtslake decompress")
    p.add_argument("--out", required=True, help="output parquet path")
    p.add_argument("--t0-us", type=int, default=None)
    p.add_argument("--t1-us", type=int, default=None)
    p.add_argument("--url", default=None)
    p.add_argument("--url-prefix", default=None)
    p.add_argument(
        "--no-check", action="store_true",
        help="skip the decode-time SHA1 check even if "
        "check_after_decompress is on",
    )
    args = p.parse_args(argv)
    spark = build_session("mtslake-decompress", args)
    store = ChunkStore(spark, args.store)
    # store-pinned layout fields (chunk_duration_us) override site/CLI
    # config: pruning must match the layout the data was written under
    cfg = store.cfg_for_store(config_from(args))
    verify = cfg.check_after_decompress and not args.no_check
    decoded = read_range(
        store, t0_us=args.t0_us, t1_us=args.t1_us, url=args.url,
        url_prefix=args.url_prefix, cfg=cfg, verify=verify,
    )
    decoded.write.mode("overwrite").parquet(args.out)
    print(f"decompressed to {args.out} (check={'on' if verify else 'off'})")


if __name__ == "__main__":
    main(sys.argv[1:])
