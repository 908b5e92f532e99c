"""Tiered retention: raw → 1h → 1d (north_rule), as metadata-only
partition drops.

The chunks table is partitioned by ``chunk_id`` (a time bucket), so
expiring raw data = dropping whole partition directories — no payload
is ever read or rewritten. This is the distributed generalization of the
reference's ``chop`` (mtscomp.py:750-796), which truncates a prefix of
compressed chunks by byte-copy without decoding; both rely on chunks
being immutable and independently addressable.

Idempotent by construction: a second run finds nothing left to drop
(≙ chop determinism, tests.py:451-492). With a real Iceberg catalog this
becomes ``expire_snapshots`` / ``DELETE WHERE`` on partition predicates.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import functions as F

from .catalog import ChunkStore
from .config import EngineConfig, DEFAULT

_PART_RE = re.compile(r"^chunk_id=(-?\d+)$")


def list_chunk_partitions(store: ChunkStore) -> list[int]:
    root = store.path("chunks")
    if not os.path.isdir(root):
        return []
    out = []
    for d in os.listdir(root):
        m = _PART_RE.match(d)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def drop_chunk_partitions(store: ChunkStore, chunk_ids: list[int]) -> int:
    """Metadata-only drop of whole chunk_id partitions."""
    dropped = 0
    for cid in chunk_ids:
        p = os.path.join(store.path("chunks"), f"chunk_id={cid}")
        if os.path.isdir(p):
            shutil.rmtree(p)
            dropped += 1
    if dropped:
        # Spark's global FileStatusCache still lists the deleted files;
        # refresh so later scans of the path re-list
        store.spark.catalog.refreshByPath(store.path("chunks"))
        store.rebuild_catalog()
    return dropped


def apply_retention(
    store: ChunkStore, now_us: int, cfg: EngineConfig = DEFAULT
) -> dict[str, int]:
    """Expire raw chunks past the raw horizon and rollup rows past their
    tier horizons. Safe to re-run (idempotent no-op)."""
    stats: dict[str, int] = {}
    cutoff_chunk = (now_us - cfg.retention_us["raw"]) // cfg.chunk_duration_us
    expired = [c for c in list_chunk_partitions(store) if c < cutoff_chunk]
    stats["raw_partitions_dropped"] = drop_chunk_partitions(store, expired)

    for tier in cfg.tiers:
        name = f"rollup_{tier}"
        if not store.has(name):
            stats[f"{tier}_rows_expired"] = 0
            continue
        cutoff_ts = now_us - cfg.retention_us[tier]
        df = store.spark.read.parquet(store.path(name))
        keep = df.filter(F.col("bucket_us") >= F.lit(int(cutoff_ts)))
        n_before = df.count()
        n_after = keep.count()
        if n_after < n_before:
            tmp = store.path(name + "_tmp")
            keep.write.mode("overwrite").parquet(tmp)
            shutil.rmtree(store.path(name))
            os.rename(tmp, store.path(name))
        stats[f"{tier}_rows_expired"] = n_before - n_after
    return stats


def chop(store: ChunkStore, keep_chunks_before: int) -> int:
    """Suffix truncation without decode (≙ Reader.chop keeping the
    first n chunks, mtscomp.py:750-796): drop every chunk_id partition
    >= the cutoff. Payload bytes of surviving chunks are untouched —
    the analogue of chop's SHA1-identity property (tests.py:451-492)."""
    doomed = [c for c in list_chunk_partitions(store) if c >= keep_chunks_before]
    return drop_chunk_partitions(store, doomed)
