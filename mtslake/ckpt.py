"""localCheckpoint lifecycle — plugging PySpark's checkpoint leak.

``df.localCheckpoint(eager=True)`` is the repo's lineage-severing tool
(iterative frontiers, read-before-destructive-write barriers, probe-
before-index-append ordering). But PySpark NEVER frees local-checkpoint
storage: verified on Spark 4.1, a fully-unreferenced checkpointed frame
survives ``System.gc()`` + Python ``gc.collect()`` indefinitely — the
blocks live until session stop. In a long-lived service (the nightly
dedup loop, a compaction daemon) that is an executor-memory/disk leak
proportional to calls made.

Convention (enforced by tests/test_trainops.py lifecycle test):

* operators create checkpoints ONLY via :func:`eager_checkpoint`, which
  records the checkpoint's RDD ids on the DataFrame;
* an operator calls :func:`release` on every INTERMEDIATE checkpoint
  before returning (safe exactly when downstream results were already
  eagerly materialized, so no recompute path can touch the frame);
* a RETURNED checkpointed frame is caller-owned: call ``release(df)``
  when done with it (and everything derived lazily from it), or accept
  session-lifetime storage.

``release`` is deliberately explicit — a weakref-on-DataFrame scheme
would free storage still referenced by JVM-side derived plans.

Single-writer assumption: id attribution reads the session's persisted-
RDD map before/after the checkpoint, so concurrent checkpoint creation
from another thread could mis-attribute ids. All repo call sites
checkpoint from the driver thread that owns the operator call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_IDS_ATTR = "_mtslake_ckpt_ids"


def _persisted_ids(spark) -> set[int]:
    m = spark.sparkContext._jsc.getPersistentRDDs()
    it = m.entrySet().iterator()
    out: set[int] = set()
    while it.hasNext():
        out.add(int(it.next().getKey()))
    return out


def eager_checkpoint(df: DataFrame) -> DataFrame:
    """``localCheckpoint(eager=True)`` with its storage made releasable
    (the new persisted-RDD ids are recorded on the returned frame)."""
    spark = df.sparkSession
    before = _persisted_ids(spark)
    ck = df.localCheckpoint(eager=True)
    ck.__dict__[_IDS_ATTR] = _persisted_ids(spark) - before
    return ck


def transfer(src: DataFrame, dst: DataFrame) -> DataFrame:
    """Move checkpoint ownership onto a frame DERIVED from ``src`` (a
    final projection, say) so the caller can ``release`` what it was
    actually handed. Returns ``dst``.

    UNIONS with any ids ``dst`` already owns (a dst that was itself
    eager-checkpointed): plain assignment would discard dst's recorded
    ids, leaving its blocks unreleasable for the session lifetime."""
    dst.__dict__[_IDS_ATTR] = src.__dict__.pop(_IDS_ATTR, set()) | (
        dst.__dict__.get(_IDS_ATTR) or set()
    )
    return dst


def release(df: DataFrame | None) -> None:
    """Free an :func:`eager_checkpoint` frame's block storage.

    Call ONLY when nothing (including lazily-derived frames) will read
    the frame again — a released checkpoint has no recompute path, so a
    later action on it raises instead of silently recomputing."""
    if df is None:
        return
    ids = df.__dict__.get(_IDS_ATTR)
    if not ids:
        return
    m = df.sparkSession.sparkContext._jsc.getPersistentRDDs()
    for rid in sorted(ids):
        if m.containsKey(rid):
            m.get(rid).unpersist(False)
    df.__dict__[_IDS_ATTR] = set()
