"""Snapshot isolation / time travel / rollback on the chunk store.

Iceberg-semantics over the plain-Parquet layout (catalog.py snapshot
section): append-only file sets pinned by JSON manifests. Reference
analogue: the .ch offset table frozen per version (mtscomp.py:341-358)
— a reader holding an old .ch keeps decoding the old byte layout.
"""

import pytest
from pyspark.sql import functions as F

from mtslake import chunk
from mtslake.catalog import ChunkStore
from mtslake.config import DEFAULT
from mtslake.datagen import generate_pages
from mtslake.series import pages_to_series, TS_COL


@pytest.fixture(scope="module")
def two_batches(spark):
    pages = generate_pages(spark, n_urls=20, snapshots_per_url=30)
    series = pages_to_series(pages)
    b1 = series.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 0)
    b2 = series.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 1)
    return b1, b2


def _mk_store(spark, tmp_path, b1, b2):
    st = ChunkStore(spark, str(tmp_path / "store"))
    st.write_chunks(chunk.compress_series(b1, DEFAULT), mode="overwrite")
    s1 = st.commit_snapshot("batch1")
    st.write_chunks(chunk.compress_series(b2, DEFAULT), mode="append")
    s2 = st.commit_snapshot("batch2")
    return st, s1, s2


def _decoded_keys(df):
    return {tuple(r) for r in df.select("url", TS_COL).collect()}


def test_time_travel_reads_old_state_after_append(
        spark, tmp_path, two_batches):
    b1, b2 = two_batches
    st, s1, s2 = _mk_store(spark, tmp_path, b1, b2)

    snap1 = chunk.decompress_chunks(st.chunks_at(s1))
    assert _decoded_keys(snap1) == _decoded_keys(b1)

    head = chunk.decompress_chunks(st.chunks_at(s2))
    both = _decoded_keys(b1) | _decoded_keys(b2)
    assert _decoded_keys(head) == both
    # current read == latest snapshot
    assert _decoded_keys(chunk.decompress_chunks(st.chunks())) == both

    # catalog travels too, and point counts agree per snapshot
    n1 = st.catalog_at(s1).agg(F.sum("n_points")).first()[0]
    assert n1 == b1.count()
    status = {s["snapshot_id"]: s for s in st.snapshot_status()}
    assert status[s1]["live"] and status[s2]["live"]


def test_rollback_restores_batch1_and_expires_later_snapshots(
        spark, tmp_path, two_batches):
    b1, b2 = two_batches
    st, s1, s2 = _mk_store(spark, tmp_path, b1, b2)

    st.rollback_to(s1)
    head = chunk.decompress_chunks(st.chunks())
    assert _decoded_keys(head) == _decoded_keys(b1)

    status = {s["snapshot_id"]: s for s in st.snapshot_status()}
    assert status[s1]["live"]
    assert not status[s2]["live"]
    with pytest.raises(ValueError, match="expired"):
        st.chunks_at(s2)


def test_unknown_snapshot_raises(spark, tmp_path, two_batches):
    b1, b2 = two_batches
    st, s1, _ = _mk_store(spark, tmp_path, b1, b2)
    with pytest.raises(ValueError, match="unknown snapshot"):
        st.chunks_at(99)
    assert st.snapshot_ids() == [1, 2]
