"""Chunk encode/decode — the only Python-executed operators.

Spark shape (SURVEY §3.1): the reference's thread-pool chunk loop
(Writer.compress_batch, mtscomp.py:399-423) becomes

    series → repartition(url, chunk_id) → sortWithinPartitions
           → mapInArrow(streaming group encoder) → chunks table

and the read path (Reader.read_chunk, mtscomp.py:602-635) becomes a
shuffle-free ``mapInPandas(decode)`` over pruned chunk rows — each chunk
row is independently addressable and expands to its points without any
repartition.

Why mapInArrow and not groupBy().applyInPandas: the semantics are the
same (hash-partition on the group key guarantees co-location; the sort
makes groups contiguous), but applyInPandas pays one Python invocation
plus one single-row DataFrame per GROUP, while web-scale chunks are
small (10²-10⁴ points) and enormous in number — per-group overhead
dominated the profile by >5×. The streaming encoder amortizes to one
Python call per ARROW BATCH, carrying the (possibly split) last group
over batch boundaries. Arrow (not pandas) because a pandas handoff
materializes one Python object per row per string column — tens of
millions of allocations per task wave that serialize on the kernel
allocator before 32 cores; Arrow buffers cross zero-copy.

* chunk identity is the key ``(url, chunk_id = floor(ts_us / dur))``
  (≙ chunk_bounds, mtscomp.py:324-339) — the reference's "write in
  chunk order" barrier (mtscomp.py:473-474) disappears because identity
  lives in keys, not file offsets.
* rows are sorted ``(xxhash64(url), chunk_id, ts_us, text_sha1)``
  before encoding — the codec is order-sensitive; the sha1 tiebreak
  makes duplicate timestamps deterministic (web-data reality the
  reference never faces). The leading key is numeric on purpose: see
  ``compress_series``.
* per-chunk SHA1 of the raw bytes is carried in the row (≙ the .ch
  running sha1 ledger, mtscomp.py:321-322,481-483).
* skew stays bounded: a hot url never forms one giant group because the
  partition key includes chunk_id (SURVEY §7 risk 6); AQE handles the
  rest.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from . import codec
from .config import EngineConfig, DEFAULT
from .series import TS_COL

SHA1_W = 20  # text_sha1 stored as fixed-width 20-byte binary stream

CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("chunk_id", T.LongType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("ts_min", T.LongType(), False),
        T.StructField("ts_max", T.LongType(), False),
        T.StructField("n_points", T.IntegerType(), False),
        T.StructField("raw_nbytes", T.LongType(), False),
        T.StructField("comp_nbytes", T.LongType(), False),
        T.StructField("raw_signal_nbytes", T.LongType(), False),
        T.StructField("comp_signal_nbytes", T.LongType(), False),
        T.StructField("sha1", T.StringType(), False),
        T.StructField("p_ts", T.BinaryType(), False),
        T.StructField("p_n_chars", T.BinaryType(), False),
        T.StructField("p_value", T.BinaryType(), False),
        T.StructField("p_sha1", T.BinaryType(), False),
    ]
)

SERIES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField(TS_COL, T.LongType(), False),
        T.StructField("n_chars", T.LongType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("text_sha1", T.StringType(), False),
    ]
)

_OUT_COLS = [f.name for f in CHUNK_SCHEMA.fields]


def _segment_runs(starts, ends, max_points: int | None):
    """Split group runs longer than ``max_points`` into segments — the
    ``hot_chunk_points`` guard: a pathological (url, chunk_id) with
    hundreds of millions of points encodes as bounded segment rows
    instead of one task-OOMing group. Segments share the chunk key;
    decode is row-independent, so readers are unaffected (the chunk
    simply has several payload rows, like the reference's fixed-size
    chunk_bounds splitting one recording into many chunks)."""
    if not max_points:
        return starts, ends
    if int(np.max(ends - starts)) <= max_points:
        return starts, ends
    s2: list[int] = []
    e2: list[int] = []
    for s, e in zip(starts, ends):
        while e - s > max_points:
            s2.append(int(s))
            e2.append(int(s) + max_points)
            s = s + max_points
        s2.append(int(s))
        e2.append(int(e))
    return np.asarray(s2), np.asarray(e2)


def _encode_block(
    pdf: pd.DataFrame,
    max_points: int | None = None,
    comp_level: int = 1,
    do_time_diff: bool = True,
) -> pd.DataFrame:
    """Encode every (url, chunk_id) group in a sorted block; one output
    row per group. Vectorized group detection; per-group work is 4 codec
    calls on contiguous numpy slices."""
    n = len(pdf)
    urls = pdf["url"].to_numpy()
    cids = pdf["chunk_id"].to_numpy(np.int64)
    langs = pdf["lang"].to_numpy()
    ts_all = pdf[TS_COL].to_numpy(np.int64)
    nch_all = pdf["n_chars"].to_numpy(np.int64)
    val_all = pdf["value"].to_numpy(np.float64)
    sha_all = np.frombuffer(
        bytes.fromhex("".join(pdf["text_sha1"])), dtype=np.uint8
    ).reshape(n, SHA1_W)

    change = np.flatnonzero((urls[1:] != urls[:-1]) | (cids[1:] != cids[:-1])) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [n]))
    starts, ends = _segment_runs(starts, ends, max_points)
    # ≙ do_time_diff=False (mtscomp.py:55): raw-codec timestamps; decode
    # is unaffected because payload headers carry the codec id
    ts_codec = codec.CODEC_DOD if do_time_diff else codec.CODEC_RAW

    out: dict[str, list] = {c: [] for c in _OUT_COLS}
    for s, e in zip(starts, ends):
        ts = ts_all[s:e]
        nch = nch_all[s:e]
        val = val_all[s:e]
        shab = sha_all[s:e].ravel()
        p_ts = codec.encode_column(ts, ts_codec, comp_level)
        p_n_chars = codec.encode_column(nch, codec.CODEC_DELTA, comp_level)
        p_value = codec.encode_column(val, codec.CODEC_XOR, comp_level)
        p_sha1 = codec.encode_column(shab, codec.CODEC_RAW, comp_level,
                                     entropy=False)  # sha1 = digest bytes, never compressible
        raw_sig = ts.nbytes + nch.nbytes + val.nbytes
        comp_sig = len(p_ts) + len(p_n_chars) + len(p_value)
        out["url"].append(urls[s])
        out["chunk_id"].append(cids[s])
        out["lang"].append(langs[s])
        out["ts_min"].append(ts[0])
        out["ts_max"].append(ts[-1])
        out["n_points"].append(e - s)
        out["raw_nbytes"].append(raw_sig + shab.nbytes)
        out["comp_nbytes"].append(comp_sig + len(p_sha1))
        out["raw_signal_nbytes"].append(raw_sig)
        out["comp_signal_nbytes"].append(comp_sig)
        out["sha1"].append(codec.chunk_sha1(ts, {"n_chars": nch, "value": val}))
        out["p_ts"].append(p_ts)
        out["p_n_chars"].append(p_n_chars)
        out["p_value"].append(p_value)
        out["p_sha1"].append(p_sha1)
    return pd.DataFrame(out)


_PA_CHUNK_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("chunk_id", pa.int64()),
        ("lang", pa.string()),
        ("ts_min", pa.int64()),
        ("ts_max", pa.int64()),
        ("n_points", pa.int32()),
        ("raw_nbytes", pa.int64()),
        ("comp_nbytes", pa.int64()),
        ("raw_signal_nbytes", pa.int64()),
        ("comp_signal_nbytes", pa.int64()),
        ("sha1", pa.string()),
        ("p_ts", pa.binary()),
        ("p_n_chars", pa.binary()),
        ("p_value", pa.binary()),
        ("p_sha1", pa.binary()),
    ]
)


def _binary_flat(arr: pa.Array, n: int) -> np.ndarray:
    """Zero-copy view of a BinaryArray's packed value bytes (each value
    SHA1_W bytes), honoring array offset/slices.

    The view assumes 32-bit offsets (pa.binary()) and no nulls; with
    ``spark.sql.execution.arrow.useLargeVarTypes=true`` the column
    arrives as large_binary (64-bit offsets) and the raw buffer read
    would silently misalign — fail loudly instead."""
    if arr.type != pa.binary():
        raise TypeError(
            f"sha_bin must be pa.binary() (got {arr.type}); disable "
            "spark.sql.execution.arrow.useLargeVarTypes for this job"
        )
    if arr.null_count:
        raise ValueError("sha_bin contains nulls (malformed text_sha1 hex?)")
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)
    start = int(offsets[arr.offset])
    end = int(offsets[arr.offset + n])
    return np.frombuffer(arr.buffers()[2], dtype=np.uint8)[start:end]


def _encode_block_arrow(
    t: pa.Table,
    chunk_dur: int,
    max_points: int | None = None,
    comp_level: int = 1,
    do_time_diff: bool = True,
) -> pa.RecordBatch:
    """Arrow-native twin of _encode_block: url/lang stay in Arrow
    buffers (one .as_py() per GROUP, never per row), sha1 bytes are a
    zero-copy view. Same codec calls → bit-identical payloads.

    chunk ids are DERIVED in-kernel (ts // chunk_dur) instead of being
    shipped as a column: the encode phase is Arrow-IPC-bandwidth-bound
    (BENCH/PROFILE_NOTES.md), so derivable columns never cross the
    boundary."""
    t = t.combine_chunks()
    n = t.num_rows
    url = t.column("url").chunk(0)
    lang = t.column("lang").chunk(0)
    ts_all = t.column("ts_us").chunk(0).to_numpy()
    cids = ts_all // chunk_dur
    nch_all = t.column("n_chars").chunk(0).to_numpy()
    val_all = t.column("value").chunk(0).to_numpy()
    sha_all = _binary_flat(t.column("sha_bin").chunk(0), n).reshape(n, SHA1_W)

    urlneq = pa.compute.not_equal(
        url.slice(1), url.slice(0, n - 1)
    ).to_numpy(zero_copy_only=False)
    change = np.flatnonzero(urlneq | (cids[1:] != cids[:-1])) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [n]))
    starts, ends = _segment_runs(starts, ends, max_points)
    # ≙ do_time_diff=False (mtscomp.py:55): raw-codec timestamps; decode
    # is unaffected because payload headers carry the codec id
    ts_codec = codec.CODEC_DOD if do_time_diff else codec.CODEC_RAW

    out: dict[str, list] = {c: [] for c in _OUT_COLS}
    for s, e in zip(starts, ends):
        ts = ts_all[s:e]
        nch = nch_all[s:e]
        val = val_all[s:e]
        shab = sha_all[s:e].ravel()
        p_ts = codec.encode_column(ts, ts_codec, comp_level)
        p_n_chars = codec.encode_column(nch, codec.CODEC_DELTA, comp_level)
        p_value = codec.encode_column(val, codec.CODEC_XOR, comp_level)
        p_sha1 = codec.encode_column(shab, codec.CODEC_RAW, comp_level,
                                     entropy=False)  # sha1 = digest bytes, never compressible
        raw_sig = ts.nbytes + nch.nbytes + val.nbytes
        comp_sig = len(p_ts) + len(p_n_chars) + len(p_value)
        out["url"].append(url[int(s)].as_py())
        out["chunk_id"].append(int(cids[s]))
        out["lang"].append(lang[int(s)].as_py())
        out["ts_min"].append(int(ts[0]))
        out["ts_max"].append(int(ts[-1]))
        out["n_points"].append(int(e - s))
        out["raw_nbytes"].append(raw_sig + shab.nbytes)
        out["comp_nbytes"].append(comp_sig + len(p_sha1))
        out["raw_signal_nbytes"].append(raw_sig)
        out["comp_signal_nbytes"].append(comp_sig)
        out["sha1"].append(codec.chunk_sha1(ts, {"n_chars": nch, "value": val}))
        out["p_ts"].append(p_ts)
        out["p_n_chars"].append(p_n_chars)
        out["p_value"].append(p_value)
        out["p_sha1"].append(p_sha1)
    return pa.RecordBatch.from_pydict(out, schema=_PA_CHUNK_SCHEMA)


def _encode_stream(
    batches,
    chunk_dur: int,
    max_points: int | None = None,
    comp_level: int = 1,
    do_time_diff: bool = True,
):
    """Streaming group encoder over Arrow RecordBatches (mapInArrow):
    groups are contiguous (sorted partition); the last group of each
    batch may continue into the next, so it is buffered and prepended.

    Arrow-native on purpose: a pandas handoff materializes one Python
    object per row for every string column (url + sha1 = tens of
    millions of allocations per task wave), which serializes on the
    kernel allocator well before 32 cores. Keeping rows in Arrow
    buffers makes the encode stage scale with cores."""
    buf: pa.Table | None = None
    for rb in batches:
        if rb.num_rows == 0:
            continue
        t = pa.Table.from_batches([rb])
        if buf is not None:
            t = pa.concat_tables([buf, t]).combine_chunks()
            buf = None
        n = t.num_rows
        url = t.column("url")
        ts = t.column(TS_COL).to_numpy(zero_copy_only=False)
        cids = ts // chunk_dur
        # sorted input → the last group is a suffix run
        url_eq_last = pa.compute.equal(url, url[n - 1]).to_numpy(
            zero_copy_only=False
        )
        n_tail = int((url_eq_last & (cids == cids[-1])).sum())
        if n_tail == n:
            buf = t
            # the hot_chunk_points memory bound must hold even while a
            # single giant group streams through: flush complete
            # max_points segments now (identical layout to what
            # _segment_runs would produce, since segments start at
            # multiples of max_points from the group start) and keep
            # only the < max_points residual buffered
            if max_points and buf.num_rows > max_points:
                n_full = (buf.num_rows // max_points) * max_points
                yield _encode_block_arrow(
                    buf.slice(0, n_full), chunk_dur, max_points,
                    comp_level, do_time_diff,
                )
                buf = buf.slice(n_full) if n_full < buf.num_rows else None
            continue
        buf = t.slice(n - n_tail)
        yield _encode_block_arrow(
            t.slice(0, n - n_tail), chunk_dur, max_points, comp_level,
            do_time_diff,
        )
    if buf is not None and buf.num_rows:
        yield _encode_block_arrow(
            buf, chunk_dur, max_points, comp_level, do_time_diff
        )


def compress_series(
    series: DataFrame,
    cfg: EngineConfig = DEFAULT,
    pre_partitioned: bool = False,
) -> DataFrame:
    """series → compressed chunk rows (one row per (url, chunk_id)).

    ≙ Writer.write (mtscomp.py:425-507): the ThreadPool becomes Spark
    tasks; ordering becomes keys. Lazy — caller writes via catalog.

    ``pre_partitioned=True`` skips the shuffle when the caller
    guarantees all rows of a url already share a partition (e.g. the
    input was just ``repartition(n, "url")``-ed or read from a
    url-bucketed table): partitioning by url alone co-locates every
    (url, chunk_id) group, and the partition-local sort makes them
    contiguous. This is the bucketed-table co-location pattern — at
    warehouse scale, write the series url-bucketed once and every
    compress run skips its shuffle.
    """
    keyed = series.withColumn(
        "chunk_id", F.floor(F.col(TS_COL) / F.lit(cfg.chunk_duration_us))
    ).withColumn(
        # sha1 crosses the Arrow boundary as 20 raw bytes, not 40 hex
        # chars: half the IPC bytes and no per-row Python strings; the
        # sort tiebreak is order-identical (lowercase hex ≅ byte order)
        "sha_bin", F.unhex("text_sha1")
    ).drop("text_sha1")
    if not pre_partitioned:
        keyed = keyed.repartition("url", "chunk_id")
    from functools import partial

    encode = partial(
        _encode_stream,
        chunk_dur=cfg.chunk_duration_us,
        max_points=cfg.hot_chunk_points,
        comp_level=cfg.comp_level,
        do_time_diff=cfg.do_time_diff,
    )
    # NUMERIC sort key instead of url: web urls share a long common
    # prefix ("https://..."), so Spark's 8-byte string prefix comparator
    # degenerates and every comparison walks the full url bytes — the
    # sort, not the codec, then dominates the encode stage. Sorting on
    # (xxhash64(url), chunk_id, ts) keeps every comparison in numeric
    # prefix registers. Correctness does not depend on the hash being
    # collision-free: the ENCODER splits groups on real url equality,
    # so a 64-bit collision (P ≈ 1e-14 per partition) merely yields an
    # extra chunk row for the same (url, chunk_id) — a layout the store
    # already supports (hot-chunk segmentation). Group ORDER becomes
    # hash order, which nothing downstream observes (chunk rows are an
    # unordered table).
    # chunk_id is a sort key only — it is NOT shipped to the kernel
    # (derived there from ts; the narrow projection after the sort
    # preserves partition order). ~9% fewer Arrow-IPC bytes on the
    # bandwidth-bound boundary (BENCH/PROFILE_NOTES.md).
    return keyed.withColumn("_gh", F.xxhash64("url")).sortWithinPartitions(
        "_gh", "chunk_id", TS_COL, "sha_bin"
    ).select(
        "url", "lang", TS_COL, "n_chars", "value", "sha_bin"
    ).mapInArrow(encode, schema=CHUNK_SCHEMA)


def _hex_rows(sha_concat: bytes, n: int) -> list[str]:
    big = sha_concat.hex()
    return [big[i * 40:(i + 1) * 40] for i in range(n)]


ALL_CHANNELS = ("n_chars", "value", "text_sha1")


def _decode_batch(pdf: pd.DataFrame, verify: bool,
                  channels: tuple[str, ...]) -> pd.DataFrame:
    want_n = "n_chars" in channels
    want_v = "value" in channels
    want_s = "text_sha1" in channels
    urls, langs, tss, nchs, vals, shas, counts = [], [], [], [], [], [], []
    for row in pdf.itertuples(index=False):  # per-CHUNK, not per-point
        ts = codec.decode_column(row.p_ts)
        if verify:
            nch = codec.decode_column(row.p_n_chars)
            val = codec.decode_column(row.p_value)
            got = codec.chunk_sha1(ts, {"n_chars": nch, "value": val})
            if got != row.sha1:
                # ≙ "CRITICAL ERROR" hard failure, mtscomp.py:880-888
                raise RuntimeError(
                    f"chunk integrity failure url={row.url} "
                    f"expected sha1={row.sha1} got={got}"
                )
        else:
            nch = codec.decode_column(row.p_n_chars) if want_n else None
            val = codec.decode_column(row.p_value) if want_v else None
        tss.append(ts)
        counts.append(len(ts))
        urls.append(row.url)
        langs.append(row.lang)
        if want_n:
            nchs.append(nch)
        if want_v:
            vals.append(val)
        if want_s:
            shas.append(codec.decode_column(row.p_sha1))
    if not tss:
        cols = ["url", "lang", TS_COL, *channels]
        return pd.DataFrame({c: pd.Series(dtype=object) for c in cols})
    counts = np.asarray(counts)

    # url/lang are per-chunk constants: dictionary-encode instead of
    # materializing one Python string per POINT (Arrow keeps the
    # dictionary encoding across the boundary). Factorize the PER-CHUNK
    # lists and repeat the integer codes — pd.Categorical over the
    # expanded point-level strings would hash n_points values instead
    # of n_chunks (measured ~15% of decode wall at 70-point chunks).
    def _cat(values: list) -> pd.Categorical:
        codes, cats = pd.factorize(np.asarray(values, dtype=object))
        return pd.Categorical.from_codes(np.repeat(codes, counts), cats)

    out = {
        "url": _cat(urls),
        "lang": _cat(langs),
        TS_COL: np.concatenate(tss),
    }
    if want_n:
        out["n_chars"] = np.concatenate(nchs)
    if want_v:
        out["value"] = np.concatenate(vals)
    if want_s:
        out["text_sha1"] = _hex_rows(
            np.concatenate(shas).tobytes(), int(counts.sum())
        )
    return pd.DataFrame(out)


def decompress_chunks(
    chunks: DataFrame,
    verify: bool = False,
    channels: tuple[str, ...] = ALL_CHANNELS,
) -> DataFrame:
    """chunk rows → series rows, shuffle-free (mapInPandas).

    ≙ Reader.read_chunk → zlib → frombuffer → cumsum (mtscomp.py:602-635)
    + the parallel bulk path Reader.tofile (mtscomp.py:701-743).

    ``channels`` is **projection pushdown into the codec**: only the
    requested channel payloads are read (Parquet column pruning on the
    p_* columns) and decoded. The reference decodes whole chunks and
    selects afterwards (mtscomp.py:835-842); per-channel payload columns
    make the projection free.

    With verify=True each chunk's raw-byte SHA1 is recomputed and any
    mismatch raises (≙ post-write check, mtscomp.py:866-888: tampering
    must be a hard error, tests.py:345-379).
    """
    channels = tuple(c for c in ALL_CHANNELS if c in channels)
    need = {"url", "lang", "sha1", "p_ts"}
    if verify or "n_chars" in channels:
        need.add("p_n_chars")
    if verify or "value" in channels:
        need.add("p_value")
    if "text_sha1" in channels:
        need.add("p_sha1")
    src = chunks.select(*sorted(need))

    fields = [
        T.StructField("url", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField(TS_COL, T.LongType(), False),
    ]
    by_name = {f.name: f for f in SERIES_SCHEMA.fields}
    fields += [by_name[c] for c in channels]
    schema = T.StructType(fields)

    def gen(batches, _verify=verify, _channels=channels):
        for pdf in batches:
            out = _decode_batch(pdf, _verify, _channels)
            if not out.empty:
                yield out

    return src.mapInPandas(gen, schema=schema)
