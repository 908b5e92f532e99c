"""Product quantization: embedding compression + ADC search.

The chunk codec compresses the time-series side of the lake; PQ is the
embedding side's compression story (Jégou, Douze, Schmid: "Product
Quantization for Nearest Neighbor Search", TPAMI 2011 — public paper,
same family as FAISS's IVF-PQ): split the d-dim space into ``m``
subspaces, k-means each subspace to 2^nbits centroids, and store every
vector as ``m`` one-byte codes — a 64-dim float32 vector (256 B)
becomes 8 B, a 32× shrink that turns a 100-TB embedding corpus into a
~3-TB scan.

Spark shape:

* **train** — Lloyd per subspace on a SEEDED, BOUNDED sample collected
  to the driver (vectorized numpy; FAISS trains codebooks on a sample
  for the same reason: the codebook is 2^nbits × d floats of metadata,
  not data-scale state). Deterministic given the input.
* **encode** — one pass over the table: an Arrow-batched pandas UDF
  does an (batch × sub_dim) @ (sub_dim × 2^nbits) GEMM per subspace
  (the same broadcast-centroid kernel shape as the IVF quantizer) and
  emits ``binary`` codes. No shuffle.
* **search (ADC)** — per probe, the m × 2^nbits distance table is
  precomputed driver-side (metadata-scale) and broadcast; the code
  table is scanned once with a vectorized lookup-sum kernel — the
  asymmetric distance computation. Exact re-rank of the top
  candidates against the float vectors is the standard refinement and
  composes with ``brute_force_topk``.

Everything is deterministic; ties in encode argmin break toward the
LOWER code index (np.argmin first-match), and search ties toward the
lower vec_id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F


def _as_matrix(vals) -> np.ndarray:
    return np.vstack([np.asarray(v, dtype=np.float64) for v in vals])


def pq_train(
    embeddings: DataFrame,
    m: int = 8,
    nbits: int = 8,
    n_iter: int = 10,
    sample: int = 20_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """Train per-subspace codebooks; returns ``m`` lists of
    2^nbits × (dim/m) centroids (JSON-serializable).

    Sample selection is the deterministic seeded order used everywhere
    in this engine: the ``sample`` vectors with the smallest
    xxhash64(id). k-means init is the same trick per subspace (first
    2^nbits sample rows in hash order); empty clusters keep their
    previous centroid."""
    if not 1 <= nbits <= 8:
        # codes are one byte per subspace everywhere downstream
        # (pq_encode / _enc_residual write uint8); nbits > 8 would
        # silently wrap indices past 255 into corrupt codes
        raise ValueError(f"nbits must be in [1, 8], got {nbits}")
    ksz = 1 << nbits
    rows = (
        embeddings.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
        .withColumn("_h", F.xxhash64("_id"))
        .orderBy("_h", "_id")
        .limit(int(sample))
        .collect()
    )
    X = _as_matrix([r["_v"] for r in rows])
    n, dim = X.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    books = []
    for j in range(m):
        Xj = X[:, j * sub:(j + 1) * sub]
        k = min(ksz, n)
        C = Xj[:k].copy()
        for _ in range(max(1, n_iter)):
            # ||x - c||^2 = ||x||^2 - 2 x·c + ||c||^2 ; argmin over c
            d2 = (
                -2.0 * (Xj @ C.T)
                + (C * C).sum(axis=1)[None, :]
            )
            assign = d2.argmin(axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    C[c] = Xj[mask].mean(axis=0)
        books.append(C.tolist())
    return books


def _code_matrices(codebooks) -> list[np.ndarray]:
    mats = [np.asarray(b, dtype=np.float64) for b in codebooks]
    for j, C in enumerate(mats):
        if C.shape[0] > 256:
            # one uint8 code per subspace is the storage contract;
            # argmin indices past 255 would wrap into corrupt codes
            raise ValueError(
                f"codebook {j} has {C.shape[0]} centroids (> 256); "
                "codes are one byte per subspace (nbits <= 8)"
            )
    return mats


# ADC tables are built driver-side and closed over into the scan
# kernel — metadata for probe BATCHES (a dashboard's queries), not for
# probe TABLES. Cap the budget loudly instead of letting a
# million-probe call OOM the driver silently.
_MAX_TABLE_ENTRIES = 50_000_000  # doubles ≈ 400 MB


def _guard_table_budget(n_tables: int, m: int, ksz: int) -> None:
    entries = n_tables * m * ksz
    if entries > _MAX_TABLE_ENTRIES:
        raise ValueError(
            f"ADC table budget exceeded: {n_tables} probe tables × {m} "
            f"subspaces × {ksz} codes = {entries} entries (> "
            f"{_MAX_TABLE_ENTRIES}). Batch the probes (ADC search is "
            "per-probe-batch by design), or reduce n_probe."
        )


def pq_encode(
    embeddings: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, codes binary) — one byte per subspace, no shuffle."""
    mats = _code_matrices(codebooks)
    m = len(mats)
    sub = mats[0].shape[1]

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _enc(vs: pd.Series) -> pd.Series:
        X = _as_matrix(vs.to_numpy())
        if X.shape[1] != m * sub:
            # a codebook/vector dimension mismatch (e.g. a model
            # upgrade widened the embedding column) must fail loudly —
            # slicing would silently encode only the first m*sub dims
            raise ValueError(
                f"pq_encode: vector dim {X.shape[1]} != codebook dim "
                f"{m * sub} (m={m} x sub={sub}); retrain pq_train on "
                "the new embedding width"
            )
        out = np.empty((X.shape[0], m), dtype=np.uint8)
        for j, C in enumerate(mats):
            Xj = X[:, j * sub:(j + 1) * sub]
            d2 = -2.0 * (Xj @ C.T) + (C * C).sum(axis=1)[None, :]
            out[:, j] = d2.argmin(axis=1).astype(np.uint8)
        return pd.Series([r.tobytes() for r in out])

    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        _enc(F.col(vec_col).cast("array<double>")).alias("codes"),
    )


def pq_reconstruct(codes: bytes, codebooks) -> np.ndarray:
    """Decode one code row back to its quantized vector (verification /
    oracle side — the search path never reconstructs)."""
    mats = _code_matrices(codebooks)
    cs = np.frombuffer(codes, dtype=np.uint8)
    return np.concatenate([mats[j][cs[j]] for j in range(len(mats))])


def pq_search(
    encoded: DataFrame,
    codebooks,
    probes: DataFrame,
    k: int = 10,
) -> DataFrame:
    """ADC top-k: squared-L2 between each probe and every CODE row via
    per-subspace table lookup, never touching float vectors.

    The m × 2^nbits probe tables are computed driver-side (metadata
    scale: 8 × 256 doubles per probe) and closed over into one
    Arrow-batched kernel; the encoded table is scanned once, no
    shuffle before the final per-probe top-k window. Returns
    (probe_id, vec_id, adc_d2, rank)."""
    mats = _code_matrices(codebooks)
    m = len(mats)
    sub = mats[0].shape[1]
    prows = probes.select(
        "probe_id", F.col("probe_vec").cast("array<double>").alias("_p")
    ).collect()
    if not prows:
        # zero probes: return an empty result frame WITHOUT scanning
        # the corpus (np.stack over zero per-probe tables would raise
        # inside the kernel otherwise)
        return encoded.sparkSession.createDataFrame(
            [], "probe_id long, vec_id long, adc_d2 double, rank int"
        )
    _guard_table_budget(len(prows), m, mats[0].shape[0])
    tables = {}
    for r in prows:
        p = np.asarray(r["_p"], dtype=np.float64)
        if p.shape[0] != m * sub:
            raise ValueError(
                f"pq_search: probe dim {p.shape[0]} != codebook dim "
                f"{m * sub} (m={m} x sub={sub}); the ADC tables would "
                "silently score only the first m*sub dims"
            )
        t = np.empty((m, mats[0].shape[0]))
        for j, C in enumerate(mats):
            pj = p[j * sub:(j + 1) * sub]
            diff = C - pj[None, :]
            t[j] = (diff * diff).sum(axis=1)
        tables[int(r["probe_id"])] = t
    pids = sorted(tables)

    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    schema = T.ArrayType(
        T.StructType(
            [
                T.StructField("probe_id", T.LongType()),
                T.StructField("adc_d2", T.DoubleType()),
            ]
        )
    )

    @pandas_udf(schema)
    def _adc(codes: pd.Series) -> pd.Series:
        C = np.frombuffer(
            b"".join(codes.to_numpy()), dtype=np.uint8
        ).reshape(len(codes), m)
        cols = np.arange(m)
        out = []
        # one vectorized gather per probe: D[i] = Σ_j table[j, code_ij]
        dmat = np.stack(
            [tables[pid][cols, C].sum(axis=1) for pid in pids], axis=1
        )
        for row in dmat:
            out.append(
                [
                    {"probe_id": pid, "adc_d2": float(d)}
                    for pid, d in zip(pids, row)
                ]
            )
        return pd.Series(out)

    scored = (
        encoded.select("vec_id", _adc(F.col("codes")).alias("_s"))
        .select("vec_id", F.explode("_s").alias("_e"))
        .select(
            "vec_id",
            F.col("_e.probe_id").alias("probe_id"),
            F.col("_e.adc_d2").alias("adc_d2"),
        )
        .filter(F.col("vec_id") != F.col("probe_id"))
    )
    w = W.partitionBy("probe_id").orderBy(F.asc("adc_d2"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("probe_id", "vec_id",
                F.round("adc_d2", 9).alias("adc_d2"), "rank")
    )


# ---------------------------------------------------------------------------
# IVF-PQ: the composed 100-TB layout (coarse cells -> residual codes)
# ---------------------------------------------------------------------------

def build_ivfpq_index(
    embeddings: DataFrame,
    path: str,
    n_cells: int = 16,
    m: int = 8,
    nbits: int = 8,
    n_iter: int = 8,
    train_iters: int = 0,
    sample: int = 20_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """The composed FAISS-style layout: IVF coarse cells + PQ codes of
    the RESIDUAL (vector − its cell centroid; residual energy is much
    lower than raw, so the same byte budget quantizes far finer).

    On disk: (vec_id, codes) partitioned by ``cell`` + a JSON sidecar
    holding centroids and codebooks — a query reads O(probed cells) of
    an already-32×-compressed table: the two scale levers multiply.
    Codebooks train on the residuals of the seeded sample; cell
    assignment uses the same vectorized kernel as the IVF store."""
    import json
    import os

    from .simsearch import _assign_cells, _seeded_centroids, train_centroids

    e = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    if train_iters > 0:
        cents = train_centroids(e, n_cells, train_iters)
    else:
        cents = _seeded_centroids(e, n_cells)
    C = np.asarray(cents, dtype=np.float64)
    assigned = _assign_cells(e, cents)

    # codebooks on residuals of the seeded sample
    srows = (
        assigned.withColumn("_h", F.xxhash64("vec_id"))
        .orderBy("_h", "vec_id").limit(int(sample))
        .select("cell", "_v").collect()
    )
    R = np.vstack([
        np.asarray(r["_v"], dtype=np.float64) - C[int(r["cell"]) - 1]
        for r in srows
    ])
    rid = list(range(R.shape[0]))
    rdf = embeddings.sparkSession.createDataFrame(
        [(i, [float(x) for x in R[i]]) for i in rid],
        "vec_id long, embedding array<double>",
    )
    books = pq_train(rdf, m=m, nbits=nbits, n_iter=n_iter,
                     sample=R.shape[0])

    mats = _code_matrices(books)
    sub = mats[0].shape[1]

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _enc_residual(vs: pd.Series, cells: pd.Series) -> pd.Series:
        X = _as_matrix(vs.to_numpy())
        X = X - C[cells.to_numpy(np.int64) - 1]
        out = np.empty((X.shape[0], m), dtype=np.uint8)
        for j, Cb in enumerate(mats):
            Xj = X[:, j * sub:(j + 1) * sub]
            d2 = -2.0 * (Xj @ Cb.T) + (Cb * Cb).sum(axis=1)[None, :]
            out[:, j] = d2.argmin(axis=1).astype(np.uint8)
        return pd.Series([r.tobytes() for r in out])

    (
        assigned.select(
            "vec_id", "cell",
            _enc_residual(F.col("_v"), F.col("cell")).alias("codes"),
        )
        .repartition("cell")
        .write.mode("overwrite").partitionBy("cell").parquet(path)
    )
    with open(os.path.join(path, "_ivfpq.json"), "w") as f:
        json.dump({"centroids": cents, "codebooks": books}, f)


def ivfpq_search(
    spark,
    path: str,
    probes: DataFrame,
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Search the IVF-PQ store: probed cells prune the partitioned
    scan; within them, ADC over residual codes with per-(probe, cell)
    lookup tables (the residual table depends on the cell centroid, so
    each probe carries one m × 2^nbits table per probed cell —
    metadata-scale, broadcast via closure). Returns
    (probe_id, vec_id, adc_d2, rank); compose with an exact re-rank of
    the shortlist for refined results."""
    import json
    import os

    from .simsearch import _probe_cells

    with open(os.path.join(path, "_ivfpq.json")) as f:
        meta = json.load(f)
    cents = meta["centroids"]
    mats = _code_matrices(meta["codebooks"])
    C = np.asarray(cents, dtype=np.float64)
    m = len(mats)
    sub = mats[0].shape[1]

    p = probes.select(
        "probe_id", F.col("probe_vec").cast("array<double>").alias("_p")
    )
    # ONE driver round-trip: _probe_cells keeps _p on its output rows,
    # so probe vectors and (probe, cell) assignments collect together
    # (two separate collects ran the probe scan twice as two jobs)
    prows = _probe_cells(p, cents, n_probe).select(
        "probe_id", "_p", "cell"
    ).collect()
    pvecs = {
        int(r["probe_id"]): np.asarray(r["_p"], dtype=np.float64)
        for r in prows
    }
    cell_probes: dict[int, list[int]] = {}
    for r in prows:
        cell_probes.setdefault(int(r["cell"]), []).append(int(r["probe_id"]))
    _guard_table_budget(
        sum(len(v) for v in cell_probes.values()), m, mats[0].shape[0]
    )
    tables: dict[tuple[int, int], np.ndarray] = {}
    for cell, pids in cell_probes.items():
        for pid in pids:
            res = pvecs[pid] - C[cell - 1]
            t = np.empty((m, mats[0].shape[0]))
            for j, Cb in enumerate(mats):
                diff = Cb - res[j * sub:(j + 1) * sub][None, :]
                t[j] = (diff * diff).sum(axis=1)
            tables[(pid, cell)] = t

    cells = sorted(cell_probes)
    store = spark.read.parquet(path).filter(F.col("cell").isin(cells))

    def gen(batches):
        cols = np.arange(m)
        for pdf in batches:
            outs = []
            for cell, grp in pdf.groupby("cell"):
                Cd = np.frombuffer(
                    b"".join(grp["codes"].to_numpy()), dtype=np.uint8
                ).reshape(len(grp), m)
                for pid in cell_probes.get(int(cell), []):
                    t = tables[(pid, int(cell))]
                    d = t[cols, Cd].sum(axis=1)
                    outs.append(pd.DataFrame({
                        "probe_id": pid,
                        "vec_id": grp["vec_id"].to_numpy(),
                        "adc_d2": d,
                    }))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    scored = store.mapInPandas(
        gen, schema="probe_id long, vec_id long, adc_d2 double"
    ).filter(F.col("vec_id") != F.col("probe_id"))
    w = W.partitionBy("probe_id").orderBy(F.asc("adc_d2"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("probe_id", "vec_id",
                F.round("adc_d2", 9).alias("adc_d2"), "rank")
    )
