"""Product quantization: embedding compression + ADC search.

The chunk codec compresses the time-series side of the lake; PQ is the
embedding side's compression story (Jégou, Douze, Schmid: "Product
Quantization for Nearest Neighbor Search", TPAMI 2011 — public paper,
same family as FAISS's IVF-PQ): split the d-dim space into ``m``
subspaces, k-means each subspace to 2^nbits centroids, and store每
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
    return [np.asarray(b, dtype=np.float64) for b in codebooks]


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
    tables = {}
    for r in prows:
        p = np.asarray(r["_p"], dtype=np.float64)
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
