"""Similarity search over embedding columns (``array<float>``).

* brute-force cosine top-k — the exact baseline: broadcast the probe
  set, JVM-side dot products (``zip_with`` + ``aggregate``), window
  rank. One pass over the big side, no shuffle of the embedding table.
* LSH-bucketed ANN — the scale path: deterministic random-hyperplane
  signatures (sign bits of dot products with xxhash64-derived ±1
  planes), bucket equi-join, exact cosine re-rank inside buckets.
  Recall < 1 by construction; increase ``n_planes`` shards or use
  multi-probe for higher recall.

Everything JVM-side; dot products run left-to-right (same order as
DuckDB's list_dot_product) so exact-oracle comparison is bit-stable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # noqa: F401  (resolves pandas_udf type hints under
                     # `from __future__ import annotations`)
from pyspark.sql import DataFrame, Window as W, functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a, b) -> F.Column:
    # try_divide: a zero-norm operand (failed/padded embedding) yields
    # NULL, not 0/0 = NaN — Spark orders NaN ABOVE every real double,
    # so a NaN cosine would rank #1 in every desc top-k and pass
    # `cos >= threshold` filters (NaN >= t is true), turning one junk
    # vector into a universal nearest neighbor / false near-duplicate.
    # NULL instead sinks (NULLS LAST under desc) and fails thresholds.
    # The isnan guard catches the same hazard from NaN vector
    # COMPONENTS (NaN dot with a nonzero divisor survives try_divide).
    d = F.try_divide(_dot(a, b), _norm(a) * _norm(b))
    return F.when(F.isnan(d), F.lit(None).cast("double")).otherwise(d)


def brute_force_topk(
    embeddings: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for every probe row.

    probes: (probe_id, probe_vec). The probe side is broadcast — the
    embedding table is scanned once, never shuffled."""
    e = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    p = probes.select(
        F.col("probe_id"), F.col("probe_vec").cast("array<double>").alias("_p")
    )
    scored = e.join(F.broadcast(p), F.col("vec_id") != F.col("probe_id"))
    scored = scored.withColumn("cos", cosine(F.col("_v"), F.col("_p")))
    w = W.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "vec_id", F.round("cos", 6).alias("cos"), "rank")
    )


def hyperplane_signature(
    vec_col, n_planes: int = 16, dim: int = 64, plane_offset: int = 0
) -> F.Column:
    """n_planes sign bits: plane p's component j is ±1 from the parity
    of xxhash64((p+plane_offset)*dim+j) — deterministic, no stored
    model. ``plane_offset`` selects an independent plane family (used
    for multi-table LSH)."""
    # seed closure via factory — a two-parameter transform lambda would
    # bind (element, index), not the intended plane id (see
    # dedup.minhash_signature)
    def plane_sign(p: int):
        return lambda j: F.when(
            F.pmod(F.xxhash64(j + F.lit((p + plane_offset) * dim)), 2) == 0,
            F.lit(1.0),
        ).otherwise(F.lit(-1.0))

    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)), plane_sign(p)
                ),
                lambda x, s: x * s,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig.bitwiseOR(
            F.when(proj >= 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(0)
        )
    return sig


def _lit_vec(v) -> F.Column:
    return F.array(*[F.lit(float(x)) for x in v])


def _seeded_centroids(e: DataFrame, n_cells: int) -> list:
    """Deterministic coarse quantizer: the vectors with the smallest
    xxhash64(id) — a seeded sample, no training loop (reproducible)."""
    return [
        r["_v"]
        for r in e.withColumn("_h", F.xxhash64("vec_id"))
        .orderBy("_h", "vec_id").limit(n_cells).collect()
    ]


def _cell_scores(col, cents) -> F.Column:
    return F.array(*[cosine(col, _lit_vec(c)) for c in cents])


def train_centroids(
    e: DataFrame,
    n_cells: int,
    n_iter: int = 3,
    sample_fraction: float | None = None,
    vectorized: bool | None = None,
) -> list:
    """Spherical-k-means refinement of the seeded-sample quantizer: a
    few distributed Lloyd iterations — assign (the same vectorized
    broadcast-centroid kernel the quantizer uses) then re-center.

    Seeded-sample centroids are just random vectors: on skewed
    embedding distributions several land in one dense region while
    sparse regions get none, so probes are wasted re-ranking
    near-duplicate cells (recall@k at fixed n_probe measurably drops —
    pytest in tests/test_trainops.py shows the trained quantizer
    strictly improving it on a clustered set). Each iteration:

    * assignment: one pass over the (sampled) table — numpy GEMM per
      Arrow batch via ``_assign_cells``;
    * update: per-(cell, component) mean via ``posexplode`` + partial-
      aggregated groupBy — the shuffle carries (cell, pos, sum, cnt)
      partials, never vectors — then an O(n_cells × dim) collect
      (metadata-scale; 1024 cells × 64 dims = 65k rows). Cosine
      assignment is scale-invariant, so means need no renormalization.
      Empty cells keep their previous centroid.

    ``sample_fraction``: train on a seeded sample — at 100 TB the
    quantizer trains on ~10⁶ vectors, not the corpus. Deterministic
    given the input (up to float reduction order in the means; the
    search contract itself never depends on the quantizer — full probe
    is quantizer-independent)."""
    cents = _seeded_centroids(e, n_cells)
    train = (
        e.sample(fraction=sample_fraction, seed=7)
        if sample_fraction is not None
        else e
    )
    train = train.select("_v").persist()
    try:
        for _ in range(max(0, int(n_iter))):
            assigned = _assign_cells(train, cents, vectorized=vectorized)
            stats = (
                assigned.select("cell", F.posexplode("_v").alias("pos", "x"))
                .groupBy("cell", "pos")
                .agg(F.sum("x").alias("s"), F.count("*").alias("c"))
                .collect()
            )
            dim = len(cents[0])
            new = [list(c) for c in cents]  # empty cells keep centroids
            acc: dict[int, np.ndarray] = {}
            cnt: dict[int, int] = {}
            for r in stats:
                cell = int(r["cell"]) - 1
                if cell not in acc:
                    acc[cell] = np.zeros(dim)
                acc[cell][int(r["pos"])] = r["s"]
                cnt[cell] = int(r["c"])
            for cell, s in acc.items():
                new[cell] = (s / cnt[cell]).tolist()
            cents = new
    finally:
        train.unpersist()
    return cents


# Above this many cells the expression-tree quantizer (one cosine
# expression per centroid, O(n_cells*dim) literals per row) outgrows
# whole-stage codegen; real 100-TB IVF wants 10^3-10^5 cells, which only
# the Arrow kernel below can carry.
_EXPR_QUANTIZER_MAX_CELLS = 64


def _norm_cent_matrix(cents):
    C = np.asarray(cents, dtype=np.float64)
    return (C / np.linalg.norm(C, axis=1, keepdims=True)).T.copy()


def _assign_cells(
    df: DataFrame, cents, vec_col: str = "_v", vectorized: bool | None = None
) -> DataFrame:
    """Add ``cell`` = 1-based argmax-cosine centroid id.

    ``vectorized=None`` auto-selects: the expression tree (bit-stable
    with the SQL oracle) for small quantizers, a broadcast-centroid
    numpy matmul inside an Arrow-batched pandas UDF beyond
    ``_EXPR_QUANTIZER_MAX_CELLS`` — one (batch × dim) @ (dim × n_cells)
    GEMM per Arrow batch instead of O(n_cells) scalar expressions per
    row (same kernel pattern as the codec's mapInArrow encode)."""
    if vectorized is None:
        vectorized = len(cents) > _EXPR_QUANTIZER_MAX_CELLS
    if not vectorized:
        sc = _cell_scores(F.col(vec_col), cents)
        return df.withColumn(
            "cell", F.array_position(sc, F.array_max(sc)).cast("int")
        )

    from pyspark.sql.functions import pandas_udf

    Cn = _norm_cent_matrix(cents)  # (dim, n_cells), unit columns

    @pandas_udf("int")
    def _argmax_cell(vs: pd.Series) -> pd.Series:
        V = np.vstack(vs.to_numpy())
        # |v| is constant per row, so argmax of V @ Cn == argmax cosine;
        # np.argmax takes the FIRST max — same tie-break as
        # array_position(scores, array_max(scores))
        return pd.Series((V @ Cn).argmax(axis=1) + 1, dtype="int32")

    return df.withColumn("cell", _argmax_cell(F.col(vec_col)))


def _probe_cells(
    p: DataFrame, cents, n_probe: int, vectorized: bool | None = None
) -> DataFrame:
    """One row per (probe, probed cell): the n_probe best cells by
    probe-to-centroid cosine. Ties prefer the larger cell id (the
    expression path's reverse(array_sort(struct(s, i))) ordering); the
    vectorized path reproduces that via a stable argsort over the
    column-reversed score matrix."""
    if vectorized is None:
        vectorized = len(cents) > _EXPR_QUANTIZER_MAX_CELLS
    n_top = min(n_probe, len(cents))
    if not vectorized:
        psc = _cell_scores(F.col("_p"), cents)
        pairs = F.transform(
            F.sequence(F.lit(1), F.lit(len(cents))),
            lambda i: F.struct(F.element_at(psc, i).alias("s"), i.alias("i")),
        )
        top = F.slice(F.reverse(F.array_sort(pairs)), 1, n_top)
        return p.withColumn(
            "cell", F.explode(F.transform(top, lambda st: st["i"].cast("int")))
        )

    from pyspark.sql.functions import pandas_udf

    Cn = _norm_cent_matrix(cents)
    m = len(cents)

    @pandas_udf("array<int>")
    def _top_cells(vs: pd.Series) -> pd.Series:
        V = np.vstack(vs.to_numpy())
        S = (V @ Cn)[:, ::-1]  # reversed columns: stable sort then
        # prefers the larger original cell id on ties
        order = np.argsort(-S, axis=1, kind="stable")[:, :n_top]
        cells = (m - order).astype("int32")
        return pd.Series(list(cells))

    return p.withColumn("cell", F.explode(_top_cells(F.col("_p"))))


def build_ivf_index(
    embeddings: DataFrame,
    path: str,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectorized: bool | None = None,
    train_iters: int = 0,
    train_sample: float | None = None,
) -> None:
    """Materialize the IVF layout for 100-TB search: the embedding
    table written ONCE partitioned by its assigned cell, centroids in a
    JSON sidecar. Every later probe batch reads only its probed cell
    partitions (directory-level pruning — the inverted-list read is
    O(probed cells), never a full scan; plan-asserted in
    tests/test_plans.py). Quantizer auto-vectorizes past
    ``_EXPR_QUANTIZER_MAX_CELLS`` (see ``_assign_cells``).

    ``train_iters`` > 0 refines the seeded-sample quantizer with that
    many Lloyd iterations (``train_centroids``) over ``train_sample``
    of the table — better probe efficiency on skewed distributions."""
    import json
    import os

    e = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    if train_iters > 0:
        cents = train_centroids(e, n_cells, train_iters, train_sample,
                                vectorized)
    else:
        cents = _seeded_centroids(e, n_cells)
    assigned = _assign_cells(e, cents, vectorized=vectorized)
    assigned.repartition("cell").write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(path)
    with open(os.path.join(path, "_centroids.json"), "w") as f:
        json.dump(cents, f)


def ivf_search(
    spark,
    path: str,
    probes: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    vectorized: bool | None = None,
) -> DataFrame:
    """Search a ``build_ivf_index`` store: probed cells prune the
    partitioned scan; exact cosine re-rank inside candidates. Same
    result contract as ``ivf_topk`` over the same quantizer."""
    import json
    import os

    with open(os.path.join(path, "_centroids.json")) as f:
        cents = json.load(f)
    p = probes.select(
        "probe_id", F.col("probe_vec").cast("array<double>").alias("_p")
    )
    # the probe frame is metadata-scale (probes × n_probe rows):
    # collect ONCE and rebuild the join side from the rows — the
    # top-cells quantizer kernel would otherwise run twice (probed-cell
    # collect + join side), and a persist/checkpoint would leave
    # storage pinned past the call (the leak the lifecycle test hunts)
    p = _probe_cells(p, cents, n_probe, vectorized=vectorized)
    prows = p.collect()
    p = spark.createDataFrame(prows, p.schema)
    cells = sorted({r["cell"] for r in prows})
    # cell ∈ probed-set is a PARTITION filter on the store layout
    store = spark.read.parquet(path).filter(F.col("cell").isin(cells))
    cand = store.join(F.broadcast(p), "cell").filter(
        F.col("vec_id") != F.col("probe_id")
    )
    cand = cand.withColumn("cos", cosine(F.col("_v"), F.col("_p")))
    w = W.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "vec_id", F.round("cos", 6).alias("cos"), "rank")
    )


def ivf_topk(
    embeddings: DataFrame,
    probes: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectorized: bool | None = None,
    train_iters: int = 0,
) -> DataFrame:
    """IVF ANN — the inverted-file sibling of ``lsh_topk``.

    Coarse quantizer: ``n_cells`` deterministic centroids (the vectors
    with the smallest ``xxhash64(id)`` — a seeded sample; pass
    ``train_iters`` > 0 for Lloyd-refined centroids on skewed
    distributions, see ``train_centroids``). Every vector is assigned to its
    max-cosine centroid (the inverted lists) — JVM-side expressions for
    small quantizers, a broadcast-centroid numpy GEMM per Arrow batch
    past ``_EXPR_QUANTIZER_MAX_CELLS`` (10³-10⁵ cells, the real-IVF
    regime). A probe searches its ``n_probe`` best cells and re-ranks
    exactly. With ``n_probe == n_cells`` this degrades gracefully to
    exact search. At scale the assignment is a narrow column — the
    embedding table shuffles once on ``cell`` (or is written
    cell-partitioned once and every query prunes to its probed cells).
    """
    e = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    if train_iters > 0:
        cents = train_centroids(e, n_cells, train_iters,
                                vectorized=vectorized)
    else:
        cents = _seeded_centroids(e, n_cells)
    assigned = _assign_cells(e, cents, vectorized=vectorized)

    p = probes.select(
        "probe_id", F.col("probe_vec").cast("array<double>").alias("_p")
    )
    p = _probe_cells(p, cents, n_probe, vectorized=vectorized)

    cand = assigned.join(F.broadcast(p), "cell").filter(
        F.col("vec_id") != F.col("probe_id")
    )
    cand = cand.withColumn("cos", cosine(F.col("_v"), F.col("_p")))
    w = W.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "vec_id", F.round("cos", 6).alias("cos"), "rank")
    )


def build_lsh_index(
    embeddings: DataFrame,
    path: str,
    n_planes: int = 8,
    n_tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the multi-table LSH layout: the embedding table
    exploded ×n_tables and written partitioned by (table, bucket
    prefix). Probes then prune the scan to their ~L·(m+1) buckets —
    the persisted sibling of ``lsh_topk`` (same signatures, same
    results). Partitioning uses table + an 8-way bucket prefix (full
    2^m bucket dirs per table would be a small-file storm; the prefix
    keeps pruning directory-level while buckets stay row-group
    filterable).

    The banding parameters are PINNED in a ``_lsh_index.json`` sidecar
    (the build_minhash_index convention): probing with a different
    plane family would silently hash into disjoint buckets and return
    near-empty results with no error — lsh_search validates against
    the pin."""
    import json
    import os

    e = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).select(
        "vec_id", "_v",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(t).alias("table"),
                    hyperplane_signature(
                        F.col("_v"), n_planes, dim, plane_offset=t * n_planes
                    ).alias("bucket"),
                )
                for t in range(n_tables)
            ])
        ).alias("_tb"),
    ).select("vec_id", "_v", "_tb.table", "_tb.bucket")
    e = e.withColumn("bprefix", F.pmod(F.col("bucket"), F.lit(8)).cast("int"))
    e.repartition("table", "bprefix").write.mode("overwrite").partitionBy(
        "table", "bprefix"
    ).parquet(path)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "_lsh_index.json"), "w") as f:
        json.dump({"n_planes": n_planes, "n_tables": n_tables,
                   "dim": dim}, f)


def lsh_search(
    spark,
    path: str,
    probes: DataFrame,
    k: int = 10,
    n_planes: int | None = None,
    n_tables: int | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Search a ``build_lsh_index`` store; equals ``lsh_topk`` with the
    same parameters over the same embeddings.

    Banding parameters default to the store's ``_lsh_index.json`` pin;
    passing a value that CONFLICTS with the pin raises (mismatched
    plane families probe disjoint buckets — a silent empty-result
    failure otherwise). Stores without a sidecar fall back to the
    historical defaults (8, 8, 64)."""
    import json
    import os

    pinned = {}
    sc_path = os.path.join(path, "_lsh_index.json")
    if os.path.exists(sc_path):
        with open(sc_path) as f:
            pinned = json.load(f)

    def _resolve(name: str, given, default):
        pin = pinned.get(name)
        if pin is not None:
            if given is not None and given != pin:
                raise ValueError(
                    f"lsh_search {name}={given} conflicts with the "
                    f"store's pinned {name}={pin} ({sc_path}); probing "
                    "with a different plane family would silently miss "
                    "every bucket"
                )
            return pin
        return default if given is None else given

    n_planes = _resolve("n_planes", n_planes, 8)
    n_tables = _resolve("n_tables", n_tables, 8)
    dim = _resolve("dim", dim, 64)
    p = probes.select(
        "probe_id", F.col("probe_vec").cast("array<double>").alias("_p")
    ).select(
        "probe_id", "_p",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(t).alias("table"),
                    hyperplane_signature(
                        F.col("_p"), n_planes, dim, plane_offset=t * n_planes
                    ).alias("sig0"),
                )
                for t in range(n_tables)
            ])
        ).alias("_tb"),
    ).select("probe_id", "_p", "_tb.table", F.col("_tb.sig0").alias("_sig0"))
    p = p.select(
        "probe_id", "_p", "table",
        F.explode(
            F.array(
                F.col("_sig0"),
                *[F.col("_sig0").bitwiseXOR(F.lit(1 << b))
                  for b in range(n_planes)],
            )
        ).alias("bucket"),
    ).withColumn("bprefix", F.pmod(F.col("bucket"), F.lit(8)).cast("int"))

    # the probe frame is metadata-scale (probes × tables × (m+1)
    # rows): collect ONCE and rebuild the join side from the rows — the
    # n_tables × n_planes signature aggregates would otherwise run
    # twice (probed-partition collect + join side), and a
    # persist/checkpoint would leave storage pinned past the call
    prows = p.collect()
    p = spark.createDataFrame(prows, p.schema)
    keys = {(r["table"], r["bprefix"]) for r in prows}
    store = spark.read.parquet(path)
    if not keys:
        # empty probe batch (a nightly job with no new queries) must
        # return an empty result, not crash in filter(None)
        store = store.filter(F.lit(False))
    else:
        cond = None
        for t, bp in sorted(keys):
            c = (F.col("table") == t) & (F.col("bprefix") == bp)
            cond = c if cond is None else (cond | c)
        store = store.filter(cond)
    cand = store.join(F.broadcast(p), ["table", "bucket"]).filter(
        F.col("vec_id") != F.col("probe_id")
    )
    cand = cand.withColumn("cos", cosine(F.col("_v"), F.col("_p"))).dropDuplicates(
        ["probe_id", "vec_id"]
    )
    w = W.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "vec_id", F.round("cos", 6).alias("cos"), "rank")
    )


def lsh_topk(
    embeddings: DataFrame,
    probes: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN via multi-table hyperplane LSH: ``n_tables`` independent
    signature families of ``n_planes`` bits each; candidates share a
    probe's bucket in ANY table (plus all 1-bit-flip neighbor buckets —
    multi-probe), then exact cosine re-rank.

    One table has recall p^m per neighbor (p = 1 - θ/π); L independent
    tables lift it to 1-(1-p^m)^L — the standard memory-for-recall LSH
    trade. The big side explodes ×L on (table, bucket) and equi-joins;
    at warehouse scale the exploded table is written bucket-partitioned
    once and every probe batch prunes to its ~L·(m+1) buckets."""
    e = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).select(
        "vec_id", "_v",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(t).alias("table"),
                    hyperplane_signature(
                        F.col("_v"), n_planes, dim, plane_offset=t * n_planes
                    ).alias("bucket"),
                )
                for t in range(n_tables)
            ])
        ).alias("_tb"),
    ).select("vec_id", "_v", "_tb.table", "_tb.bucket")

    p = probes.select(
        "probe_id", F.col("probe_vec").cast("array<double>").alias("_p")
    ).select(
        "probe_id", "_p",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(t).alias("table"),
                    hyperplane_signature(
                        F.col("_p"), n_planes, dim, plane_offset=t * n_planes
                    ).alias("sig0"),
                )
                for t in range(n_tables)
            ])
        ).alias("_tb"),
    ).select("probe_id", "_p", "_tb.table", F.col("_tb.sig0").alias("_sig0"))
    # multi-probe: own bucket + every 1-bit flip, per table
    p = p.select(
        "probe_id", "_p", "table",
        F.explode(
            F.array(
                F.col("_sig0"),
                *[F.col("_sig0").bitwiseXOR(F.lit(1 << b))
                  for b in range(n_planes)],
            )
        ).alias("bucket"),
    )

    cand = e.join(F.broadcast(p), ["table", "bucket"]).filter(
        F.col("vec_id") != F.col("probe_id")
    )
    cand = cand.withColumn("cos", cosine(F.col("_v"), F.col("_p"))).dropDuplicates(
        ["probe_id", "vec_id"]
    )
    w = W.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "vec_id", F.round("cos", 6).alias("cos"), "rank")
    )
