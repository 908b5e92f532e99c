"""Host-graph algorithms over the crawl's link structure.

``urlops.extract_links`` / ``host_edges`` build the weighted host
graph; this module runs iterative algorithms on it. PageRank here is
the canonical one (Brin & Page 1998, public): rank flows along
weighted out-links with damping, dangling mass redistributed
uniformly.

Scale shape: one contribution join per iteration shuffling O(edges)
rows plus a node-keyed aggregation — the same two-shuffle round as
``dedup.cluster_pairs``; the rank frontier is eager-checkpointed per
round (plan truncation) and the superseded frontier's storage is
released immediately (ckpt.py), so K iterations hold O(1) frontiers.
The HOST graph is aggregated before iteration (host_edges), so the
per-round shuffle is edges-between-hosts, never raw links.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .ckpt import eager_checkpoint, release as release_ckpt


def pagerank(
    edges: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    src: str = "src_host",
    dst: str = "dst_host",
    weight: str = "weight",
    seeds: DataFrame | None = None,
    seed_weight: str | None = None,
) -> DataFrame:
    """Weighted PageRank over ``(src, dst, weight)`` edges.

    ``seeds=None`` is the uniform-teleport classic. Passing ``seeds``
    (a frame with a ``host`` column, optionally ``seed_weight``) makes
    it PERSONALIZED PageRank with the TrustRank teleport (Gyöngyi,
    Garcia-Molina & Pedersen 2004, VLDB: bias the reset vector to a
    trusted seed set so rank flows outward from trust): both the
    (1−damping) teleport and the dangling mass land on the normalized
    seed distribution instead of 1/n, so unreachable-from-seeds hosts
    converge to exactly 0. The two modes keep separate arithmetic
    paths — the uniform path's float expressions are byte-identical to
    before the parameter existed.

    Returns ``(host, pr)`` for every host appearing as source or
    destination; Σpr = 1 up to float reduction order. The returned
    frame is a caller-owned checkpoint (``ckpt.release`` when done).
    """
    nodes = (
        edges.select(F.col(src).alias("host"))
        .unionByName(edges.select(F.col(dst).alias("host")))
        .distinct()
    )
    nodes = eager_checkpoint(nodes)
    n = nodes.count()
    out_w = edges.groupBy(src).agg(F.sum(weight).alias("_ow"))
    # per-edge share of the source's rank (constant across rounds)
    share = eager_checkpoint(
        edges.join(out_w, src)
        .select(
            F.col(src).alias("_s"),
            F.col(dst).alias("host"),
            (F.col(weight).cast("double") / F.col("_ow")).alias("_frac"),
        )
    )
    sinks = None
    resetv = None
    try:
        if seeds is not None:
            sw = seeds.select(
                F.col("host").alias("host"),
                (
                    F.col(seed_weight).cast("double")
                    if seed_weight else F.lit(1.0)
                ).alias("_sw"),
            )
            # normalize over seeds PRESENT in the graph — a seed host
            # with no edges cannot receive flow, and normalizing over
            # the raw list would silently leak its teleport share
            # (Σpr < 1) every round
            present = nodes.join(sw, "host")
            if present.limit(1).count() == 0:
                # a stale/typo'd trust list would otherwise make _tot
                # NULL → every _r coalesces to 0 → pr ≡ 0 silently,
                # breaking the Σpr = 1 invariant downstream joins
                # assume. Fail loudly instead.
                raise ValueError(
                    "personalized pagerank: no seed host appears in "
                    "the graph (seeds must intersect edge endpoints)"
                )
            tot = F.broadcast(present.agg(F.sum("_sw").alias("_tot")))
            # constant across rounds — checkpointed once, like `share`
            resetv = eager_checkpoint(
                nodes.join(sw, "host", "left")
                .crossJoin(tot)
                .select(
                    "host",
                    F.coalesce(F.col("_sw") / F.col("_tot"), F.lit(0.0))
                    .alias("_r"),
                )
            )
            pr = eager_checkpoint(
                resetv.select("host", F.col("_r").alias("pr"))
            )
        else:
            pr = eager_checkpoint(
                nodes.select("host", F.lit(1.0 / n).alias("pr"))
            )
        base = (1.0 - damping) / n
        sinks = eager_checkpoint(
            nodes.join(
                out_w.select(F.col(src).alias("host")), "host", "left_anti"
            )
        )
        for _ in range(max(0, int(iters))):
            # dangling mass (rank held by hosts with no out-edges,
            # redistributed uniformly — standard formulation) stays
            # IN-PLAN: a broadcast single-row aggregate instead of a
            # driver action per round (halves the jobs per iteration)
            dangling = F.broadcast(
                pr.join(sinks.select("host"), "host")
                .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("_dang"))
            )
            contribs = (
                share.join(
                    pr.withColumnRenamed("host", "_s"), "_s"
                )
                .groupBy("host")
                .agg(F.sum(F.col("pr") * F.col("_frac")).alias("_in"))
            )
            if resetv is not None:
                new_pr = (
                    resetv.join(contribs, "host", "left")
                    .crossJoin(dangling)
                    .select(
                        "host",
                        (
                            F.lit(1.0 - damping) * F.col("_r")
                            + F.lit(damping)
                            * (F.coalesce(F.col("_in"), F.lit(0.0))
                               + F.col("_dang") * F.col("_r"))
                        ).alias("pr"),
                    )
                )
            else:
                new_pr = (
                    nodes.join(contribs, "host", "left")
                    .crossJoin(dangling)
                    .select(
                        "host",
                        (
                            F.lit(base)
                            + F.lit(damping)
                            * (F.coalesce(F.col("_in"), F.lit(0.0))
                               + F.col("_dang") / n)
                        ).alias("pr"),
                    )
                )
            new_pr = eager_checkpoint(new_pr)
            release_ckpt(pr)
            pr = new_pr
        return pr
    finally:
        release_ckpt(nodes)
        release_ckpt(share)
        release_ckpt(sinks)
        release_ckpt(resetv)


def hits(
    edges: DataFrame,
    iters: int = 10,
    src: str = "src_host",
    dst: str = "dst_host",
    weight: str = "weight",
) -> DataFrame:
    """Weighted HITS (Kleinberg 1999, public): mutually-reinforcing
    hub and authority scores — ``auth(v) = Σ_{u→v} w·hub(u)`` then
    ``hub(u) = Σ_{u→v} w·auth(v)``, each side L2-normalized per round.

    Returns ``(host, hub, auth)`` for every host in the graph. The
    L2 norms stay IN-PLAN as broadcast single-row aggregates (the
    pagerank dangling-mass pattern — zero driver actions per round);
    the two frontiers are eager-checkpointed and superseded ones
    released, so K rounds hold O(1) frontiers. Per round: two
    edge-keyed joins + two node aggregations shuffling
    O(edges-between-hosts) — run it on ``host_edges`` output, never
    raw links. The returned frame is a caller-owned checkpoint
    (``ckpt.release`` when done)."""
    nodes = (
        edges.select(F.col(src).alias("host"))
        .unionByName(edges.select(F.col(dst).alias("host")))
        .distinct()
    )
    nodes = eager_checkpoint(nodes)
    e = eager_checkpoint(
        edges.select(
            F.col(src).alias("_s"), F.col(dst).alias("_d"),
            F.col(weight).cast("double").alias("_w"),
        )
    )
    cur = None
    try:
        cur = eager_checkpoint(
            nodes.select("host", F.lit(1.0).alias("hub"),
                         F.lit(1.0).alias("auth"))
        )
        for _ in range(max(0, int(iters))):
            a_raw = (
                e.join(cur.select(F.col("host").alias("_s"), "hub"), "_s")
                .groupBy(F.col("_d").alias("host"))
                .agg(F.sum(F.col("_w") * F.col("hub")).alias("_a"))
            )
            a_n = F.broadcast(
                a_raw.agg(F.sqrt(F.sum(F.col("_a") * F.col("_a")))
                          .alias("_an"))
            )
            # checkpointed: auth feeds BOTH h_raw and the final join —
            # without it the whole auth plan executes twice per round
            auth = eager_checkpoint(
                nodes.join(a_raw, "host", "left")
                .crossJoin(a_n)
                .select(
                    "host",
                    F.coalesce(F.col("_a") / F.col("_an"), F.lit(0.0))
                    .alias("auth"),
                )
            )
            h_raw = (
                e.join(auth.select(F.col("host").alias("_d"), "auth"), "_d")
                .groupBy(F.col("_s").alias("host"))
                .agg(F.sum(F.col("_w") * F.col("auth")).alias("_h"))
            )
            h_n = F.broadcast(
                h_raw.agg(F.sqrt(F.sum(F.col("_h") * F.col("_h")))
                          .alias("_hn"))
            )
            nxt = eager_checkpoint(
                nodes.join(h_raw, "host", "left")
                .crossJoin(h_n)
                .join(auth, "host")
                .select(
                    "host",
                    F.coalesce(F.col("_h") / F.col("_hn"), F.lit(0.0))
                    .alias("hub"),
                    "auth",
                )
            )
            release_ckpt(auth)
            release_ckpt(cur)
            cur = nxt
        return cur
    finally:
        release_ckpt(nodes)
        release_ckpt(e)


def label_propagation(
    edges: DataFrame,
    iters: int = 5,
    src: str = "src_host",
    dst: str = "dst_host",
    weight: str = "weight",
) -> DataFrame:
    """Community detection by synchronous weighted label propagation
    (Raghavan, Albert & Kumara 2007, Phys. Rev. E): every node starts
    as its own community; each round, every node adopts the label
    with the greatest incident edge weight among its neighbors
    (counting its own current label at HALF its weighted degree as
    inertia — damps the bipartite flip-flop the synchronous variant
    is known for), ties broken by SMALLEST label — fully
    deterministic, unlike the paper's random asynchronous order, so a
    replayer or a re-run agrees exactly.

    Determinism discipline: label weights are EXACT decimals
    (quantized DECIMAL(27,6) inputs; double sums are
    addition-order-dependent across partitionings and would make the
    argmax flicker between runs), and the half-degree inertia is
    expressed without division — neighbor contributions count 2·Σw
    against the node's full weighted degree for its own label
    (2·L > deg ⟺ L > deg/2).

    Edges are symmetrized (union), weights sum over parallel edges,
    self-loops dropped. Returns (host, community) after ``iters``
    synchronous rounds.

    Scale shape: per round, one O(edges) frontier join + one
    (node, label) partial-aggregated groupBy + an exact argmax via
    max-weight semi-selection — the pagerank two-shuffle round, label
    frontier eager-checkpointed, superseded storage released (O(1)
    frontiers for K rounds).
    """
    dec = "decimal(27,6)"
    e = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b"),
        F.col(weight).cast(dec).alias("w"),
    )
    # sym and degree are constant across rounds — checkpoint once so
    # the symmetrize union + aggregate doesn't re-execute from raw
    # edges every iteration (pagerank's `share` discipline)
    sym = eager_checkpoint(
        e.unionByName(e.select(F.col("b").alias("a"),
                               F.col("a").alias("b"), "w"))
        .groupBy("a", "b").agg(F.sum("w").alias("w"))
        .where(F.col("a") != F.col("b"))
    )
    degree = None
    labels = None
    try:
        nodes = sym.select(F.col("a").alias("host")).distinct()
        degree = eager_checkpoint(
            sym.groupBy(F.col("a").alias("host")).agg(
                F.sum("w").cast("decimal(38,6)").alias("_iw")
            )
        )
        labels = eager_checkpoint(
            nodes.select("host", F.col("host").alias("community"))
        )
        for _ in range(int(iters)):
            contrib = (
                sym.join(labels.withColumnRenamed("host", "b")
                         .withColumnRenamed("community", "_nl"), "b")
                .groupBy(F.col("a").alias("host"), F.col("_nl"))
                .agg((F.lit(2) * F.sum("w")).cast("decimal(38,6)")
                     .alias("_lw"))
            )
            own = labels.join(degree, "host").select(
                "host", F.col("community").alias("_nl"),
                F.col("_iw").alias("_lw"),
            )
            pooled = contrib.unionByName(own).groupBy("host", "_nl").agg(
                F.sum("_lw").cast("decimal(38,6)").alias("_lw")
            )
            best_w = pooled.groupBy("host").agg(F.max("_lw").alias("_bw"))
            nxt = (
                pooled.join(best_w, "host")
                .where(F.col("_lw") == F.col("_bw"))
                .groupBy("host")
                .agg(F.min("_nl").alias("community"))
            )
            new_labels = eager_checkpoint(nxt.select("host", "community"))
            release_ckpt(labels)
            labels = new_labels
        out = labels
        labels = None  # ownership transfers to the caller
        return out
    except BaseException:
        if labels is not None:
            release_ckpt(labels)
        raise
    finally:
        # constants are internal — always released (the returned
        # frame's lineage is severed by its own checkpoint)
        release_ckpt(sym)
        if degree is not None:
            release_ckpt(degree)
