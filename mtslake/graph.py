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
) -> DataFrame:
    """Weighted PageRank over ``(src, dst, weight)`` edges.

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
    try:
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
