"""Web-graph job: pages parquet → link extraction → weighted host
edges → PageRank and/or HITS → parquet outputs.

spark-submit --py-files mtslake.zip mtslake/jobs/webgraph.py \\
    --store /data/lake --pages /data/pages --out /data/graph \\
    --pagerank-iters 10 --hits-iters 0

Writes under ``--out``:
  * ``edges/``    — (src_host, dst_host, weight)
  * ``pagerank/`` — (host, pr)            (when --pagerank-iters > 0)
  * ``hits/``     — (host, hub, auth)     (when --hits-iters > 0)

The edge list is aggregated once and checkpointed, then reused by both
algorithms — the per-round shuffles are O(edges-between-hosts), never
O(links) (graph.py scale notes).
"""

from __future__ import annotations

import sys

from mtslake import ckpt
from mtslake.graph import hits, pagerank
from mtslake.jobs.common import base_parser, build_session
from mtslake.urlops import extract_links, host_edges


def main(argv=None) -> None:
    p = base_parser("mtslake webgraph")
    p.add_argument("--pages", required=True,
                   help="pages parquet (url, html, ...)")
    p.add_argument("--out", required=True, help="output root")
    p.add_argument("--pagerank-iters", type=int, default=10)
    p.add_argument("--hits-iters", type=int, default=0)
    p.add_argument("--damping", type=float, default=0.85)
    args = p.parse_args(argv)
    spark = build_session("mtslake-webgraph", args)

    pages = spark.read.parquet(args.pages)
    edges = ckpt.eager_checkpoint(host_edges(extract_links(pages)))
    try:
        edges.write.mode("overwrite").parquet(f"{args.out}/edges")
        n_edges = edges.count()
        print(f"edges                  {n_edges}")
        if args.pagerank_iters > 0:
            pr = pagerank(edges, iters=args.pagerank_iters,
                          damping=args.damping)
            try:
                pr.write.mode("overwrite").parquet(f"{args.out}/pagerank")
                print(f"pagerank hosts         {pr.count()}")
            finally:
                ckpt.release(pr)
        if args.hits_iters > 0:
            hs = hits(edges, iters=args.hits_iters)
            try:
                hs.write.mode("overwrite").parquet(f"{args.out}/hits")
                print(f"hits hosts             {hs.count()}")
            finally:
                ckpt.release(hs)
    finally:
        ckpt.release(edges)


if __name__ == "__main__":
    main(sys.argv[1:])
