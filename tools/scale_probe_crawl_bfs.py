"""Scale probe: the crawl_bfs ITERATION at 1x / 10x / 100x corpus (and
thus frontier) width, swept over crawl depth — the open question from
the round-8 verdict: what does the per-round lineage cut
(localCheckpoint) cost at depth > 5, and does the loop stay linear in
the FRONTIER SLICE (the work each round should pay) rather than the
accumulated seen set?

Graph: N pages, page u links to (3u+1)%N, (7u+2)%N, (u+1)%N — from 16
seeds the frontier roughly triples per round until it saturates at N,
so small N shows the saturated regime (frontier ~N, rounds keep paying
only the anti-join) and large N the growth regime. For each (N, depth)
the probe times a FULL crawl_bfs run; the marginal column (wall[d] -
wall[d-1]) is the cost of ROUND d — parse of round d-1's slice +
distinct + anti-join + one eager localCheckpoint.

Prints one JSON line per (N, depth).

Usage: python tools/scale_probe_crawl_bfs.py [--sizes 2000,20000,200000]
       [--max-depth 6]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=str, default="2000,20000,200000")
    ap.add_argument("--max-depth", type=int, default=6)
    ap.add_argument("--seeds", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from fortune_500_financial_insights_pipeline_spark.operators.crawl import crawl_bfs
    from fortune_500_financial_insights_pipeline_spark.session import get_spark

    spark = get_spark(app_name="scale-probe-crawl-bfs")
    spark.range(1).count()  # session warmup

    for n in [int(s) for s in args.sizes.split(",")]:
        i = F.col("id")
        pages = (
            spark.range(n)
            .select(
                F.concat(F.lit("http://g.test/p/"), i).alias("url"),
                F.concat(
                    F.lit("<html><body><a href='/p/"),
                    ((i * 3 + 1) % n).cast("string"),
                    F.lit("'>a</a><a href='/p/"),
                    ((i * 7 + 2) % n).cast("string"),
                    F.lit("'>b</a><a href='/p/"),
                    ((i + 1) % n).cast("string"),
                    F.lit("'>c</a></body></html>"),
                ).alias("html"),
            )
            .localCheckpoint(eager=True)
        )
        seeds = spark.range(args.seeds).select(
            F.concat(F.lit("http://g.test/p/"), F.col("id")).alias("url")
        )
        # warm the per-scale plan family once (JIT/codegen not billed)
        crawl_bfs(pages, seeds, rounds=1).count()
        prev_wall = None
        for depth in range(1, args.max_depth + 1):
            t0 = time.monotonic()
            out = crawl_bfs(pages, seeds, rounds=depth)
            hist = {
                int(r["depth"]): int(r["n"])
                for r in out.groupBy("depth")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            wall = round(time.monotonic() - t0, 2)
            marginal = None if prev_wall is None else round(wall - prev_wall, 2)
            prev_wall = wall
            print(
                json.dumps(
                    {
                        "n_pages": n,
                        "depth": depth,
                        "wall_s": wall,
                        "marginal_round_s": marginal,
                        "n_discovered": sum(hist.values()),
                        "frontier_last": hist.get(depth, 0),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
