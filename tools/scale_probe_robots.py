"""Scale probe: the MAP-ONLY robots gate (round-8 rewrite) at 1x / 10x /
100x URL counts against a fixed 1,000-host rule dim (each host: one
plain-prefix Disallow, one wildcard Disallow, one longer Allow — the
realistic mix). What should scale: the rule dim collapses to one array
row per host and broadcasts; the verdict folds row-locally (filter +
aggregate higher-order functions), so the URL side never shuffles and
wall grows sublinearly until cores saturate, then linearly in URLs.
The r7 gate hash-partitioned the whole URL frame (with every carried
column) through a per-URL max_by aggregate — the shape this probe
would have exposed. Prints one JSON line per corpus size.

Usage: python tools/scale_probe_robots.py [--urls 20000,200000,2000000]
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
    ap.add_argument("--urls", type=str, default="20000,200000,2000000")
    ap.add_argument("--hosts", type=int, default=1000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from fortune_500_financial_insights_pipeline_spark.operators.robots import (
        robots_gate,
        robots_rules,
    )
    from fortune_500_financial_insights_pipeline_spark.session import get_spark

    spark = get_spark(app_name="scale-probe-robots")
    spark.range(1).count()  # session warmup

    hosts = spark.range(args.hosts).select(
        F.concat(F.lit("h"), F.col("id"), F.lit(".com")).alias("host"),
        F.concat(
            F.lit("User-agent: *\nDisallow: /private/\n"
                  "Disallow: /*.gif$\nAllow: /private/ok\n"),
        ).alias("robots_txt"),
    )
    rules = robots_rules(hosts).localCheckpoint(eager=True)

    for n in [int(x) for x in args.urls.split(",")]:
        urls = spark.range(n).select(
            F.concat(
                F.lit("http://h"), F.col("id") % args.hosts, F.lit(".com"),
                F.when(F.col("id") % 3 == 0, F.lit("/private/doc"))
                .when(F.col("id") % 3 == 1, F.lit("/img/x.gif"))
                .otherwise(F.lit("/open/page")),
                F.lit("/"), F.col("id"),
            ).alias("url")
        )
        # warm pass then timed pass (steady-state engine throughput)
        gated = robots_gate(urls, rules)
        gated.groupBy("allowed").count().collect()
        t0 = time.time()
        counts = {
            bool(r["allowed"]): r["count"]
            for r in robots_gate(urls, rules).groupBy("allowed").count().collect()
        }
        wall = time.time() - t0
        plan = gated._jdf.queryExecution().executedPlan().toString()
        print(json.dumps({
            "probe": "robots_gate",
            "n_urls": n,
            "n_hosts": args.hosts,
            "allowed": counts.get(True, 0),
            "blocked": counts.get(False, 0),
            "url_side_shuffles": plan.count("Exchange hashpartitioning(url"),
            "broadcast_join": "BroadcastHashJoin" in plan,
            "wall_s": round(wall, 2),
        }))


if __name__ == "__main__":
    main()
