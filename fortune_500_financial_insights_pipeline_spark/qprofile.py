"""Per-query profiling harness: time and explain any registered query.

    python -m fortune_500_financial_insights_pipeline_spark.qprofile q_groupby_agg
    python -m fortune_500_financial_insights_pipeline_spark.qprofile q_topk --explain --runs 3

Times are steady-state (one untimed warmup, then best of N) in a fresh
session — long-lived sessions accumulate state that inflates numbers
(SCALE.md). Prints one JSON line per query so output is greppable."""

from __future__ import annotations

import argparse
import json
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="profile")
    p.add_argument("queries", nargs="+", help="query names from queries.QUERIES, or 'all'")
    p.add_argument("--sf", default="/root/testdata/sf0.1", dest="sf_dir")
    p.add_argument("--runs", type=int, default=2, help="timed runs (best is reported)")
    p.add_argument("--explain", action="store_true", help="print the executed plan")
    args = p.parse_args(argv)

    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES
    from fortune_500_financial_insights_pipeline_spark.session import get_spark

    names = list(QUERIES) if args.queries == ["all"] else args.queries
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        p.error(f"unknown queries: {unknown}")

    spark = get_spark(app_name="f500-profile")
    try:
        for name in names:
            df = QUERIES[name](spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()  # warmup
            best = float("inf")
            for _ in range(args.runs):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            print(json.dumps({"query": name, "best_s": round(best, 4), "sf_dir": args.sf_dir}))
            if args.explain:
                print(df._jdf.queryExecution().executedPlan().toString())
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
