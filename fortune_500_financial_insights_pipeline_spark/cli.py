"""Command-line entrypoint: run the ELT graphs without writing Python.

    python -m fortune_500_financial_insights_pipeline_spark.cli elt \
        --kaggle 'raw/kaggle/*.us.txt' --api 'raw/api/*.csv' \
        --info 'raw/info/*.json' --esg 'raw/esg/*.json' \
        --warehouse /data/warehouse

    python -m fortune_500_financial_insights_pipeline_spark.cli serve \
        --warehouse /data/warehouse --query yearly_price_summary

Replaces the reference's Airflow DAG-trigger + Dataproc-submit ceremony
(SURVEY.md §3) with a direct job runner; the same functions slot into any
orchestrator as callables."""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="fortune_500_financial_insights_pipeline_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    elt = sub.add_parser("elt", help="run the full ELT graph into the warehouse")
    elt.add_argument("--kaggle", required=True, help="glob for Kaggle OHLCV files")
    elt.add_argument("--api", required=True, help="glob for API OHLCV files")
    elt.add_argument("--info", required=True, help="glob for company-info JSON")
    elt.add_argument("--esg", required=True, help="glob for sustainability JSON")
    elt.add_argument("--warehouse", required=True)
    elt.add_argument("--no-dedup", action="store_true",
                     help="raw-union parity mode (keep both sources' rows)")

    srv = sub.add_parser("serve", help="run a serving query over the warehouse")
    srv.add_argument("--warehouse", required=True)
    srv.add_argument("--query", required=True,
                     help="serving query name, or raw SQL when --sql is set")
    srv.add_argument("--sql", action="store_true")
    srv.add_argument("--limit", type=int, default=20)

    args = parser.parse_args(argv)

    from fortune_500_financial_insights_pipeline_spark.session import get_spark

    spark = get_spark(app_name=f"f500-cli-{args.cmd}")
    try:
        if args.cmd == "elt":
            from fortune_500_financial_insights_pipeline_spark.plans.jobs import build_elt_dag

            dag = build_elt_dag(
                spark,
                kaggle_glob=args.kaggle,
                api_glob=args.api,
                info_glob=args.info,
                sustainability_glob=args.esg,
                warehouse_path=args.warehouse,
                dedup=not args.no_dedup,
            )
            results = dag.run()
            for r in results.values():
                print(json.dumps({
                    "task": r.name, "status": r.status,
                    "elapsed_s": r.elapsed, "attempts": r.attempts,
                    "error": r.error,
                }))
            return 0 if all(r.status == "success" for r in results.values()) else 1

        from fortune_500_financial_insights_pipeline_spark import warehouse as WH

        WH.register(spark, args.warehouse)
        df = spark.sql(args.query) if args.sql else WH.serve(spark, args.query)
        for row in df.limit(args.limit).collect():
            print(json.dumps(row.asDict(), default=str))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
