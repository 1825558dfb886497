"""Capture .explain("formatted") for bench headline queries into plans/r10/.

Usage:
    python tools/capture_plans.py before            # all headline keys
    python tools/capture_plans.py after q_a,q_b     # named keys only

Writes plans/r10/<key>_<tag>.txt. Query construction runs (memo builds etc.)
but no query is executed end-to-end, so this is safe to run alongside other
work — it captures plan shape, not timing.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from fortune_500_financial_insights_pipeline_spark.queries import QUERIES  # noqa: E402
from fortune_500_financial_insights_pipeline_spark.session import get_spark  # noqa: E402


def explain_formatted(df) -> str:
    qe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return qe.explainString(mode)


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    keys = (
        [k for k in sys.argv[2].split(",") if k]
        if len(sys.argv) > 2
        else list(HEADLINE)
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r10"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="plan-capture")
    n_ok = 0
    for key in keys:
        if key not in QUERIES:
            print(f"SKIP {key}: not registered")
            continue
        try:
            df = QUERIES[key](spark, sf_dir)
            text = explain_formatted(df)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {key}: {type(e).__name__}: {e}")
            continue
        path = os.path.join(out_dir, f"{key}_{tag}.txt")
        with open(path, "w") as f:
            f.write(text)
        n_ok += 1
        print(f"OK   {key} -> {path} ({len(text)} bytes)")
    print(f"captured {n_ok}/{len(keys)}")
    spark.stop()
    return 0


if __name__ == "__main__":
    main()
