"""Time a subset of bench keys at sf0.1 with the bench.py methodology
(noop sink, min-of-N interleaved passes) — the inner loop for optimization
work; run the full bench.py for the committed number.

Usage: python tools/time_keys.py q_a,q_b[,...] [passes=3]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fortune_500_financial_insights_pipeline_spark.queries import QUERIES  # noqa: E402
from fortune_500_financial_insights_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    keys = [k for k in sys.argv[1].split(",") if k]
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="time-keys")
    # session warmup (same shape as bench.py)
    spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).groupBy(
        "n_regionkey"
    ).count().collect()
    spark.createDataFrame([(1,)], "x long").mapInPandas(
        lambda it: it, schema="x long"
    ).collect()

    dfs = {}
    t0 = time.perf_counter()
    for k in keys:
        dfs[k] = QUERIES[k](spark, sf_dir)
    build_s = round(time.perf_counter() - t0, 2)
    per: dict[str, list[float]] = {k: [] for k in keys}
    for _ in range(passes):
        for k in keys:
            t0 = time.perf_counter()
            dfs[k].write.format("noop").mode("overwrite").save()
            per[k].append(round(time.perf_counter() - t0, 4))
        gc.collect()
    out = {
        "build_s": build_s,
        "load1": round(os.getloadavg()[0], 1),
        "min": {k: min(v) for k, v in per.items()},
        "all": per,
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    main()
