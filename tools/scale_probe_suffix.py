"""Scale probe: suffix-array prefix doubling at 1x / 10x / 100x corpus
(documents doc_id < 40 / 400 / 4000 at sf0.1). What should scale:
per-round work is one doc-keyed window + one range-partitioned sort over
n positions — linear bytes per round; round COUNT grows with
log2(max doc length), which is constant as the corpus WIDENS, so wall
should grow sublinearly vs the position count (idle cores absorb it at
fixture scale). Prints one JSON line per corpus size, including the
doubling-round count actually run.

Usage: python tools/scale_probe_suffix.py [--caps 40,400,4000]
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
    ap.add_argument("--caps", type=str, default="40,400,4000")
    args = ap.parse_args()
    caps = [int(c) for c in args.caps.split(",")]

    from pyspark.sql import functions as F

    from fortune_500_financial_insights_pipeline_spark.catalog import load_table
    from fortune_500_financial_insights_pipeline_spark.operators.suffix import (
        suffix_array_tokens,
    )
    from fortune_500_financial_insights_pipeline_spark.session import get_spark

    spark = get_spark(app_name="scale-probe-suffix")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for i, cap in enumerate(caps):
        label = f"{10 ** i}x" if caps == [40, 400, 4000] else f"cap{cap}"
        d = load_table(spark, sf, "documents").where(F.col("doc_id") < cap)
        stats: dict = {}
        n = suffix_array_tokens(d).count()  # warm
        t0 = time.perf_counter()
        n = suffix_array_tokens(d, stats=stats).count()
        wall = time.perf_counter() - t0
        print(json.dumps({
            "probe": "suffix_array", "corpus": label, "cap": cap,
            "n_suffixes": n, "rounds": stats.get("rounds"),
            "max_len": stats.get("max_len"), "wall_s": round(wall, 2),
        }))
    spark.stop()


if __name__ == "__main__":
    main()
