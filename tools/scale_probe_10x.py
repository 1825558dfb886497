"""Round-10 scaling probe (r9 verdict item 8): the sf0.1 bench keys are
launch-overhead-bound, so 8-vs-32-core ratios read ~1 and cannot
demonstrate parallel scaling. This probe builds a 10x fixture (sf0.1
tiled ten times with shifted keys and per-copy-perturbed text/vectors so
self-join cardinalities grow ~linearly, not quadratically) and times the
most expensive DATA-BOUND bench keys at two core counts.

Usage:
    python tools/scale_probe_10x.py build       # write /root/synthdata/sf1x
    SPARK_GRAFT_CPUS=32 python tools/scale_probe_10x.py run > out32.json
    SPARK_GRAFT_CPUS=8  python tools/scale_probe_10x.py run > out8.json

The driver-facing bench contract is untouched; this is a side artifact
(tools/scale_probe_10x*.json) the round log cites.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/root/synthdata/sf1x"
COPIES = 10
STRIDE = 50_000_000  # key shift per copy, far above any sf0.1 key

# expensive, data-bound keys whose inputs are covered by the tiled tables
KEYS = [
    "q_groupby_agg",
    "q_window_cumsum",
    "q_weighted_median",
    "q_mahalanobis",
    "q_bm25",
    "q_tfidf",
    "q_gopher_repetition",
    "q_boilerplate_chunks",
    "q_byte_entropy",
    "q_curation_report",
    "q_simhash_pairs",
    "q_semdedup",
]

# key-typed columns to shift per copy, per table (id spaces stay disjoint
# across copies so joins/self-joins scale linearly)
SHIFT = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["user_id"],
}
COPY_VERBATIM = ["nation", "region", "supplier", "part"]


def build() -> None:
    from pyspark.sql import functions as F

    from fortune_500_financial_insights_pipeline_spark.session import get_spark

    spark = get_spark(app_name="scale-probe-build")
    os.makedirs(DST, exist_ok=True)
    for t in COPY_VERBATIM:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )
    for t, keys in SHIFT.items():
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = []
        for i in range(COPIES):
            c = base
            for k in keys:
                c = c.withColumn(k, (F.col(k) + F.lit(i * STRIDE)).cast("long"))
            if t == "documents" and "text" in c.columns:
                # unique per-copy suffix token: near-dup neighborhoods stay
                # copy-local instead of exploding 100x across copies
                c = c.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" copytag{i}"))
                )
            if t == "embeddings" and "embedding" in c.columns:
                eps = float(i) * 1e-4
                c = c.withColumn(
                    "embedding",
                    F.transform("embedding", lambda x: x + F.lit(eps)),
                )
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
        print(f"built {t}: {spark.read.parquet(f'{DST}/{t}.parquet').count()} rows",
              file=sys.stderr)
    spark.stop()


def run() -> None:
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES
    from fortune_500_financial_insights_pipeline_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name=f"scale-probe-{cpus}")
    # session warmup (JIT) so pass-1 isn't pure codegen compilation
    spark.read.parquet(f"{DST}/nation.parquet").groupBy("n_regionkey").count().collect()
    timings: dict[str, float] = {}
    plan_s: dict[str, float] = {}
    for pass_i in range(2):
        for name in KEYS:
            t0 = time.perf_counter()
            try:
                df = QUERIES[name](spark, DST)
                t1 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                el = time.perf_counter() - t0
            except Exception as e:  # noqa: BLE001
                timings[name] = -1.0
                print(f"{name}: {type(e).__name__}: {e}", file=sys.stderr)
                continue
            if name not in timings or el < timings[name]:
                timings[name] = round(el, 3)
                plan_s[name] = round(t1 - t0, 3)
            del df
    print(json.dumps({
        "cpus": int(cpus),
        "fixture": DST,
        "copies": COPIES,
        "queries": timings,
        "plan_s": plan_s,
    }))
    spark.stop()


if __name__ == "__main__":
    {"build": build, "run": run}[sys.argv[1]]()
