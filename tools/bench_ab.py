"""Instrumented bench A/B (round-5 verdict item 1): the EXACT bench.py
loop — same HEADLINE keys, same noop sink, same del/gc discipline — but
recording EVERY pass per key instead of only the min, plus a third
"post-suite" pass after the full loop has run twice. Output is one JSON
line with per-key [pass1, pass2, pass3] so cold-JIT, steady-state and
late-session inflation are separable per key. Findings land in
BASELINE.md."""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402 — reuse HEADLINE + baseline pins verbatim
from fortune_500_financial_insights_pipeline_spark.queries import QUERIES  # noqa: E402
from fortune_500_financial_insights_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="f500-bench-ab")
    runnable = [
        n
        for n in bench.HEADLINE
        if n in QUERIES and n not in {"q_jaccard_clusters", "q_minhash_neardup"}
    ]
    passes: dict[str, list[float]] = {n: [] for n in runnable}
    gc_deltas: dict[str, list[int]] = {n: [] for n in runnable}
    loads: dict[str, list[float]] = {n: [] for n in runnable}

    def jvm_gc_ms() -> int:
        beans = (
            spark._jvm.java.lang.management.ManagementFactory
            .getGarbageCollectorMXBeans()
        )
        return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))

    t_session0 = time.perf_counter()
    for p in range(3):
        for name in runnable:
            df = QUERIES[name](spark, sf_dir)
            g0 = jvm_gc_ms()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            passes[name].append(round(time.perf_counter() - t0, 4))
            gc_deltas[name].append(jvm_gc_ms() - g0)
            with open("/proc/loadavg") as f:
                loads[name].append(float(f.read().split()[0]))
            del df
            gc.collect()
        print(
            json.dumps(
                {
                    "pass": p + 1,
                    "elapsed_session_s": round(time.perf_counter() - t_session0, 1),
                    "pass_total_s": round(sum(v[p] for v in passes.values()), 2),
                }
            ),
            file=sys.stderr,
        )
    base_keys = [
        k
        for k, v in bench.DUCKDB_BASELINE_SF01.items()
        if v is not None and k in passes
    ]
    base = sum(bench.DUCKDB_BASELINE_SF01[k] for k in base_keys)
    out = {
        "passes": passes,
        "jvm_gc_ms": gc_deltas,
        "load1": loads,
        "vs_baseline_by_pass": [
            round(sum(passes[k][p] for k in base_keys) / base, 3) for p in range(3)
        ],
        "vs_baseline_min_p12": round(
            sum(min(passes[k][:2]) for k in base_keys) / base, 3
        ),
        "vs_baseline_min_all": round(
            sum(min(passes[k]) for k in base_keys) / base, 3
        ),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
