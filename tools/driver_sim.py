"""Simulate the external driver's correctness pass locally.

Runs registered queries at sf0.01 (the driver's scale) in the same order
``__spark_entry__.queries()`` exposes them, compares each against its DuckDB
oracle with the strict local harness, and prints per-key wall time — so slow
keys that would eat the driver's budget are visible before the round ends.

Usage:
    python tools/driver_sim.py [--limit N] [--only key1,key2] [--all]

Default checks only keys with no green row in any CORRECTNESS_r*.json.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--only", type=str, default="")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    ap.add_argument(
        "--prebuild-memos",
        action="store_true",
        help="pre-pay the shared memo builds as recorded lines (default on "
        "with --all / default key selection, off for --only)",
    )
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from fortune_500_financial_insights_pipeline_spark.session import get_spark
    from fortune_500_financial_insights_pipeline_spark.testing import (
        compare_frames,
        run_oracle,
    )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    verified = entrymod._verified_rounds()

    if args.only:
        keys = [k for k in args.only.split(",") if k in qs]
    else:
        keys = [k for k in qs if args.all or k not in verified]
    if args.limit:
        keys = keys[: args.limit]

    spark = get_spark(
        app_name="driver-sim", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )
    # Session warmup, recorded SEPARATELY: the first Spark job of any JVM
    # pays ~3-8 s of JIT + codegen + parquet-footer caching that belongs to
    # the session, not to whichever key happens to run first (r4's committed
    # record attributed 9.66 s to q_pagerank that way). One tiny
    # scan+shuffle+collect exercises the paths, and the cost lands on its
    # own "warmup_s" line so per-key numbers are comparable across runs.
    t_w = time.monotonic()
    spark.read.parquet(os.path.join(SF_DIR, "nation.parquet")).groupBy(
        "n_regionkey"
    ).count().collect()
    # ... and one trivial mapInPandas so Python-worker spawn + Arrow serde
    # init (~2-3 s once per session) lands here, not on whichever
    # Arrow-batched key happens to run first (r5's record billed it to
    # q_jpeg_decode_roundtrip: 2.14 s recorded vs 0.4 s steady-state).
    import pandas as _pd  # noqa: F401 — worker-side import primed below

    spark.createDataFrame([(1,)], "x long").mapInPandas(
        lambda it: it, schema="x long"
    ).collect()
    # ... and one tiny higher-order-function plan with a lazy checkpoint:
    # the FIRST Catalyst analysis of lambda-bearing expressions plus the
    # first localCheckpoint physical-planning pass JIT-compiles analyzer
    # paths worth ~2 s (measured round 7: the doc_jaccard_pairs(3,0.3)
    # memo line read 6.2 s cold vs 3.9 s with the analyzer warm), which is
    # session cost, not the first HOF-heavy key's.
    from pyspark.sql import functions as _F

    warm_df = spark.createDataFrame([(1, "a b c")], "id long, s string")
    warm_hof = warm_df.select(
        _F.array_sort(
            _F.transform(
                _F.split("s", " "), lambda x: _F.struct(_F.length(x).alias("l"), x.alias("t"))
            )
        ).alias("o")
    ).localCheckpoint(eager=False)
    warm_hof.count()
    # ... and the prefix-filtered set-similarity plan on a 2-row frame:
    # its expression classes (posexplode/arrays_zip/slice/ceil +
    # collect_list struct sorts) are the analyzer/codegen paths the
    # jaccard memo builds exercise first — JIT-ing them here keeps the
    # memo lines at marginal cost (measured: 6.1 s cold vs ~3.5 s warm).
    from fortune_500_financial_insights_pipeline_spark.operators.setjoin import (
        jaccard_pairs_exact,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.text import word_ngrams

    jaccard_pairs_exact(
        spark.createDataFrame(
            [(1, "a b c d"), (2, "a b c e")], "doc_id long, text string"
        ).select("doc_id", word_ngrams(_F.col("text"), 2).alias("grams")),
        threshold=0.3,
        return_counts=True,
    ).count()
    warmup_s = round(time.monotonic() - t_w, 2)
    print(f"[warmup] {warmup_s}s (session JIT/codegen, not attributed to any key)",
          flush=True)
    # Shared memo builds, also recorded as their own lines: deterministic
    # artifacts (pair lists, BPE merges, the walk corpus) are built once
    # per process and reused by whole key families — billing the build to
    # whichever consumer key happens to run first mis-ranks the cost
    # ordering this sim feeds (__spark_entry__ sorts unverified keys
    # cheapest-first). Production analogue: artifact jobs are scheduled,
    # not billed to the first query. Skipped for --only unless asked.
    memo_builds: dict[str, float] = {}
    if args.prebuild_memos or not args.only:
        from fortune_500_financial_insights_pipeline_spark.queries._core import MEMO_BUILDS

        for mname, thunk in MEMO_BUILDS:
            t_m = time.monotonic()
            thunk(spark, SF_DIR)
            memo_builds[mname] = round(time.monotonic() - t_m, 2)
            print(f"[memo] {mname} {memo_builds[mname]}s", flush=True)
    results: dict[str, dict] = {}
    t_all = time.monotonic()
    for i, k in enumerate(keys):
        t0 = time.monotonic()
        row: dict = {}
        try:
            df = qs[k](spark, SF_DIR)
            sdf = df.toPandas()
            # drop the DataFrame and force gc so localCheckpoint blocks
            # unpin between keys (bench.py's long-session mitigation —
            # stacked pinned blocks inflate later keys' times several-fold)
            del df
            gc.collect()
            t_spark = time.monotonic() - t0
            if k in oracles:
                t1 = time.monotonic()
                odf = run_oracle(oracles[k], SF_DIR)
                t_oracle = time.monotonic() - t1
                problems = compare_frames(sdf, odf)
                row = {
                    "ok": not problems,
                    "rows": len(sdf),
                    "spark_s": round(t_spark, 2),
                    "oracle_s": round(t_oracle, 2),
                    "problems": problems[:1],
                }
            else:
                row = {"ok": True, "rows": len(sdf), "spark_s": round(t_spark, 2),
                       "oracle_s": None, "problems": ["no_oracle"]}
        except Exception as e:  # noqa: BLE001
            row = {"ok": False, "rows": None, "spark_s": round(time.monotonic() - t0, 2),
                   "oracle_s": None, "problems": [f"{type(e).__name__}: {e}"[:300]]}
        results[k] = row
        status = "OK " if row["ok"] else "FAIL"
        print(
            f"[{i+1}/{len(keys)}] {status} {k:32s} spark={row['spark_s']}s "
            f"oracle={row['oracle_s']}s rows={row['rows']} {row['problems'] if not row['ok'] else ''}",
            flush=True,
        )
    total = time.monotonic() - t_all
    fails = [k for k, r in results.items() if not r["ok"]]
    slow = sorted(results, key=lambda k: -(results[k]["spark_s"] or 0))[:10]
    print(f"\nTOTAL {total:.1f}s for {len(keys)} keys; fails={fails}")
    print("slowest:", [(k, results[k]["spark_s"]) for k in slow])
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "driver_sim_last.json")
    # Merge into prior results: partial runs (--only/--limit) must not wipe
    # the cost data __spark_entry__.queries() uses to order unverified keys.
    merged: dict[str, dict] = {}
    try:
        with open(out) as f:
            merged = json.load(f).get("results", {})
    except (OSError, ValueError):
        pass
    merged.update(results)
    with open(out, "w") as f:
        json.dump(
            {
                "total_s": round(total, 1),
                "warmup_s": warmup_s,
                "memo_builds_s": memo_builds,
                "results": merged,
            },
            f,
            indent=1,
        )
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
