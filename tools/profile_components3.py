"""Stage isolation for gopher_repetition / boilerplate / adamic_adar /
ivfpq_rerank / mutual_knn (interleaved min-of-3 after warmup)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)


def main():
    from pyspark.sql import functions as F

    from fortune_500_financial_insights_pipeline_spark.session import get_spark
    from fortune_500_financial_insights_pipeline_spark.queries._core import load_table
    from fortune_500_financial_insights_pipeline_spark.operators.compact import (
        ensure_min_parallelism,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.text import (
        GOPHER_DUP_NGRAM_MAX,
        GOPHER_TOP_NGRAM_MAX,
    )
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    spark = get_spark(app_name="profile-components3")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")

    cases: dict[str, object] = {}

    # rebuild gopher internals (mirrors operators/text.py gopher_repetition)
    top_ns = sorted(GOPHER_TOP_NGRAM_MAX)
    dup_ns = sorted(GOPHER_DUP_NGRAM_MAX)
    src = ensure_min_parallelism(docs.select("doc_id", "text"), "doc_id").select(
        F.col("doc_id"),
        F.col("text").alias("__txt"),
        F.split(F.col("text"), " ").alias("__tk"),
    ).where(F.col("__tk").isNotNull())
    tk, sz = F.col("__tk"), F.size(F.col("__tk"))

    def gram_arr(n):
        return F.when(
            sz >= n,
            F.transform(
                F.sequence(F.lit(0), sz - n),
                lambda p: F.struct(
                    F.lit(n).alias("n"),
                    F.array_join(F.slice(tk, p + 1, n), " ").alias("gram"),
                    p.alias("pos"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<n:int,gram:string,pos:int>>"))

    def tall(ns):
        return src.select(
            F.col("doc_id"),
            F.explode(F.concat(*[gram_arr(n) for n in ns])).alias("__g"),
        ).select(
            F.col("doc_id"),
            F.col("__g.pos").alias("__pos"),
            F.col("__g.n").alias("__n"),
            F.col("__g.gram").alias("__gram"),
        )

    tmass = (
        tall(top_ns)
        .groupBy("__n", "doc_id", "__gram")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .groupBy("__n", "doc_id")
        .agg(F.max(F.col("__cnt") * (F.length("__gram") - (F.col("__n") - 1))).cast("long").alias("__mass"))
    )
    cases["gopher: tall(2..4) explode"] = tall(top_ns)
    cases["gopher: tmass branch"] = tmass
    dgrams = tall(dup_ns)
    cases["gopher: tall(5..10) explode"] = dgrams
    dups = (
        dgrams.groupBy("__n", "doc_id", "__gram")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .where(F.col("__cnt") >= 2)
        .select("__n", "doc_id", "__gram")
    )
    cases["gopher: dups agg"] = dups
    lens = src.select(
        "doc_id",
        F.posexplode(F.transform(tk, lambda t: F.length(t))).alias("__pos", "__len"),
    )
    dcov = (
        dgrams.join(dups, ["__n", "doc_id", "__gram"], "left_semi")
        .select(
            "__n",
            F.col("doc_id"),
            F.explode(F.sequence(F.col("__pos"), F.col("__pos") + F.col("__n") - 1)).alias("__pos"),
        )
        .distinct()
        .join(lens, ["doc_id", "__pos"])
        .groupBy("doc_id")
        .agg(*[
            F.sum(F.when(F.col("__n") == n, F.col("__len")).otherwise(0)).cast("long").alias(f"__dup{n}_chars")
            for n in dup_ns
        ])
    )
    cases["gopher: dcov branch"] = dcov

    for k in ["q_boilerplate_chunks", "q_boilerplate_strip", "q_adamic_adar",
              "q_ivfpq_rerank", "q_ivfpq_residual_topk", "q_mutual_knn",
              "q_source_overlap", "q_semdedup"]:
        cases[k] = QUERIES[k](spark, SF_DIR)

    for name, df in cases.items():
        df.write.format("noop").mode("overwrite").save()
    best: dict[str, float] = {}
    for p in range(3):
        for name, df in cases.items():
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            if name not in best or el < best[name]:
                best[name] = el
            spark.sparkContext.setJobDescription(None)
    for name, v in best.items():
        print(f"{v:7.3f}s  {name}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
