"""Component-level isolation of the round-9 top bench keys (guide §1.4):
time each stage of a key's pipeline with the noop sink so the expensive
stage is identified by measurement, not by reading the plan.

Usage: python tools/profile_components.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)


def t(spark, label, df, n=2):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription(label)
        df.write.format("noop").mode("overwrite").save()
        el = time.perf_counter() - t0
        best = el if best is None or el < best else best
    print(f"{best:7.3f}s  {label}", flush=True)
    spark.sparkContext.setJobDescription(None)
    return best


def main():
    from pyspark.sql import functions as F

    from fortune_500_financial_insights_pipeline_spark.session import get_spark
    from fortune_500_financial_insights_pipeline_spark.queries._core import load_table
    from fortune_500_financial_insights_pipeline_spark.operators.compact import (
        ensure_min_parallelism,
    )

    spark = get_spark(app_name="profile-components")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")

    # warmup
    docs.groupBy().count().collect()
    spark.createDataFrame([(1,)], "x long").mapInPandas(
        lambda it: it, schema="x long"
    ).collect()

    # ---- q_simhash_pairs decomposition -------------------------------
    from fortune_500_financial_insights_pipeline_spark.operators.minhash import (
        bucket_pairs,
        simhash_portable,
    )

    src = ensure_min_parallelism(docs, "doc_id")
    nd = 12
    vs = F.transform(
        F.split(F.col("text"), " "),
        lambda tk: F.conv(F.substring(F.md5(tk), 1, nd), 16, 10).cast("long"),
    )
    t(spark, "simhash: md5+conv only (token hash array)", src.select("doc_id", vs.alias("v")))
    sigs = src.select("doc_id", simhash_portable("text").alias("sig"))
    t(spark, "simhash: full signature fold", sigs)
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES
    t(spark, "q_simhash_pairs full", QUERIES["q_simhash_pairs"](spark, SF_DIR))

    # ---- q_gopher_repetition decomposition ---------------------------
    from fortune_500_financial_insights_pipeline_spark.operators.text import (
        char_entropy,
        gopher_repetition,
        repetition_stats,
    )

    t(spark, "gopher_repetition full", gopher_repetition(docs))
    t(spark, "repetition_stats (bigram, corpus)", repetition_stats(docs, "doc_id", "text"))
    t(spark, "char_entropy (corpus)", char_entropy(docs))
    t(spark, "q_curation_report full", QUERIES["q_curation_report"](spark, SF_DIR))

    # ---- bm25 family / rag ------------------------------------------
    t(spark, "q_rag_context_pack full", QUERIES["q_rag_context_pack"](spark, SF_DIR))
    t(spark, "q_bm25 full", QUERIES["q_bm25"](spark, SF_DIR))
    t(spark, "q_bm25_search full", QUERIES["q_bm25_search"](spark, SF_DIR))

    # ---- other top keys ----------------------------------------------
    for k in [
        "q_mahalanobis", "q_fifo_pnl", "q_semdedup", "q_boilerplate_chunks",
        "q_boilerplate_strip", "q_adamic_adar", "q_ivfpq_rerank",
        "q_mutual_knn", "q_source_overlap", "q_ivfpq_residual_topk",
        "q_perplexity_bucket", "q_ltv_curve", "q_weighted_median", "q_tfidf",
    ]:
        t(spark, f"{k} full", QUERIES[k](spark, SF_DIR))

    spark.stop()


if __name__ == "__main__":
    main()
