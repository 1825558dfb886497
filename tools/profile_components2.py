"""Round-2 component isolation: interleaved min-of-3 passes after a full
warmup pass, so JIT/codegen lands on pass 1 and the min is steady-state
(the bench.py discipline). Decomposes q_simhash_pairs and the
repetition/entropy operators stage by stage.
"""
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
    from fortune_500_financial_insights_pipeline_spark.operators.minhash import (
        bucket_pairs,
        simhash_portable,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.text import (
        char_entropy,
        gopher_repetition,
        repetition_stats,
        word_ngrams_all,
    )
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    spark = get_spark(app_name="profile-components2")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    src = ensure_min_parallelism(docs, "doc_id")

    cases: dict[str, object] = {}

    # --- simhash decomposition ---
    sigs = src.select("doc_id", simhash_portable("text").alias("sig"))
    cases["simhash: signature only"] = sigs
    bands = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        (
                            F.floor(F.col("sig") / F.lit(float(2 ** (12 * b)))).cast(
                                "long"
                            )
                            % 4096
                        ).alias("bval"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "sig", "bb.band", "bb.bval")
    cases["simhash: sig+banding"] = bands
    cases["simhash: +bucket_pairs"] = bucket_pairs(
        bands, ["band", "bval"], "doc_id", carry_cols=("sig",)
    )
    cases["q_simhash_pairs full"] = QUERIES["q_simhash_pairs"](spark, SF_DIR)

    # --- repetition_stats decomposition ---
    grams = src.select(
        F.col("doc_id"), F.explode(word_ngrams_all("text", 2)).alias("gram")
    )
    cases["rep: gram explode only"] = grams
    per = grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    cases["rep: +groupBy(doc,gram)"] = per
    cases["repetition_stats full"] = repetition_stats(docs, "doc_id", "text")

    # --- char_entropy ---
    cases["char_entropy full"] = char_entropy(docs)

    # --- gopher decomposition: reach into internals by rebuilding ---
    cases["gopher_repetition full"] = gopher_repetition(docs)

    cases["q_curation_report full"] = QUERIES["q_curation_report"](spark, SF_DIR)

    # warmup pass (untimed)
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
