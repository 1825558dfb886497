"""Tier-2 key isolation (interleaved min-of-3 after warmup)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)

KEYS = [
    "q_bm25", "q_bm25_search", "q_rag_context_pack", "q_mahalanobis",
    "q_fifo_pnl", "q_semdedup", "q_boilerplate_chunks", "q_boilerplate_strip",
    "q_mutual_knn", "q_tfidf", "q_source_overlap", "q_rolling_median",
    "q_perplexity_bucket", "q_ltv_curve", "q_weighted_median",
    "q_substring_dup_coverage", "q_substring_dup_strip", "q_ewma",
    "q_interval_coverage", "q_kcore", "q_window_cumsum", "q_groupby_agg",
    "q_crawl_pipeline_e2e", "q_byte_entropy", "q_skipgram_pairs",
    "q_curation_report", "q_gopher_repetition", "q_simhash_pairs",
]


def main():
    from fortune_500_financial_insights_pipeline_spark.session import get_spark
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    spark = get_spark(app_name="profile-components4")
    cases = {k: QUERIES[k](spark, SF_DIR) for k in KEYS}
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
    for name, v in sorted(best.items(), key=lambda kv: -kv[1]):
        print(f"{v:7.3f}s  {name}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
