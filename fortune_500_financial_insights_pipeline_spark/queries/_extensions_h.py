"""Round-7 extension queries: fragmented-MP4 (DASH/CMAF moof/traf/trun)
container indexing and the streaming-vs-batch substring-dedup reconcile
audit, under oracle hash rows."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fortune_500_financial_insights_pipeline_spark.catalog import load_table
from fortune_500_financial_insights_pipeline_spark.queries._core import q


@q("q_fmp4_frame_index_roundtrip")
def q_fmp4_frame_index_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL fragmented-MP4 indexing certified cross-engine — the
    DASH/CMAF shape web-crawl video actually ships (moof/traf/tfhd/tfdt/
    trun sample runs, empty movie-level stbl), which the classic
    stts/stco walk of q_mp4_frame_index_roundtrip cannot see. Per
    document (doc_id < 20) the SAME synthetic track as the classic key
    (n = 6 + doc_id mod 5 samples; sample i is (doc_id + i) mod 256
    repeated 10 + (doc_id·13 + i·7) mod 50 times; duration
    100 + 10·((doc_id + i) mod 4) at timescale 1000) is packed 3 samples
    per fragment by operators/mp4_index.mp4_build_fragmented, then
    indexed back through the one mp4_sample_index entry point — the
    fragment walk must recover byte-identical frames and tfdt+trun
    timestamps, certified by the same sum statistics plus the fragment
    count. The oracle replays the generating formulas; builder and
    parser meet only at the ISO/IEC 14496-12 byte format."""
    import pandas as pd

    ids = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 20)
        .select("doc_id")
        .distinct()
    )

    def stats(batches):
        from fortune_500_financial_insights_pipeline_spark.operators.mp4_index import (
            mp4_build_fragmented,
            mp4_extract_samples,
        )

        for pdf in batches:
            out = {"doc_id": [], "n_samples": [], "n_frags": [],
                   "sum_bytes": [], "sum_first_byte": [], "sum_ts_units": []}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 6 + d % 5
                samples = [
                    bytes([(d + i) % 256]) * (10 + (d * 13 + i * 7) % 50)
                    for i in range(n)
                ]
                durs = [100 + 10 * ((d + i) % 4) for i in range(n)]
                data = mp4_build_fragmented(
                    samples, durs, timescale=1000, samples_per_frag=3
                )
                ext = mp4_extract_samples(data, every_n=1)
                out["doc_id"].append(d)
                out["n_samples"].append(len(ext))
                out["n_frags"].append((n + 2) // 3)
                out["sum_bytes"].append(sum(len(fr) for _, _, fr in ext))
                out["sum_first_byte"].append(sum(fr[0] for _, _, fr in ext))
                out["sum_ts_units"].append(
                    sum(int(round(ts * 1000)) for _, ts, _ in ext)
                )
            yield pd.DataFrame(out)

    return ids.mapInPandas(
        stats,
        schema="doc_id long, n_samples long, n_frags long, sum_bytes long, "
        "sum_first_byte long, sum_ts_units long",
    )
