"""Scale probe: WARC ingestion (operators/warc.warc_records + HTML
main-text extraction) at 1x / 10x / 100x archive counts. Map-only,
zero shuffle — the codec-family shape — so wall should scale with idle
cores absorbing the work at fixture scale and linearly with bytes past
saturation. Prints one JSON line per corpus size.

Usage: python tools/scale_probe_warc.py [--caps 40,400,4000]
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
    from fortune_500_financial_insights_pipeline_spark.operators.html import (
        html_main_text,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.warc import (
        warc_records,
    )
    from fortune_500_financial_insights_pipeline_spark.session import get_spark

    spark = get_spark(app_name="scale-probe-warc")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def build(batches):
        import pandas as pd

        from fortune_500_financial_insights_pipeline_spark.operators.warc import (
            http_response_payload,
            warc_build,
            warc_build_record,
        )
        from fortune_500_financial_insights_pipeline_spark.queries._extensions_g import (
            _synth_page,
        )

        for pdf in batches:
            out = {"doc_id": [], "warc": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                page = _synth_page(d, text).encode()
                recs = [
                    warc_build_record("warcinfo", b"software: probe\r\n"),
                    warc_build_record(
                        "response", http_response_payload(page),
                        target_uri=f"http://example{d % 7}.com/p/{d}",
                    ),
                ]
                out["doc_id"].append(d)
                out["warc"].append(warc_build(recs, gzip_members=True))
            yield pd.DataFrame(out)

    for i, cap in enumerate(caps):
        label = f"{10 ** i}x" if caps == [40, 400, 4000] else f"cap{cap}"
        docs = (
            load_table(spark, sf, "documents")
            .where(F.col("doc_id") < cap)
            .select("doc_id", "text")
        )
        archives = docs.mapInPandas(
            build, schema="doc_id long, warc binary"
        ).localCheckpoint()  # pre-materialize: probe times the PARSE side
        recs = warc_records(archives)
        resp = recs.where(F.col("warc_type") == "response").select(
            "doc_id", F.decode("body", "UTF-8").alias("html")
        )
        n = html_main_text(resp).count()  # warm
        t0 = time.perf_counter()
        n = html_main_text(resp).count()
        wall = time.perf_counter() - t0
        print(json.dumps({
            "probe": "warc_ingest", "corpus": label, "cap": cap,
            "n_docs": n, "wall_s": round(wall, 2),
        }))
    spark.stop()


if __name__ == "__main__":
    main()
