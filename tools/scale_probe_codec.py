"""Round-6 scale probe: codec mapInPandas throughput + Bloom-cascade
state bound (r5 verdict item 6 — the curation/codec families were the
only majors without measured rows in SCALE.md).

Part A — per-format decode throughput through the PRODUCTION
extract_features path (binary in, Arrow batches, mapInPandas): build
N and 10N rows of genuine encoded payloads per format, time the decode
pass warm, report encoded MB/s and the 1×→10× wall ratio (linear = the
map-only plan scales out; there is no shuffle to grow).

Part B — streaming boilerplate Bloom cascade: run the real
foreachBatch stream over B batches and stat the state directory after
each fold — the bound is min_docs × m_bits/8 bytes regardless of how
many chunks have ever been ingested; the probe prints per-batch state
bytes so the constancy is a measurement, not a claim.

Usage: python tools/scale_probe_codec.py  (prints one JSON line per row)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _payloads(fmt: str, n: int) -> list[bytes]:
    from fortune_500_financial_insights_pipeline_spark.operators.bmp_codec import bmp_encode
    from fortune_500_financial_insights_pipeline_spark.operators.gif_codec import gif_encode
    from fortune_500_financial_insights_pipeline_spark.operators.jpeg_codec import (
        jpeg_encode_baseline,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.media_codec import png_encode

    out = []
    for i in range(n):
        h, w = 96 + i % 16, 128 + i % 16
        y, x, c = np.ogrid[0:h, 0:w, 0:3]
        img = ((i * 31 + y * 17 + x * 7 + c * 3) % 256).astype(np.uint8)
        if fmt == "png":
            out.append(png_encode(img))
        elif fmt == "gif":
            out.append(gif_encode((img // 64 * 64)))
        elif fmt == "bmp":
            out.append(bmp_encode(img))
        elif fmt == "jpeg":
            g = np.zeros((h // 8 * 8, w // 8 * 8), np.uint8)
            for by in range(g.shape[0] // 8):
                for bx in range(g.shape[1] // 8):
                    g[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                        i * 37 + by * 11 + bx * 5
                    ) % 256
            out.append(jpeg_encode_baseline(g))
    return out




def probe_codecs(spark, n_base: int = 2000) -> None:
    from pyspark.sql import functions as F

    from fortune_500_financial_insights_pipeline_spark.operators.multimodal import (
        extract_features,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    for fmt in ["png", "jpeg", "gif", "bmp"]:
        base = _payloads(fmt, 200)
        times = {}
        mb = {}
        for mult, label in [(1, "1x"), (10, "10x")]:
            rows = [
                (i, base[i % len(base)]) for i in range(n_base * mult // 10)
            ]
            df = (
                spark.createDataFrame(rows, "doc_id long, media binary")
                .repartition(cpus)
                .select(
                    "doc_id",
                    "media",
                    F.lit(f"image/{fmt}").alias("media_type"),
                    F.octet_length("media").alias("n_bytes"),
                )
                .localCheckpoint()  # stage payloads: time DECODE, not createDataFrame
            )
            feats = extract_features(df, fake=False)
            feats.count()  # warm (worker import + JIT)
            t0 = time.perf_counter()
            feats.count()
            times[label] = time.perf_counter() - t0
            mb[label] = sum(len(r[1]) for r in rows) / 1e6
        print(json.dumps({
            "probe": "codec_throughput", "format": fmt, "cpus": cpus,
            "rows_1x": n_base // 10, "encoded_mb_1x": round(mb["1x"], 1),
            "wall_1x_s": round(times["1x"], 2),
            "wall_10x_s": round(times["10x"], 2),
            "ratio": round(times["10x"] / times["1x"], 2),
            "mb_per_s_10x": round(mb["10x"] / times["10x"], 1),
            "kb_per_s_per_core_10x": round(mb["10x"] / times["10x"] / cpus * 1000, 1),
        }))


def probe_bloom_cascade(spark, n_batches: int = 4) -> None:
    from fortune_500_financial_insights_pipeline_spark.streaming.boilerplate import (
        boilerplate_stream,
    )

    tmp = tempfile.mkdtemp(prefix="bloomscale_")
    src, state, ckpt = (os.path.join(tmp, d) for d in ["src", "state", "ckpt"])
    os.makedirs(src)
    m_bits, min_docs = 1 << 20, 2
    emitted = []
    words = ["alpha", "beta", "gamma", "delta", "footer", "terms", "apply", "now"]
    for b in range(n_batches):
        rows = []
        for d in range(200):
            body = " ".join(words[(b * 7 + d + j) % 8] for j in range(40))
            rows.append((b * 1000 + d, body + " footer terms apply now " * 3))
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1).parquet(src))
    sizes = []

    def emit(df, bid):
        emitted.append(df.count())
        total = 0
        for root, _dirs, files in os.walk(state):
            total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        sizes.append(total)

    q = boilerplate_stream(
        stream, "doc_id", "text", state, emit, min_docs=min_docs, m_bits=m_bits
    ).option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    q.stop()
    print(json.dumps({
        "probe": "bloom_cascade_state", "m_bits": m_bits, "min_docs": min_docs,
        "bound_bytes": min_docs * m_bits // 8,
        "state_bytes_per_batch": sizes,
        "docs_emitted_per_batch": emitted,
    }))
    shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    from fortune_500_financial_insights_pipeline_spark.session import get_spark

    spark = get_spark(app_name="scale-probe-r6")
    spark.createDataFrame([(1,)], "x long").mapInPandas(
        lambda it: it, schema="x long"
    ).collect()
    probe_codecs(spark)
    probe_bloom_cascade(spark)
    spark.stop()


if __name__ == "__main__":
    main()
