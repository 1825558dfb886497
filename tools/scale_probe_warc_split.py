"""Scale probe: offset-split WARC ingestion on a SKEWED archive mix —
one big archive (most of the bytes) + many small ones, the shape that
stragglers/OOMs the whole-content reader (one row per archive). The
split reader indexes gzip-member spans, buckets them to
target_split_bytes ranges, and fans the big archive across tasks.

Prints one JSON line per mix: whole-file reader wall vs split reader
wall, the big archive's bucket count (its fan-out), and the max bytes
any single task materializes (member-bounded for split, archive-bounded
for whole).

Usage: python tools/scale_probe_warc_split.py [--big 400,4000] [--small 20]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--big", type=str, default="400,4000")
    ap.add_argument("--small", type=int, default=20)
    ap.add_argument("--body-bytes", type=int, default=20000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from fortune_500_financial_insights_pipeline_spark.operators.warc import (
        http_response_payload,
        warc_build,
        warc_build_record,
        warc_member_index,
        warc_records,
        warc_records_split,
    )
    from fortune_500_financial_insights_pipeline_spark.session import get_spark

    spark = get_spark(app_name="scale-probe-warc-split")

    def write_mix(root: str, big_members: int) -> str:
        src = os.path.join(root, f"mix{big_members}")
        os.makedirs(src, exist_ok=True)
        # incompressible bodies so member sizes reflect real page entropy
        rnd = __import__("random").Random(42)
        body = (
            b"<html><body>"
            + bytes(rnd.randrange(32, 127) for _ in range(args.body_bytes))
            + b"</body></html>"
        )

        def archive(n: int, tag: str) -> bytes:
            recs = [
                warc_build_record(
                    "response",
                    http_response_payload(body),
                    target_uri=f"http://{tag}.com/p/{i}",
                )
                for i in range(n)
            ]
            return warc_build(recs, gzip_members=True)

        with open(os.path.join(src, "big.warc.gz"), "wb") as fh:
            fh.write(archive(big_members, "big"))
        for a in range(args.small):
            with open(os.path.join(src, f"small{a}.warc.gz"), "wb") as fh:
                fh.write(archive(3, f"small{a}"))
        return src

    root = tempfile.mkdtemp(prefix="warc_split_probe_")
    try:
        for big_members in [int(x) for x in args.big.split(",")]:
            src = write_mix(root, big_members)
            target = 1 << 20  # 1 MiB range units

            t0 = time.time()
            whole = warc_records(
                spark.read.format("binaryFile").load(src).select(
                    F.abs(F.xxhash64("path")).alias("doc_id"),
                    F.col("content").alias("warc"),
                )
            )
            n_whole = whole.count()
            whole_s = time.time() - t0

            t0 = time.time()
            n_split = warc_records_split(
                spark, src, target_split_bytes=target
            ).count()
            split_s = time.time() - t0

            files = spark.read.format("binaryFile").load(src).select("path")
            idx = warc_member_index(files)
            stats = (
                idx.groupBy("path")
                .agg(
                    F.max("end").alias("bytes"),
                    F.count("*").alias("members"),
                    F.countDistinct(
                        F.floor(F.col("start") / F.lit(target))
                    ).alias("buckets"),
                    F.max(F.col("end") - F.col("start")).alias("max_member"),
                )
                .orderBy(F.desc("bytes"))
                .collect()
            )
            big_row = stats[0]
            print(json.dumps({
                "big_members": big_members,
                "small_archives": args.small,
                "records": n_split,
                "records_whole": n_whole,
                "parity": n_split == n_whole,
                "big_archive_bytes": int(big_row["bytes"]),
                "big_archive_buckets": int(big_row["buckets"]),
                "max_task_bytes_split": int(
                    min(target + int(big_row["max_member"]), int(big_row["bytes"]))
                ),
                "max_task_bytes_whole": int(big_row["bytes"]),
                "whole_s": round(whole_s, 2),
                "split_s": round(split_s, 2),
            }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
