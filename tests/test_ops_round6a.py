"""Round-6 tests: MJPEG-in-MP4 end-to-end pixel decode through the
production sample_frames operator, the codec-nit fixes from the round-5
advisor (bmp_dimensions truncation discipline, GIF LZW 12-bit cap), and
the stdlib-shadow regression (qprofile rename)."""

from __future__ import annotations

import numpy as np
import pytest


def _const_block_jpegs(d: int, n: int) -> "tuple[list[bytes], list[int]]":
    from fortune_500_financial_insights_pipeline_spark.operators.jpeg_codec import (
        jpeg_encode_baseline,
    )

    w, h = 16 + 8 * (d % 2), 16
    samples, durs = [], []
    for f in range(n):
        img = np.zeros((h, w), np.uint8)
        for by in range(h // 8):
            for bx in range(w // 8):
                img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    d * 37 + f * 19 + by * 11 + bx * 5
                ) % 256
        samples.append(jpeg_encode_baseline(img))
        durs.append(100 + 10 * ((d + f) % 4))
    return samples, durs


def test_mjpeg_frames_decode_end_to_end(spark):
    """A real MP4 whose samples are baseline JPEGs decodes to exact pixels
    through sample_frames(fake=False): container timestamps from stts,
    strip luma equal to the generating block formula."""
    from fortune_500_financial_insights_pipeline_spark.operators.mp4_index import (
        mp4_build_minimal,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.multimodal import (
        sample_frames,
    )

    d, n = 3, 4
    samples, durs = _const_block_jpegs(d, n)
    media = mp4_build_minimal(samples, durs, timescale=1000, samples_per_chunk=2)
    df = spark.createDataFrame([(d, media)], "doc_id long, media binary")
    rows = sorted(
        sample_frames(df, fake=False).collect(), key=lambda r: r.frame_idx
    )
    assert [r.frame_idx for r in rows] == list(range(n))
    # container clock: cumulative stts durations / timescale
    expect_ts = [0.0]
    for dur in durs[:-1]:
        expect_ts.append(expect_ts[-1] + dur / 1000.0)
    assert [pytest.approx(t) for t in expect_ts] == [r.frame_ts for r in rows]
    w, h = 16 + 8 * (d % 2), 16
    for f, r in enumerate(rows):
        assert r.n_bytes == w * h  # grayscale pixels, exact dims
        assert len(r.feature) == 8
        for s, lum in enumerate(r.feature):
            x0 = s * w // 8
            x1 = max(x0 + 1, (s + 1) * w // 8)
            tot = 0
            for by in range(h // 8):
                for x in range(x0, x1):
                    tot += ((d * 37 + f * 19 + by * 11 + (x // 8) * 5) % 256) * 8
            assert lum == pytest.approx(tot / (h * (x1 - x0)) / 255.0)


def test_mjpeg_h264_samples_still_seamed(spark):
    """Non-JPEG MP4 samples (compressed video) still hit the documented
    codec-stack seam, not a silent wrong answer."""
    from fortune_500_financial_insights_pipeline_spark.operators.mp4_index import (
        mp4_build_minimal,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.multimodal import (
        sample_frames,
    )

    media = mp4_build_minimal([b"\x00\x00\x01\x65AAAA"], [100])
    df = spark.createDataFrame([(1, media)], "doc_id long, media binary")
    with pytest.raises(Exception, match="ffmpeg"):
        sample_frames(df, fake=False).collect()


def test_bmp_dimensions_truncation_is_valueerror():
    """Advisor r5: truncated BMP headers raise ValueError (the documented
    corrupt-payload discipline), never struct.error."""
    from fortune_500_financial_insights_pipeline_spark.operators.bmp_codec import (
        bmp_dimensions,
        bmp_encode,
    )

    with pytest.raises(ValueError):
        bmp_dimensions(b"BM123")
    with pytest.raises(ValueError):
        bmp_dimensions(b"XX" + b"\x00" * 40)
    full = bmp_encode(np.zeros((4, 6, 3), np.uint8))
    assert bmp_dimensions(full) == (6, 4)
    with pytest.raises(ValueError):
        bmp_dimensions(full[:20])


def test_gif_lzw_cap_never_assigns_13bit_code():
    """Advisor r5: the encoder CLEAR-resets at a full table instead of
    assigning the unemittable code 4096; a stream long enough to overflow
    the 4096-entry table still round-trips exactly."""
    from fortune_500_financial_insights_pipeline_spark.operators.gif_codec import (
        lzw_decode,
        lzw_encode,
    )

    rng = np.random.RandomState(7)
    # incompressible 8-bit stream: table fills fast, forcing the cap path
    idx = rng.randint(0, 256, size=30000).astype(np.uint8)
    enc = lzw_encode(idx, min_code_size=8)
    dec = lzw_decode(enc, min_code_size=8)
    assert np.array_equal(np.asarray(dec, np.uint8), idx)


def test_package_cwd_does_not_shadow_stdlib_profile():
    """r5 nit: running python with CWD inside the package must not shadow
    stdlib `profile` (pyspark imports cProfile -> profile)."""
    import pathlib
    import subprocess
    import sys

    pkg = (
        pathlib.Path(__file__).resolve().parents[1]
        / "fortune_500_financial_insights_pipeline_spark"
    )
    assert not (pkg / "profile.py").exists()
    r = subprocess.run(
        [sys.executable, "-c", "import profile, pstats; print('ok')"],
        cwd=str(pkg),
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert r.returncode == 0 and "ok" in r.stdout, r.stderr


def test_curation_stream_funnel_readout_is_survivor_invariant(spark):
    """q_curation_stream_funnel's aggregate must not depend on WHICH of
    two byte-identical dup copies survives dropDuplicates: flipping the
    planted-copy id ordering leaves every output value unchanged."""
    from pyspark.sql import functions as F

    from fortune_500_financial_insights_pipeline_spark.streaming.curation import (
        streaming_curate,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 6),
        (2, "a completely different document about suppliers and parts " * 5),
    ]
    base = spark.createDataFrame(rows, "doc_id long, text string")

    def readout(df):
        chunks = streaming_curate(df, min_quality=0.0, chunk_tokens=8, overlap=2)
        csum = F.conv(F.substring(F.md5("chunk_text"), 1, 8), 16, 10).cast("long")
        return chunks.agg(
            F.countDistinct("fingerprint").alias("n_docs"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.sum(csum).alias("chunk_checksum"),
        ).head()

    dup_hi = base.unionByName(
        base.select((F.col("doc_id") + 100).alias("doc_id"), "text")
    )
    dup_lo = base.select((F.col("doc_id") + 100).alias("doc_id"), "text").unionByName(
        base
    )
    a, b = readout(dup_hi), readout(dup_lo)
    assert a == b
    assert a.n_docs == 2  # dups collapsed


def test_extract_features_plan_is_shuffle_free(spark):
    """Runtime-metrics gate for the codec family (SCALE.md round 6): the
    decode pass must stay map-only — no Exchange anywhere in the plan —
    and decode a 200-image PNG fixture well under the generous floor
    (catches an accidental per-row UDF or shuffle regression)."""
    import time

    import numpy as np
    from pyspark.sql import functions as F

    from fortune_500_financial_insights_pipeline_spark.operators.media_codec import (
        png_encode,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.multimodal import (
        extract_features,
    )

    rows = []
    for i in range(200):
        y, x, c = np.ogrid[0:32, 0:48, 0:3]
        img = ((i * 31 + y * 17 + x * 7 + c * 3) % 256).astype(np.uint8)
        rows.append((i, png_encode(img)))
    df = spark.createDataFrame(rows, "doc_id long, media binary").select(
        "doc_id",
        "media",
        F.lit("image/png").alias("media_type"),
        F.octet_length("media").alias("n_bytes"),
    )
    feats = extract_features(df, fake=False)
    plan = feats._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    t0 = time.perf_counter()
    assert feats.count() == 200
    assert time.perf_counter() - t0 < 30  # ~0.5 s measured; floor is loose
