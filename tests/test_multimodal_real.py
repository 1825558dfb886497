"""Conditional real-decoder tests: run IF PIL is importable, skip otherwise.

The decode seam in operators/multimodal.py (decode_image / resize_images
with fake=False) activates real PIL decoding the moment the environment
grows the library — these tests prove that path end-to-end through the
same mapInPandas plumbing the fake path uses, with zero code change needed
on upgrade. In the current container they skip (no PIL)."""

from __future__ import annotations

import pytest

PIL = pytest.importorskip("PIL")  # noqa: N816

from PIL import Image  # noqa: E402

from fortune_500_financial_insights_pipeline_spark.operators.multimodal import (  # noqa: E402
    decode_image,
    extract_features,
    resize_images,
)


def _png_bytes(w: int, h: int, color: int) -> bytes:
    import io

    img = Image.new("L", (w, h), color=color)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def test_decode_image_real_path():
    w, h, feature = decode_image(_png_bytes(32, 8, 128), fake=False)
    assert (w, h) == (32, 8)
    assert len(feature) == 8
    # constant-color image -> every strip mean equals color/255
    assert all(abs(f - 128 / 255.0) < 1e-9 for f in feature)


def test_extract_features_real_through_spark(spark):
    rows = [
        (1, "image/png", _png_bytes(16, 16, 0)),
        (2, "image/png", _png_bytes(24, 12, 255)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media_type string, media binary")
    df = df.selectExpr("doc_id", "media", "media_type", "octet_length(media) as n_bytes")
    got = {
        r.doc_id: r
        for r in extract_features(df, fake=False).collect()
    }
    assert (got[1].width, got[1].height) == (16, 16)
    assert (got[2].width, got[2].height) == (24, 12)
    assert all(abs(f - 1.0) < 1e-9 for f in got[2].feature)


def test_resize_images_real_through_spark(spark):
    rows = [(7, "image/png", _png_bytes(40, 20, 64))]
    df = spark.createDataFrame(rows, "doc_id long, media_type string, media binary")
    out = resize_images(df, target_w=8, target_h=4, fake=False).head()
    assert (out.target_w, out.target_h) == (8, 4)
    import io

    resized = Image.open(io.BytesIO(out.resized))
    assert resized.size == (8, 4)
