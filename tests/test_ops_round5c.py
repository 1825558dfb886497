"""Round-5 real-decode tests: PNG pixels and WAV-PCM samples decode with
NO media library (operators/media_codec — stdlib zlib/struct + numpy),
so these run unconditionally in this container, unlike the PIL/ffmpeg
conditional skips in test_multimodal_real.py.

The PNG filter test builds filtered scanlines in the FORWARD direction
(original → filtered, implemented here in the test) and asserts the
decoder inverts them — a genuine inverse-transform check, not a shared
code path."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from fortune_500_financial_insights_pipeline_spark.operators.media_codec import (
    PNG_SIGNATURE,
    png_decode,
    png_encode,
    png_luma,
    resize_nearest,
    wav_decode,
    wav_encode,
)


def _rand_img(rnd, h, w, ch):
    return rnd.integers(0, 256, size=(h, w, ch), dtype=np.uint8) if ch else (
        rnd.integers(0, 256, size=(h, w), dtype=np.uint8)
    )


def test_png_roundtrip_gray_rgb_rgba():
    rnd = np.random.default_rng(7)
    for ch in (1, 3, 4):
        img = _rand_img(rnd, 13, 9, ch)
        out = png_decode(png_encode(img))
        assert out.shape == (13, 9, ch)
        assert np.array_equal(out, img)


def test_png_decoder_inverts_all_five_filters():
    """Forward-filter each row with filter type y%5 (None/Sub/Up/Average/
    Paeth), build the PNG by hand, and require exact reconstruction."""
    rnd = np.random.default_rng(11)
    img = rnd.integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
    h, w, ch = img.shape
    bpp = ch
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int64)
    rows = bytearray()
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        cur = flat[y]
        f = y % 5
        filt = np.empty(stride, np.int64)
        for x in range(stride):
            a = cur[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt[x] = (cur[x] - pred) & 0xFF
        rows.append(f)
        rows.extend(int(v) for v in filt)
        prev = cur

    def chunk(ctype, payload):
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    data = (
        PNG_SIGNATURE
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(rows)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(png_decode(data), img)


def test_png_palette_expands_to_rgb():
    palette = np.array([[250, 0, 10], [0, 255, 33], [7, 8, 9]], dtype=np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)

    def chunk(ctype, payload):
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    rows = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    data = (
        PNG_SIGNATURE
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", palette.tobytes())
        + chunk(b"IDAT", zlib.compress(rows))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(png_decode(data), palette[idx])


def test_png_decode_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError):
        png_decode(b"not a png at all")
    img = png_encode(np.zeros((2, 2), np.uint8))
    with pytest.raises(ValueError):
        png_decode(img[:20])  # truncated after IHDR: no pixels


def test_wav_roundtrip_stereo_sine():
    t = np.arange(800) / 8000.0
    left = np.sin(2 * np.pi * 440 * t)
    right = 0.25 * np.sin(2 * np.pi * 220 * t)
    samples = np.stack([left, right], axis=1)
    rate, n_ch, out = wav_decode(wav_encode(samples, 8000))
    assert (rate, n_ch) == (8000, 2)
    assert out.shape == (800, 2)
    # encode quantizes round(x*32767), decode divides by 32768: worst-case
    # |out - x| = |round(x*32767) - x*32768|/32768 <= (0.5 + |x|)/32768
    assert np.abs(out - samples).max() <= 1.5 / 32768


def test_wav_8bit_pcm_decodes():
    raw = bytes(range(0, 256))
    body = struct.pack("<HHIIHH", 1, 1, 4000, 4000, 1, 8)
    data = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(body) + 8 + len(raw))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(body))
        + body
        + b"data"
        + struct.pack("<I", len(raw))
        + raw
    )
    rate, n_ch, out = wav_decode(data)
    assert (rate, n_ch) == (4000, 1)
    assert out[0, 0] == (0 - 128) / 128.0
    assert out[255, 0] == (255 - 128) / 128.0


def test_decode_image_real_png_without_pil():
    """decode_image(fake=False) must return REAL dimensions and the pinned
    integer-luma strip means in this PIL-less container."""
    from fortune_500_financial_insights_pipeline_spark.operators.multimodal import (
        decode_image,
    )

    img = np.zeros((4, 16, 3), np.uint8)
    img[:, :, 0] = 200  # pure red: luma = 299*200//1000 = 59
    w, h, feat = decode_image(png_encode(img), fake=False)
    assert (w, h) == (16, 4)
    assert feat == [59 / 255.0] * 8


def test_decode_image_unknown_format_raises_without_pil():
    """Formats outside the pure codecs (PNG/JPEG/GIF/BMP) still raise
    NotImplementedError without PIL; corrupt bytes of a SUPPORTED format
    raise ValueError from the real decoder instead (it genuinely
    tried)."""
    from fortune_500_financial_insights_pipeline_spark.operators.multimodal import (
        decode_image,
    )

    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present: every format decodes for real")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_image(b"II*\x00 tiff is not among the pure codecs", fake=False)
    # GIF and BMP are real codecs now: corrupt bytes fail INSIDE them
    with pytest.raises(ValueError):
        decode_image(b"GIF89a corrupt container follows", fake=False)
    with pytest.raises(ValueError):
        decode_image(b"BM corrupt header follows here", fake=False)
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0 corrupt jpeg bytes", fake=False)


def test_extract_audio_features_real_wav_in_spark(spark):
    """End-to-end mapInPandas over real WAV payloads: a constant-amplitude
    square wave has exactly computable rms/zcr/envelope."""
    from fortune_500_financial_insights_pipeline_spark.operators.multimodal import (
        extract_audio_features,
    )

    t = np.arange(400)
    square = np.where(t % 2 == 0, 0.5, -0.5)[:, None]
    payload = wav_encode(square, 8000)
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, media binary")
    row = extract_audio_features(df, fake=False).collect()[0]
    assert row.sample_rate == 8000 and row.n_channels == 1
    assert row.n_frames == 400
    assert abs(row.duration_s - 0.05) < 1e-9
    q = round(0.5 * 32767) / 32768.0  # one 16-bit quantization step
    assert abs(row.rms - q) < 1e-9
    assert abs(row.zero_cross_rate - 1.0) < 1e-9  # alternates every frame
    assert all(abs(e - q) < 1e-9 for e in row.energy_envelope)


def test_resize_images_real_png_without_pil(spark):
    """resize_images(fake=False) on PNG payloads: decodable output of the
    target geometry with exact nearest-neighbor values."""
    from fortune_500_financial_insights_pipeline_spark.operators.multimodal import (
        resize_images,
    )

    img = np.zeros((8, 8, 3), np.uint8)
    img[4:, :, :] = 255  # top half black, bottom half white
    df = spark.createDataFrame(
        [(5, "image/png", bytearray(png_encode(img)))],
        "doc_id long, media_type string, media binary",
    )
    row = resize_images(df, target_w=4, target_h=4, fake=False).collect()[0]
    out = png_decode(bytes(row.resized))
    assert out.shape == (4, 4, 3)
    assert np.array_equal(out, np.array(resize_nearest(img, 4, 4)))
    assert (out[:2] == 0).all() and (out[2:] == 255).all()


def test_resize_nearest_and_luma_shapes():
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    up = resize_nearest(img, 6, 4)
    assert up.shape == (4, 6, 3)
    assert np.array_equal(up[0, 0], img[0, 0]) and np.array_equal(up[-1, -1], img[-1, -1])
    lum = png_luma(img)
    assert lum.shape == (2, 3)
    r, g, b = (int(img[1, 2, i]) for i in range(3))
    assert lum[1, 2] == (299 * r + 587 * g + 114 * b) // 1000
