"""Round-5 baseline-JPEG codec tests (operators/jpeg_codec — pure numpy,
ITU-T T.81). The encoder is the roundtrip partner (4:4:4, Annex-K
tables); 4:2:0 subsampling and restart markers — which the encoder does
NOT emit — are exercised via hand-crafted streams built directly from
the canonical Huffman construction, so those decoder paths are verified
against spec arithmetic, not against the encoder."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from fortune_500_financial_insights_pipeline_spark.operators.jpeg_codec import (
    _AC_LUM_BITS,
    _AC_LUM_VALS,
    _DC_LUM_BITS,
    _DC_LUM_VALS,
    _BitWriter,
    _canonical_codes,
    _magnitude,
    jpeg_decode,
    jpeg_encode_baseline,
)


def test_jpeg_gray_constant_and_gradient_exact():
    img = np.full((8, 8), 77, np.uint8)
    out = jpeg_decode(jpeg_encode_baseline(img))
    assert out.shape == (8, 8, 1)
    assert (out[:, :, 0] == 77).all()
    grad = (np.arange(16)[:, None] * 7 + np.arange(24)[None, :] * 3).astype(np.uint8)
    out = jpeg_decode(jpeg_encode_baseline(grad))
    assert np.array_equal(out[:, :, 0], grad)


def test_jpeg_rgb_roundtrip_within_color_rounding():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    out = jpeg_decode(jpeg_encode_baseline(img))
    assert out.shape == (16, 16, 3)
    # all-ones quant: the only loss is DCT rounding + YCbCr<->RGB rounding
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_jpeg_odd_dimensions_crop_back():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (10, 13), dtype=np.uint8)
    out = jpeg_decode(jpeg_encode_baseline(img))
    assert out.shape == (10, 13, 1)
    assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).max() <= 2


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _dc_only_block(bw, dc_codes, diff):
    t, bits = _magnitude(diff)
    code, ln = dc_codes[t]
    bw.write(code, ln)
    if t:
        bw.write(bits, t)
    # EOB ends the AC run
    ac_codes = _canonical_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    code, ln = ac_codes[0x00]
    bw.write(code, ln)


def _headers_420(h, w):
    quant = bytes([0x00]) + bytes([1] * 64)
    sof = struct.pack(">BHHB", 8, h, w, 3) + bytes(
        [1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]
    )  # Y 2x2, Cb 1x1, Cr 1x1
    dht_dc = bytes([0x00]) + bytes(_DC_LUM_BITS[1:]) + bytes(_DC_LUM_VALS)
    dht_ac = bytes([0x10]) + bytes(_AC_LUM_BITS[1:]) + bytes(_AC_LUM_VALS)
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    return (
        b"\xff\xd8"
        + _seg(0xDB, quant)
        + _seg(0xC0, sof)
        + _seg(0xC4, dht_dc)
        + _seg(0xC4, dht_ac)
        + _seg(0xDA, sos)
    )


def test_jpeg_420_subsampled_dc_only_stream():
    """Hand-crafted one-MCU 4:2:0 stream: four Y blocks with distinct DC
    values and neutral chroma. Expect each 8×8 quadrant of the 16×16
    output to be its block's constant gray value (chroma upsampled 2×2)."""
    dc_codes = _canonical_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    bw = _BitWriter()
    # Y DCs: values v*8 quantize to F00 = 8v -> pixel v+128; diffs chain
    vals = [-96, -32, 16, 64]  # -> gray 32, 96, 144, 192
    prev = 0
    for v in vals:
        _dc_only_block(bw, dc_codes, v * 8 - prev)
        prev = v * 8
    _dc_only_block(bw, dc_codes, 0)  # Cb = 0 (neutral)
    _dc_only_block(bw, dc_codes, 0)  # Cr = 0
    bw.flush()
    data = _headers_420(16, 16) + bytes(bw.out) + b"\xff\xd9"
    out = jpeg_decode(data)
    assert out.shape == (16, 16, 3)
    grays = {32: out[:8, :8], 96: out[:8, 8:], 144: out[8:, :8], 192: out[8:, 8:]}
    for g, quad in grays.items():
        assert (quad == g).all(), (g, np.unique(quad))


def test_jpeg_restart_markers_reset_dc_prediction():
    """DRI=1 grayscale, two MCUs, RST0 between them: the second block's DC
    diff is relative to a RESET predictor, so a decoder that fails to
    reset would produce the wrong constant."""
    quant = bytes([0x00]) + bytes([1] * 64)
    sof = struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0])
    dht_dc = bytes([0x00]) + bytes(_DC_LUM_BITS[1:]) + bytes(_DC_LUM_VALS)
    dht_ac = bytes([0x10]) + bytes(_AC_LUM_BITS[1:]) + bytes(_AC_LUM_VALS)
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    dc_codes = _canonical_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    bw1 = _BitWriter()
    _dc_only_block(bw1, dc_codes, 40 * 8)  # first block: gray 168
    bw1.flush()
    bw2 = _BitWriter()
    _dc_only_block(bw2, dc_codes, -60 * 8)  # after reset: gray 68 (not 168-60·8/8)
    bw2.flush()
    data = (
        b"\xff\xd8"
        + _seg(0xDB, quant)
        + _seg(0xC0, sof)
        + _seg(0xC4, dht_dc)
        + _seg(0xC4, dht_ac)
        + _seg(0xDD, struct.pack(">H", 1))
        + _seg(0xDA, sos)
        + bytes(bw1.out)
        + b"\xff\xd0"
        + bytes(bw2.out)
        + b"\xff\xd9"
    )
    out = jpeg_decode(data)
    assert out.shape == (8, 16, 1)
    assert (out[:, :8, 0] == 168).all()
    assert (out[:, 8:, 0] == 68).all()


def test_jpeg_rejects_progressive_and_garbage():
    with pytest.raises(ValueError):
        jpeg_decode(b"not a jpeg")
    # SOF2 (progressive) must be named unsupported, not mis-decoded
    data = b"\xff\xd8" + _seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    with pytest.raises(ValueError, match="baseline"):
        jpeg_decode(data + b"\xff\xd9")


def test_decode_image_jpeg_without_pil():
    from fortune_500_financial_insights_pipeline_spark.operators.multimodal import (
        decode_image,
    )

    img = np.full((8, 16), 100, np.uint8)
    w, h, feat = decode_image(jpeg_encode_baseline(img), fake=False)
    assert (w, h) == (16, 8)
    assert feat == [100 / 255.0] * 8
