"""GIF codec (operators/gif_codec): real variable-width LZW + container
walk, decodable with no media library.

The hand-built-stream tests construct GIF containers and LZW bit streams
FORWARD in the test with an independent bit-writer — the decoder is
checked against the spec's wire format, not against its own encoder."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from fortune_500_financial_insights_pipeline_spark.operators.gif_codec import (
    gif_decode,
    gif_dimensions,
    gif_encode,
    lzw_decode,
    lzw_encode,
)


def _pack_codes(codes_widths: list[tuple[int, int]]) -> bytes:
    """Independent LSB-first bit packer (forward direction, test-local)."""
    acc = nacc = 0
    out = bytearray()
    for code, width in codes_widths:
        acc |= code << nacc
        nacc += width
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


def test_lzw_decode_hand_built_stream():
    # min_code_size=2: CLEAR=4, EOI=5, roots 0..3, width starts at 3.
    # Stream: CLEAR, 0, 1, 2, 2, EOI -> pixels [0, 1, 2, 2]. After the
    # third pixel the table holds 8 entries (6=[0,1], 7=[1,2]), so the
    # remaining codes are read at width 4 per the spec.
    data = _pack_codes([(4, 3), (0, 3), (1, 3), (2, 3), (2, 4), (5, 4)])
    assert lzw_decode(data, 2) == [0, 1, 2, 2]


def test_lzw_decode_kwkwk_case():
    # CLEAR, 0, 6, EOI with min=2: code 6 == next free slot -> KwKwK,
    # emits prev + prev[0] = [0, 0]
    data = _pack_codes([(4, 3), (0, 3), (6, 3), (5, 3)])
    assert lzw_decode(data, 2) == [0, 0, 0]


def test_lzw_decode_width_growth():
    # fill the table to 2**3 entries, then the NEXT code must be read at
    # width 4 — alternate roots so every phrase is new: after k phrases
    # table size is 6 + k; width grows to 4 once size hits 8
    codes = [(4, 3), (0, 3), (1, 3), (2, 3)]  # table: 6,7 added -> size 8
    codes += [(3, 4), (5, 4)]  # next reads at width 4; EOI=5
    data = _pack_codes(codes)
    assert lzw_decode(data, 2) == [0, 1, 2, 3]


def test_lzw_roundtrip_properties():
    rnd = np.random.default_rng(11)
    for n, nsym in [(1, 1), (7, 2), (300, 4), (5000, 130), (60000, 256)]:
        seq = rnd.integers(0, nsym, size=n).tolist()
        mcs = max(2, int(np.ceil(np.log2(max(nsym, 2)))))
        assert lzw_decode(lzw_encode(seq, mcs), mcs) == seq


def test_gif_decode_hand_built_container_with_extension_and_local_palette():
    # GIF89a, 2x2 screen, NO global palette; a graphic-control extension
    # (must be skipped); image with a LOCAL 4-color palette
    pal = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])
    # width grows to 4 after the table reaches 8 entries (see above)
    lzw = _pack_codes([(4, 3), (0, 3), (1, 3), (2, 3), (3, 4), (5, 4)])
    data = (
        b"GIF89a"
        + struct.pack("<HHBBB", 2, 2, 0x00, 0, 0)
        + b"\x21\xf9" + bytes([4, 0, 0, 0, 0]) + b"\x00"  # GCE + terminator
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0x81)  # local, 4 colors
        + pal
        + bytes([2])  # min code size
        + bytes([len(lzw)]) + lzw + b"\x00"
        + b"\x3b"
    )
    img = gif_decode(data)
    assert img.shape == (2, 2, 3)
    assert img[0, 0].tolist() == [10, 20, 30]
    assert img[1, 1].tolist() == [100, 110, 120]
    assert gif_dimensions(data) == (2, 2)


def test_gif_roundtrip_palette_sizes():
    rnd = np.random.default_rng(5)
    for ncol in (1, 2, 3, 16, 200, 256):
        pal = rnd.integers(0, 256, size=(ncol, 3), dtype=np.uint8)
        idx = rnd.integers(0, ncol, size=(9, 13))
        img = pal[idx]
        dec = gif_decode(gif_encode(img))
        assert (dec == img).all(), ncol


def test_gif_encode_rejects_bad_inputs():
    with pytest.raises(ValueError, match="expects"):
        gif_encode(np.zeros((4, 4), np.uint8))
    rnd = np.random.default_rng(1)
    # >256 distinct colors
    img = rnd.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    while len(np.unique(img.reshape(-1, 3), axis=0)) <= 256:
        img = rnd.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="caps at 256"):
        gif_encode(img)


def test_gif_decode_rejects_non_gif():
    with pytest.raises(ValueError, match="not a GIF"):
        gif_decode(b"PNG such not")


def test_gif_interlace_roundtrip_and_permutation():
    from fortune_500_financial_insights_pipeline_spark.operators.gif_codec import (
        _interlace_rows,
    )

    # the spec's 4-pass row order for h=10
    assert _interlace_rows(10) == [0, 8, 4, 2, 6, 1, 3, 5, 7, 9]
    rnd = np.random.default_rng(12)
    for h, w in [(1, 3), (2, 5), (7, 4), (23, 9)]:
        pal = rnd.integers(0, 256, size=(16, 3), dtype=np.uint8)
        img = pal[rnd.integers(0, 16, size=(h, w))]
        assert (gif_decode(gif_encode(img, interlace=True)) == img).all()
    # flipping the interlace bit on sequential data de-permutes the rows:
    # decode(out[rows] = arr) is the inverse of the transmit permutation
    img = pal[rnd.integers(0, 16, size=(10, 4))]
    data = bytearray(gif_encode(img))
    idesc = data.index(0x2C, 13)
    data[idesc + 9] |= 0x40
    got = gif_decode(bytes(data))
    inv = np.empty((10, 4, 3), np.uint8)
    inv[_interlace_rows(10)] = img
    assert (got == inv).all()


def test_decode_image_seam_handles_gif_without_pil(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.multimodal import (
        decode_image,
    )

    img = np.zeros((6, 9, 3), np.uint8)
    img[:, :, 1] = (np.arange(9, dtype=np.uint8) * 7)[None, :]
    w, h, feat = decode_image(gif_encode(img))
    assert (w, h) == (9, 6)
    assert len(feat) == 8 and feat[0] < feat[-1]


def test_resize_seam_handles_gif_without_pil(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.media_codec import (
        png_decode,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.multimodal import (
        resize_images,
    )

    rnd = np.random.default_rng(9)
    pal = rnd.integers(0, 256, size=(8, 3), dtype=np.uint8)
    img = pal[rnd.integers(0, 8, size=(10, 14))]
    df = spark.createDataFrame(
        [(1, "gif", bytearray(gif_encode(img)))],
        "doc_id long, media_type string, media binary",
    )
    row = resize_images(df, target_w=7, target_h=5, fake=False).collect()[0]
    out = png_decode(bytes(row["resized"]))
    ys = (np.arange(5) * 10) // 5
    xs = (np.arange(7) * 14) // 7
    assert (out == img[ys][:, xs]).all()


def test_gif_animation_roundtrip_and_delays():
    from fortune_500_financial_insights_pipeline_spark.operators.gif_codec import (
        gif_decode_frames,
        gif_encode_animation,
    )

    rnd = np.random.default_rng(8)
    pal = rnd.integers(0, 256, size=(32, 3), dtype=np.uint8)
    frames = [pal[rnd.integers(0, 32, size=(12, 17))] for _ in range(5)]
    delays = [10, 20, 5, 5, 40]
    dec = gif_decode_frames(gif_encode_animation(frames, delays))
    assert len(dec) == 5
    for (dl, img), (want_dl, want) in zip(dec, zip(delays, frames)):
        assert dl == want_dl and (img == want).all()


def test_gif_animation_composition_transparency_offset_disposal():
    """Hand-built animation (LZW payloads from the real encoder — the
    wire-format hand-pack checks live above): frame 2 is a 1x2 patch at
    (0, 1) whose second pixel is TRANSPARENT, with disposal=2 (restore
    background); frame 3 is full-canvas. Checks real frame COMPOSITION —
    offsets, transparency holes, background restore — not just per-frame
    decode."""
    from fortune_500_financial_insights_pipeline_spark.operators.gif_codec import (
        _sub_blocks,
        gif_decode_frames,
        lzw_encode,
    )

    pal = bytes(
        [255, 0, 0,  0, 255, 0,  0, 0, 255,  9, 9, 9]  # idx 3 = transparent
    )
    f1 = _sub_blocks(lzw_encode([0, 0, 0, 0], 2))          # 2x2 all red
    patch = _sub_blocks(lzw_encode([1, 3], 2))             # green, transparent
    f3 = _sub_blocks(lzw_encode([2, 2, 2, 2], 2))          # 2x2 all blue
    data = (
        b"GIF89a"
        + struct.pack("<HHBBB", 2, 2, 0x81, 0, 0)  # global 4-color palette
        + pal
        + b"\x21\xf9" + bytes([4, 0x00, 10, 0, 0]) + b"\x00"
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
        + bytes([2]) + f1
        # patch at (0, 1), 2 wide x 1 high, transparent idx 3, disposal=2
        + b"\x21\xf9" + bytes([4, (2 << 2) | 0x01, 20, 0, 3]) + b"\x00"
        + b"\x2c" + struct.pack("<HHHHB", 0, 1, 2, 1, 0)
        + bytes([2]) + patch
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
        + bytes([2]) + f3
        + b"\x3b"
    )
    frames = gif_decode_frames(data)
    assert [d for d, _ in frames] == [10, 20, 0]
    assert (frames[0][1] == [255, 0, 0]).all()  # frame 1: all red
    # frame 2: green drawn at (1, 0); transparent pixel leaves (1, 1) red
    assert (frames[1][1][1, 0] == [0, 255, 0]).all()
    assert (frames[1][1][1, 1] == [255, 0, 0]).all()
    assert (frames[1][1][0] == [255, 0, 0]).all().all()
    # frame 3: full redraw after disposal=2 restored the patch region
    assert (frames[2][1] == [0, 0, 255]).all()


def test_sample_frames_real_gif_through_spark(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.gif_codec import (
        gif_encode_animation,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.multimodal import (
        sample_frames,
    )

    rnd = np.random.default_rng(4)
    pal = rnd.integers(0, 256, size=(8, 3), dtype=np.uint8)
    frames = [pal[rnd.integers(0, 8, size=(9, 16))] for _ in range(3)]
    media = gif_encode_animation(frames, [10, 25, 5])
    df = spark.createDataFrame(
        [(7, bytearray(media))], "doc_id long, media binary"
    )
    rows = sorted(
        sample_frames(df, fake=False).collect(), key=lambda r: r["frame_idx"]
    )
    assert [r["frame_idx"] for r in rows] == [0, 1, 2]
    assert [round(r["frame_ts"], 6) for r in rows] == [0.0, 0.1, 0.35]
    assert all(r["n_bytes"] == 9 * 16 * 3 for r in rows)
    assert all(len(r["feature"]) == 8 for r in rows)


def test_png_adam7_roundtrip_all_color_types():
    from fortune_500_financial_insights_pipeline_spark.operators.media_codec import (
        png_decode,
        png_encode,
    )

    rnd = np.random.default_rng(3)
    # edge shapes: passes with zero rows/cols must be skipped correctly
    for shape in [(1, 1, 3), (2, 3, 3), (7, 7, 1), (8, 8, 4), (13, 9, 3),
                  (29, 31, 3), (5, 1, 1), (1, 9, 3)]:
        img = rnd.integers(0, 256, size=shape, dtype=np.uint8)
        dec = png_decode(png_encode(img, interlace=True))
        assert dec.shape == img.shape and (dec == img).all(), shape


def test_png_adam7_filtered_subimages_forward_built():
    """Adam7 stream with NON-zero filters built forward in the test: each
    sub-image's rows use filter 2 (Up) — the decoder must unfilter each
    pass independently (prev resets per pass)."""
    import struct as _struct
    import zlib as _zlib

    from fortune_500_financial_insights_pipeline_spark.operators.media_codec import (
        _ADAM7,
        PNG_SIGNATURE,
        png_decode,
    )

    rnd = np.random.default_rng(6)
    h, w = 10, 11
    img = rnd.integers(0, 256, size=(h, w, 3), dtype=np.uint8)

    def chunk(ctype, payload):
        return (_struct.pack(">I", len(payload)) + ctype + payload
                + _struct.pack(">I", _zlib.crc32(ctype + payload) & 0xFFFFFFFF))

    parts = []
    for x0, y0, dx, dy in _ADAM7:
        sub = img[y0::dy, x0::dx].astype(np.int16)
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        prev = np.zeros(sub.shape[1] * 3, np.int16)
        for y in range(sub.shape[0]):
            line = sub[y].reshape(-1)
            filt = (line - prev) % 256  # forward filter 2 (Up)
            parts.append(b"\x02" + filt.astype(np.uint8).tobytes())
            prev = line
    ihdr = _struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
    data = (PNG_SIGNATURE + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", _zlib.compress(b"".join(parts)))
            + chunk(b"IEND", b""))
    assert (png_decode(data) == img).all()


def test_png_adam7_truncated_pass_rejected():
    from fortune_500_financial_insights_pipeline_spark.operators.media_codec import (
        png_decode,
        png_encode,
    )

    rnd = np.random.default_rng(7)
    img = rnd.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    data = bytearray(png_encode(img, interlace=True))
    # truncating the deflate payload corrupts either the stream or a pass
    i = bytes(data).index(b"IDAT")
    with pytest.raises(ValueError):
        png_decode(bytes(data[: i + 40]) )


def test_truncated_payloads_raise_valueerror_not_indexerror():
    """Corrupt/truncated containers must surface the ValueError
    discipline decode_image's callers rely on — never IndexError or
    struct.error escaping from mid-walk."""
    from fortune_500_financial_insights_pipeline_spark.operators.jpeg_codec import (
        jpeg_decode,
        jpeg_encode_baseline,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.jpeg_progressive import (
        jpeg_decode_progressive,
        jpeg_encode_progressive,
    )

    rnd = np.random.default_rng(2)
    img = rnd.integers(0, 256, size=(8, 12, 3), dtype=np.uint8)
    cases = [
        (gif_encode(img), gif_decode),
        (jpeg_encode_baseline(img), jpeg_decode),
        (jpeg_encode_progressive(img), jpeg_decode_progressive),
    ]
    for data, dec in cases:
        for cut in (5, 11, 31, len(data) // 2, len(data) - 2):
            try:
                dec(data[:cut])
            except ValueError:
                pass  # the contract
            # anything else (IndexError, struct.error) fails the test


def test_bmp_codec_paths():
    import struct as _struct

    from fortune_500_financial_insights_pipeline_spark.operators.bmp_codec import (
        bmp_decode,
        bmp_dimensions,
        bmp_encode,
    )

    rnd = np.random.default_rng(5)
    # 24-bit roundtrip across widths that exercise every padding case
    for h, w in [(1, 1), (3, 5), (7, 4), (13, 9), (11, 31)]:
        img = rnd.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        data = bmp_encode(img)
        assert (bmp_decode(data) == img).all()
        assert bmp_dimensions(data) == (w, h)
    # hand-built 8-bit paletted (BGRA palette -> RGB) single row
    pal = bytes(b for i in range(4) for b in (i * 10 + 2, i * 10 + 1, i * 10, 0))
    bmp8 = (
        b"BM" + _struct.pack("<IHHI", 0, 0, 0, 14 + 40 + 16)
        + _struct.pack("<IiiHHIIiiII", 40, 4, 1, 1, 8, 0, 4, 0, 0, 4, 0)
        + pal + bytes([0, 1, 2, 3])
    )
    dec = bmp_decode(bmp8)
    assert dec[0, 2].tolist() == [20, 21, 22]  # palette idx 2, RGB order
    # 32-bit top-down (negative height), BGRX -> RGB
    bmp32 = (
        b"BM" + _struct.pack("<IHHI", 0, 0, 0, 54)
        + _struct.pack("<IiiHHIIiiII", 40, 2, -1, 1, 32, 0, 8, 0, 0, 0, 0)
        + bytes([10, 20, 30, 0, 40, 50, 60, 0])
    )
    assert bmp_decode(bmp32)[0, 0].tolist() == [30, 20, 10]
    # rejections: RLE compression, truncation, wrong magic
    with pytest.raises(ValueError, match="BI_RGB"):
        bad = bytearray(bmp_encode(np.zeros((2, 2, 3), np.uint8)))
        bad[30] = 1
        bmp_decode(bytes(bad))
    with pytest.raises(ValueError):
        bmp_decode(bmp_encode(np.zeros((4, 4, 3), np.uint8))[:20])
    with pytest.raises(ValueError, match="not a BMP"):
        bmp_decode(b"PNG nope")


def test_bmp_through_decode_and_resize_seams(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.bmp_codec import (
        bmp_encode,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.media_codec import (
        png_decode,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.multimodal import (
        decode_image,
        resize_images,
    )

    rnd = np.random.default_rng(6)
    img = rnd.integers(0, 256, size=(10, 14, 3), dtype=np.uint8)
    w, h, feat = decode_image(bmp_encode(img))
    assert (w, h) == (14, 10) and len(feat) == 8
    df = spark.createDataFrame(
        [(1, "bmp", bytearray(bmp_encode(img)))],
        "doc_id long, media_type string, media binary",
    )
    row = resize_images(df, target_w=7, target_h=5, fake=False).collect()[0]
    out = png_decode(bytes(row["resized"]))
    ys = (np.arange(5) * 10) // 5
    xs = (np.arange(7) * 14) // 7
    assert (out == img[ys][:, xs]).all()
