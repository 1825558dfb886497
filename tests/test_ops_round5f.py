"""Progressive JPEG (operators/jpeg_progressive): successive-approximation
and spectral-selection entropy coding, adversarially tested at the raw
coefficient layer (full control over run/history interleavings the DCT
would obscure) and at the image layer against the baseline decoder."""

from __future__ import annotations

import numpy as np
import pytest

from fortune_500_financial_insights_pipeline_spark.operators.jpeg_codec import (
    _ZIGZAG,
    _BitReader,
    _BitWriter,
    _HuffDecoder,
    jpeg_decode,
    jpeg_encode_baseline,
)
from fortune_500_financial_insights_pipeline_spark.operators.jpeg_progressive import (
    _PROG_AC_BITS,
    _PROG_AC_VALS,
    _RefineWriter,
    _ac_first,
    _ac_refine,
    _canonical_codes,
    _encode_ac_first,
    _encode_ac_refine,
    jpeg_decode_progressive,
    jpeg_encode_progressive,
)

_AC_DEC = _HuffDecoder(_PROG_AC_BITS, _PROG_AC_VALS)
_AC_CODES = _canonical_codes(_PROG_AC_BITS, _PROG_AC_VALS)


def _roundtrip_band(blocks: list[np.ndarray], ss: int, se: int, levels: int):
    """Encode the band of every block through first + refinement scans at
    successive approximation depth ``levels``, decode, return blocks."""
    streams = []
    for al in range(levels, -1, -1):
        bw = _BitWriter()
        wr = _RefineWriter(bw, _AC_CODES)
        for zz in blocks:
            if al == levels:
                _encode_ac_first(wr, zz, ss, se, al)
            else:
                _encode_ac_refine(wr, zz, ss, se, al)
        wr.flush_eob()
        bw.flush()
        streams.append((al, bytes(bw.out)))
    out = [np.zeros(64, np.int64) for _ in blocks]
    first = True
    for al, payload in streams:
        reader = _BitReader(payload + b"\xff\xd9", 0)
        eobrun = 0
        for blk in out:
            if first:
                eobrun = _ac_first(blk, reader, _AC_DEC, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine(blk, reader, _AC_DEC, ss, se, al, eobrun)
        first = False
    return out


def _zz_block(pairs: dict[int, int]) -> np.ndarray:
    """Block with coefficient v at ZIG-ZAG position k for each (k, v)."""
    b = np.zeros(64, np.int64)
    for k, v in pairs.items():
        b[_ZIGZAG[k]] = v
    return b


def test_refinement_zrl_history_interleave():
    """The classic ordering trap: a history coefficient (|v| > 1 at the
    current precision) sitting BETWEEN the 16th zero-history slot of a
    ZRL span and the next newly-nonzero coefficient — its correction bit
    must ride the NEXT symbol's walk, not the ZRL's flush."""
    blocks = [
        _zz_block({6: 5, 24: -7, 27: 1}),   # h1 early, h2 late, new at 27
        _zz_block({1: 40, 2: -3, 40: 2, 60: -1}),
        _zz_block({63: 1}),                 # newly-nonzero at the band edge
    ]
    got = _roundtrip_band([b.copy() for b in blocks], 1, 63, 2)
    for g, want in zip(got, blocks):
        assert (g == want).all()


def test_refinement_eobrun_across_blocks_with_history_bits():
    """EOBRUN folding blocks that still owe history correction bits: the
    BE buffer must replay them in block order on the decode side."""
    blocks = (
        [_zz_block({3: 9})]
        + [_zz_block({5: 4, 30: -6})] * 5    # no newly-nonzero at al<2
        + [_zz_block({1: 1})]
        + [_zz_block({})] * 40               # long pure-EOB tail
    )
    got = _roundtrip_band([b.copy() for b in blocks], 1, 63, 2)
    for g, want in zip(got, blocks):
        assert (g == want).all()


def test_first_pass_run_longer_than_16():
    blocks = [_zz_block({1: 2, 20: -1, 55: 3}), _zz_block({35: 1})]
    got = _roundtrip_band([b.copy() for b in blocks], 1, 63, 0)
    for g, want in zip(got, blocks):
        assert (g == want).all()


def test_random_coefficient_blocks_property():
    rnd = np.random.default_rng(17)
    blocks = []
    for _ in range(120):
        b = np.zeros(64, np.int64)
        n = int(rnd.integers(0, 8))
        ks = rnd.choice(np.arange(1, 64), size=n, replace=False)
        for k in ks:
            b[_ZIGZAG[k]] = int(rnd.integers(-31, 32)) or 1
        blocks.append(b)
    got = _roundtrip_band([b.copy() for b in blocks], 1, 63, 3)
    for i, (g, want) in enumerate(zip(got, blocks)):
        assert (g == want).all(), i


def test_spectral_band_split_roundtrip():
    rnd = np.random.default_rng(23)
    blocks = []
    for _ in range(30):
        b = np.zeros(64, np.int64)
        for k in rnd.choice(np.arange(1, 64), size=5, replace=False):
            b[_ZIGZAG[k]] = int(rnd.integers(-15, 16)) or -1
        blocks.append(b)
    # run bands (1, 5) and (6, 63) independently, like the scan script
    got = [np.zeros(64, np.int64) for _ in blocks]
    for ss, se in ((1, 5), (6, 63)):
        part = _roundtrip_band([b.copy() for b in blocks], ss, se, 1)
        for g, p in zip(got, part):
            zis = [_ZIGZAG[k] for k in range(ss, se + 1)]
            g[zis] = p[zis]
    for g, want in zip(got, blocks):
        assert (g == want).all()


def test_progressive_equals_baseline_on_random_images():
    rnd = np.random.default_rng(5)
    for shape in [(24, 17), (8, 8), (19, 21, 3), (33, 40, 3)]:
        img = rnd.integers(0, 256, size=shape, dtype=np.uint8)
        base = jpeg_decode(jpeg_encode_baseline(img))
        prog = jpeg_decode_progressive(jpeg_encode_progressive(img))
        assert (prog == base).all(), shape


def test_progressive_deeper_successive_approximation():
    rnd = np.random.default_rng(9)
    img = rnd.integers(0, 256, size=(32, 32), dtype=np.uint8)
    base = jpeg_decode(jpeg_encode_baseline(img))
    for al in (1, 2, 3):
        prog = jpeg_decode_progressive(jpeg_encode_progressive(img, al=al))
        assert (prog == base).all(), al


def test_progressive_quantized_parity_and_sparse_eobrun():
    rnd = np.random.default_rng(3)
    img = rnd.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    q = np.arange(1, 65, dtype=np.int64).reshape(8, 8)
    a = jpeg_decode(jpeg_encode_baseline(img, quant=q))
    b = jpeg_decode(jpeg_encode_progressive(img, quant=q))
    assert (a == b).all()
    flat = np.full((48, 48), 128, np.uint8)
    flat[20, 20], flat[40, 7] = 255, 0
    a = jpeg_decode(jpeg_encode_baseline(flat))
    b = jpeg_decode(jpeg_encode_progressive(flat))
    assert (a == b).all()


def test_sof2_dispatch_and_decode_seam():
    from fortune_500_financial_insights_pipeline_spark.operators.multimodal import (
        decode_image,
    )

    rnd = np.random.default_rng(2)
    img = rnd.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    data = jpeg_encode_progressive(img)
    assert data[:2] == b"\xff\xd8" and b"\xff\xc2" in data[:200]
    out = jpeg_decode(data)  # baseline entry point dispatches SOF2
    assert out.shape == (16, 16, 3)
    w, h, feat = decode_image(data)
    assert (w, h) == (16, 16) and len(feat) == 8


def test_progressive_rejects_bad_streams():
    with pytest.raises(ValueError, match="missing SOI"):
        jpeg_decode_progressive(b"nope")
    rnd = np.random.default_rng(4)
    img = rnd.integers(0, 256, size=(8, 8), dtype=np.uint8)
    data = bytearray(jpeg_encode_progressive(img))
    data[data.index(b"\xff\xc2"[0], 2, None)] = 0xFF  # keep marker, then:
    i = bytes(data).index(b"\xff\xc2")
    data[i + 1] = 0xC3  # lossless SOF: must be rejected by both decoders
    with pytest.raises(ValueError):
        jpeg_decode(bytes(data))
