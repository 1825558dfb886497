"""STFT operator tests: the exact 8-point DFT against numpy's FFT, the
operator end-to-end through real WAV bytes, and Parseval's theorem as an
independent analytic check."""

from __future__ import annotations

import numpy as np
import pytest


def test_dft8_matches_numpy_rfft():
    from fortune_500_financial_insights_pipeline_spark.operators.dsp import dft8_frame

    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, size=(50, 8))
    re, im = dft8_frame(x)
    ref = np.fft.rfft(x, axis=1)
    assert np.allclose(re, ref.real, atol=1e-12)
    assert np.allclose(im, ref.imag, atol=1e-12)


def test_dft8_parseval():
    """Σ|X_k|² over all 8 bins (conjugate-symmetric doubling for k=1..3)
    equals 8·Σx² — an analytic identity no shared-bug replay can fake."""
    from fortune_500_financial_insights_pipeline_spark.operators.dsp import dft8_frame

    rng = np.random.default_rng(9)
    x = rng.uniform(-1, 1, size=(20, 8))
    re, im = dft8_frame(x)
    p = re * re + im * im
    total = p[:, 0] + 2 * p[:, 1:4].sum(axis=1) + p[:, 4]
    assert np.allclose(total, 8 * (x * x).sum(axis=1), atol=1e-10)


def test_stft_power_frames_end_to_end(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.dsp import (
        stft_power_frames,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.media_codec import (
        wav_encode_pcm16,
    )

    i = np.arange(16)
    # pure 2-cycle-per-8-sample cosine at amplitude 16384 -> energy in bin 2
    pcm = (16384 * np.cos(2 * np.pi * 2 * i / 8)).astype(np.int16)
    df = spark.createDataFrame(
        [(7, wav_encode_pcm16(pcm, 8000))], "doc_id long, media binary"
    )
    rows = stft_power_frames(df).collect()
    # 16 samples, frame 8 hop 4 -> 3 frames x 5 bins
    assert len(rows) == 15
    by = {(r.frame, r.bin): r.power for r in rows}
    for f in range(3):
        peak = by[(f, 2)]
        for k in [0, 1, 3, 4]:
            assert by[(f, k)] < peak * 1e-3
    assert stft_power_frames(df).schema.simpleString().count("double") == 3


def test_stft_rejects_non_exact_sizes(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.dsp import (
        stft_power_frames,
    )

    df = spark.createDataFrame([(1, b"RIFF")], "doc_id long, media binary")
    with pytest.raises(ValueError, match="n_fft=8"):
        stft_power_frames(df, n_fft=16)


def test_dft8_2d_matches_numpy_fft2():
    from fortune_500_financial_insights_pipeline_spark.operators.dsp import dft8_2d

    rng = np.random.default_rng(5)
    x = rng.uniform(-1, 1, size=(8, 8))
    re, im = dft8_2d(x)
    ref = np.fft.fft2(x)
    assert np.allclose(re, ref.real, atol=1e-12)
    assert np.allclose(im, ref.imag, atol=1e-12)


def test_image_spectral_hash_near_dup_semantics(spark):
    """A one-pixel perturbation of a spectrally-rich image keeps its
    hash (near-dup collision); an unrelated sign pattern does not."""
    from fortune_500_financial_insights_pipeline_spark.operators.dsp import (
        PHASH_LOW_BAND,
        image_spectral_hash,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.media_codec import (
        png_encode,
    )

    W = [2, 1, 0, -1, -2, -1, 0, 1]

    def build(d, perturb=False):
        sub = np.zeros((8, 8), np.int64)
        for i, (ky, kx) in enumerate(PHASH_LOW_BAND):
            s = 1 if ((d * 7919) >> i) & 1 else -1
            for y in range(8):
                for x in range(8):
                    sub[y, x] += s * W[(ky * y) % 8] * W[(kx * x) % 8]
        img = np.full((16, 16), 128, np.int64)
        img[::2, ::2] = 128 + sub
        if perturb:
            img[6, 6] += 1
        return png_encode(img.astype(np.uint8))

    rows = [
        (1, build(3)), (2, build(3, perturb=True)), (3, build(11)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    got = {r.doc_id: r.phash for r in image_spectral_hash(df).collect()}
    assert got[1] == got[2]        # near-dup collides
    assert got[1] != got[3]        # different signs -> different hash
    want = sum((1 << i) for i in range(15) if ((3 * 7919) >> i) & 1)
    assert got[1] == want          # hash recovers the planted sign pattern


def test_audio_spectral_hash_near_dup_semantics(spark):
    """One-quantization-level perturbation keeps the spectral hash (the
    near-dup collision), a different band structure changes it."""
    from fortune_500_financial_insights_pipeline_spark.operators.dsp import (
        audio_spectral_hash,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.media_codec import (
        wav_encode_pcm16,
    )

    tones = [
        [2, 1, 0, -1, -2, -1, 0, 1],
        [1, 0, -1, 0, 1, 0, -1, 0],
        [2, -1, 0, 1, -2, 1, 0, -1],
    ]

    def build(d, perturb=False):
        i = np.arange(32)
        pcm = np.zeros(32, np.int64)
        for b in range(3):
            amp = 1000 * (1 + ((d * 7919 // 4 ** b + i // 4) % 4))
            pcm += amp * np.asarray(tones[b])[i % 8]
        if perturb:
            pcm = pcm.copy()
            pcm[5] += 1
        return wav_encode_pcm16(pcm.astype(np.int16), 8000)

    rows = [(1, build(2)), (2, build(2, perturb=True)), (3, build(3))]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    got = {r.doc_id: r.ahash for r in audio_spectral_hash(df).collect()}
    assert got[1] == got[2]   # near-dup collides
    assert got[1] != got[3]   # different envelope structure differs
