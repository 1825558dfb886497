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
