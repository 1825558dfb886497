"""Real audio DSP on binary WAV columns: short-time Fourier transform
spectrograms, engine-exact.

An 8-point DFT's twiddle factors are closed-form — cos/sin of multiples
of π/4 are drawn from {0, ±1, ±√½} and IEEE sqrt is correctly rounded on
every engine — so with a FIXED left-associative accumulation order the
whole STFT is a deterministic double-precision computation an external
SQL engine can replay bit-for-bit. That turns the canonical audio
feature (power spectrogram frames) into an oracle-certifiable operator
instead of a trust-me numeric blob: the coefficient table is built from
exact constants (never libm cos, whose last ulp may differ across
engines), and the per-bin accumulation adds the 8 sample·twiddle
products strictly in n order, matching the SQL mirror's parenthesized
chain.

Shape: binary WAV in → real PCM decode (operators/media_codec, the same
codec the roundtrip keys certify) → rectangular-window frames of
``n_fft`` samples every ``hop`` → per-frame power per real bin
(0..n_fft/2) — one mapInPandas pass, Arrow-batched, partition-
preserving, no shuffle. At 100 TB this is the audio twin of the image
decode stage: map-only, scales out with the scan.

Reference scope: /root/reference has no audio at all — LLM-training-data
extension surface (speech-corpus featurization before any model step).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

STFT_SCHEMA = (
    "doc_id long, frame int, bin int, re double, im double, power double"
)

_R = math.sqrt(0.5)
# cos/sin of 2π·j/8 for j = 0..7 — exact table, not libm cos/sin
_COS8 = [1.0, _R, 0.0, -_R, -1.0, -_R, 0.0, _R]
_SIN8 = [0.0, _R, 1.0, _R, 0.0, -_R, -1.0, -_R]


def dft8_frame(x: "np.ndarray") -> "tuple[np.ndarray, np.ndarray]":
    """(re, im) of the 8-point DFT real bins k = 0..4 over frames
    ``x`` of shape (n_frames, 8), accumulated strictly in n order so an
    external engine summing the same left-associative chain reproduces
    every double bit-for-bit. im uses the e^{-i2πkn/8} sign convention."""
    n_frames = x.shape[0]
    re = np.zeros((n_frames, 5))
    im = np.zeros((n_frames, 5))
    for k in range(5):
        for n in range(8):
            j = (k * n) % 8
            re[:, k] = re[:, k] + x[:, n] * _COS8[j]
            im[:, k] = im[:, k] - x[:, n] * _SIN8[j]
    return re, im


def stft_power_frames(
    media_df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    n_fft: int = 8,
    hop: int = 4,
) -> DataFrame:
    """Per (doc, frame, bin) STFT power over binary WAV payloads: decode
    PCM for real, slice rectangular frames of ``n_fft`` samples every
    ``hop``, 8-point exact DFT per frame, power = re² + im². Only
    n_fft=8 is engine-exact (closed-form twiddles); other sizes would
    need libm trig and lose the cross-engine bit guarantee."""
    if n_fft != 8:
        raise ValueError("stft_power_frames is engine-exact for n_fft=8 only")

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from fortune_500_financial_insights_pipeline_spark.operators.media_codec import (
            wav_decode,
        )

        for pdf in batches:
            out = {"doc_id": [], "frame": [], "bin": [], "re": [], "im": [],
                   "power": []}
            for doc_id, media in zip(pdf["doc_id"], pdf["__media"]):
                _rate, _n_ch, samples = wav_decode(bytes(media))
                mono = samples[:, 0]
                n = len(mono)
                if n < n_fft:
                    continue
                starts = range(0, n - n_fft + 1, hop)
                x = np.stack([mono[s : s + n_fft] for s in starts])
                re, im = dft8_frame(x)
                power = re * re + im * im
                for f in range(x.shape[0]):
                    for k in range(5):
                        out["doc_id"].append(doc_id)
                        out["frame"].append(f)
                        out["bin"].append(k)
                        out["re"].append(re[f, k])
                        out["im"].append(im[f, k])
                        out["power"].append(power[f, k])
            yield pd.DataFrame(out)

    return media_df.select(
        media_df[id_col].alias("doc_id"), media_df[media_col].alias("__media")
    ).mapInPandas(frames, schema=STFT_SCHEMA)


PHASH_LOW_BAND = [
    (ky, kx) for ky in range(4) for kx in range(4) if (ky, kx) != (0, 0)
]


def dft8_2d(x: "np.ndarray") -> "tuple[np.ndarray, np.ndarray]":
    """(re, im) of the 2-D 8×8 DFT of one real 8×8 block, with the SAME
    exact twiddles and a fully pinned accumulation order so an external
    engine can replay every double: row pass first (each row y → 8 bins
    kx, n-ordered chain), then the column pass accumulates y = 0..7 with
    the interleaved (+rr·cos, +ri·sin | +ri·cos, −rr·sin) order."""
    rr = np.zeros((8, 8))
    ri = np.zeros((8, 8))
    for y in range(8):
        for kx in range(8):
            for n in range(8):
                j = (kx * n) % 8
                rr[y, kx] = rr[y, kx] + x[y, n] * _COS8[j]
                ri[y, kx] = ri[y, kx] - x[y, n] * _SIN8[j]
    re = np.zeros((8, 8))
    im = np.zeros((8, 8))
    for ky in range(8):
        for kx in range(8):
            for y in range(8):
                j = (ky * y) % 8
                re[ky, kx] = re[ky, kx] + rr[y, kx] * _COS8[j]
                re[ky, kx] = re[ky, kx] + ri[y, kx] * _SIN8[j]
                im[ky, kx] = im[ky, kx] + ri[y, kx] * _COS8[j]
                im[ky, kx] = im[ky, kx] - rr[y, kx] * _SIN8[j]
    return re, im


def image_spectral_hash(
    media_df: DataFrame, id_col: str = "doc_id", media_col: str = "media"
) -> DataFrame:
    """Perceptual image hash for near-dup detection — the image-dedup
    member of the dedup family: decode the (PNG) payload FOR REAL,
    nearest-neighbor subsample the luma plane to 8×8 (index 2·i for a
    16×16 source, the pure-codec resize rule), exact 2-D 8-point DFT,
    and hash = 15 sign bits of the low-frequency real coefficients
    (the 4×4 band minus DC, bit i = re > 0). Visually-identical images
    (small pixel perturbations) keep their low-frequency signs and
    collide; unrelated images don't. Every arithmetic step is
    engine-exact (closed-form twiddles, pinned order), so the hash —
    normally a trust-me blob — is oracle-checkable. mapInPandas,
    map-only."""

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from fortune_500_financial_insights_pipeline_spark.operators.media_codec import (
            png_decode,
        )

        for pdf in batches:
            out = {"doc_id": [], "phash": []}
            for doc_id, media in zip(pdf["doc_id"], pdf["__media"]):
                img = png_decode(bytes(media))
                luma = img[:, :, 0].astype(np.float64)
                h, w = luma.shape
                if h < 8 or w < 8:
                    # fail closed like the codec family's corrupt-payload
                    # discipline — an undersized image cannot feed the
                    # fixed 8-point DFT
                    raise ValueError(
                        f"image too small for 8-point DFT: {h}x{w} (need >= 8x8)"
                    )
                sub = luma[:: max(1, h // 8), :: max(1, w // 8)][:8, :8] / 256.0
                re, _im = dft8_2d(sub)
                phash = 0
                for i, (ky, kx) in enumerate(PHASH_LOW_BAND):
                    if re[ky, kx] > 0:
                        phash |= 1 << i
                out["doc_id"].append(doc_id)
                out["phash"].append(phash)
            yield pd.DataFrame(out)

    return media_df.select(
        media_df[id_col].alias("doc_id"), media_df[media_col].alias("__media")
    ).mapInPandas(hashes, schema="doc_id long, phash long")


def audio_spectral_hash(
    media_df: DataFrame, id_col: str = "doc_id", media_col: str = "media",
    n_frames: int = 7,
) -> DataFrame:
    """Perceptual AUDIO hash for near-dup detection — the audio member
    of the cross-modality dedup family (text: minhash/simhash; image:
    image_spectral_hash): decode WAV-PCM for real, 8/4 STFT frames
    (dft8_frame — exact twiddles, pinned order), and hash = the
    spectral-shape comparison bits p(f, k) > p(f, k+1) for k = 1..3
    over the first ``n_frames`` frames (21 bits at the default) — the
    ordinal band-energy structure Shazam-class fingerprints key on,
    reduced to its engine-exact core. Sample-level perturbations move
    band powers by ~1e-4 of their separation in any structured signal,
    so near-identical clips collide; every double is replayable, so the
    hash is oracle-checkable. mapInPandas, map-only."""

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from fortune_500_financial_insights_pipeline_spark.operators.media_codec import (
            wav_decode,
        )

        for pdf in batches:
            out = {"doc_id": [], "ahash": []}
            for doc_id, media in zip(pdf["doc_id"], pdf["__media"]):
                _rate, _n_ch, samples = wav_decode(bytes(media))
                mono = samples[:, 0]
                if len(mono) < 8:
                    # fail closed like the codec family's corrupt-payload
                    # discipline — np.stack over zero frames would raise
                    # an opaque ValueError otherwise
                    raise ValueError(
                        f"audio clip too short for 8-point DFT: "
                        f"{len(mono)} samples (need >= 8)"
                    )
                starts = range(0, len(mono) - 8 + 1, 4)
                x = np.stack([mono[s : s + 8] for s in starts])[:n_frames]
                re, im = dft8_frame(x)
                power = re * re + im * im
                h = 0
                for f in range(x.shape[0]):
                    for k in range(1, 4):
                        if power[f, k] > power[f, k + 1]:
                            h |= 1 << (f * 3 + (k - 1))
                out["doc_id"].append(doc_id)
                out["ahash"].append(h)
            yield pd.DataFrame(out)

    return media_df.select(
        media_df[id_col].alias("doc_id"), media_df[media_col].alias("__media")
    ).mapInPandas(hashes, schema="doc_id long, ahash long")
