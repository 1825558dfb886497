"""Systematic corrupt-media fuzz: at 100 TB, malformed payloads are the
norm, so EVERY decoder must fail closed — ValueError (the documented
corrupt-payload contract) or NotImplementedError (the codec-stack seam)
— never IndexError/struct.error/KeyError escaping mid-walk, never a
hang, and never a silently-wrong success on a mangled container.

Round-5 truncation spot checks (test_ops_round5e) sampled a few cuts;
this fuzzes every truncation offset and deterministic byte flips across
all six container families, including the MJPEG-in-MP4 path added in
round 6 and the fragmented-MP4 (moof/traf/trun) and WARC/gzip-member
walks added in round 7."""

from __future__ import annotations

import numpy as np
import pytest

ACCEPT = (ValueError, NotImplementedError)


def _payloads():
    from fortune_500_financial_insights_pipeline_spark.operators.bmp_codec import (
        bmp_decode,
        bmp_encode,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.gif_codec import (
        gif_decode,
        gif_encode,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.jpeg_codec import (
        jpeg_decode,
        jpeg_encode_baseline,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.media_codec import (
        png_decode,
        png_encode,
        wav_decode,
        wav_encode_pcm16,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.mp4_index import (
        mp4_build_fragmented,
        mp4_build_minimal,
        mp4_sample_index,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.warc import (
        http_response_payload,
        warc_build,
        warc_build_record,
        warc_parse,
    )

    rnd = np.random.default_rng(11)
    img = rnd.integers(0, 256, size=(8, 12, 3), dtype=np.uint8)
    gray = rnd.integers(0, 256, size=(8, 16), dtype=np.uint8)
    pcm = rnd.integers(-30000, 30000, size=256, dtype=np.int16)
    jpg = jpeg_encode_baseline(gray)
    return [
        ("png", png_encode(img), png_decode),
        ("gif", gif_encode(img), gif_decode),
        ("bmp", bmp_encode(img), bmp_decode),
        ("jpeg", jpg, jpeg_decode),
        ("wav", wav_encode_pcm16(pcm, 8000), wav_decode),
        ("mp4", mp4_build_minimal([jpg, jpg], [100, 120]), mp4_sample_index),
        ("fmp4", mp4_build_fragmented([jpg, jpg, jpg], [100, 120, 110],
                                      samples_per_frag=2), mp4_sample_index),
        ("warc", warc_build([
            warc_build_record("warcinfo", b"software: t\r\n"),
            warc_build_record("response", http_response_payload(b"<p>x</p>"),
                              target_uri="http://e.com/1"),
        ], gzip_members=True), warc_parse),
    ]


@pytest.mark.parametrize("fmt_idx", range(8))
def test_every_truncation_fails_closed(fmt_idx):
    fmt, data, dec = _payloads()[fmt_idx]
    for cut in range(len(data)):
        try:
            dec(data[:cut])
        except ACCEPT:
            continue
        except Exception as exc:  # noqa: BLE001 — the assertion IS the catch
            raise AssertionError(
                f"{fmt} truncated at {cut}/{len(data)}: "
                f"{type(exc).__name__} escaped ({exc})"
            ) from exc
        # a successful decode of a PREFIX is acceptable only when the
        # container genuinely self-terminates before the cut (e.g. GIF
        # trailer, MP4 moov fully present); nothing to assert here —
        # the contract is about exception TYPE, not prefix validity.


@pytest.mark.parametrize("fmt_idx", range(8))
def test_byte_flips_fail_closed_or_decode(fmt_idx):
    """Single-byte corruption at deterministic stride: decoders may
    reject (ValueError), may hit the codec seam (NotImplementedError),
    or may still decode (flips in pixel payloads are legal data) — but
    must never leak low-level exceptions."""
    fmt, data, dec = _payloads()[fmt_idx]
    for off in range(0, len(data), max(1, len(data) // 97)):
        mangled = bytearray(data)
        mangled[off] ^= 0x5A
        try:
            dec(bytes(mangled))
        except ACCEPT:
            continue
        except (MemoryError, OverflowError) as exc:
            # a flipped dimension/size field must be range-checked, not
            # trusted into an allocation
            raise AssertionError(
                f"{fmt} flip at {off}: {type(exc).__name__} — size field "
                "trusted without bounds check"
            ) from exc
        except Exception as exc:  # noqa: BLE001
            raise AssertionError(
                f"{fmt} flip at {off}: {type(exc).__name__} escaped ({exc})"
            ) from exc
