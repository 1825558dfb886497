"""Round-5 MP4 sample-table indexing tests (operators/mp4_index): the
builder and parser meet only at the ISO BMFF byte format, so round-trips
verify the spec walk — offsets must slice the exact payload bytes back
out of mdat, timestamps must be stts cumulative sums over the media
timescale, and multi-sample chunks must resolve through stsc/stco."""

from __future__ import annotations

import numpy as np
import pytest

from fortune_500_financial_insights_pipeline_spark.operators.mp4_index import (
    mp4_build_minimal,
    mp4_extract_samples,
    mp4_sample_index,
)


def _fixture(n=9, spc=4):
    samples = [bytes([(3 * i + 1) % 256]) * (5 + 7 * i % 23) for i in range(n)]
    durations = [100 + 50 * (i % 3) for i in range(n)]
    return samples, durations, mp4_build_minimal(
        samples, durations, timescale=1000, samples_per_chunk=spc
    )


def test_mp4_index_recovers_every_sample_exactly():
    samples, durations, data = _fixture()
    idx = mp4_sample_index(data)
    assert len(idx) == len(samples)
    running = 0
    for (i, ts, off, size), payload, dur in zip(idx, samples, durations):
        assert size == len(payload)
        assert data[off : off + size] == payload  # stco/stsc offsets are real
        assert ts == pytest.approx(running / 1000.0)
        running += dur


def test_mp4_extract_every_n():
    samples, _durations, data = _fixture(n=10, spc=3)
    ext = mp4_extract_samples(data, every_n=3)
    assert [i for i, _, _ in ext] == [0, 3, 6, 9]
    for i, _ts, frame in ext:
        assert frame == samples[i]


def test_mp4_single_chunk_and_uneven_tail():
    # n not divisible by samples_per_chunk: the last chunk is short
    samples, _d, data = _fixture(n=7, spc=4)
    idx = mp4_sample_index(data)
    assert [i for i, *_ in idx] == list(range(7))
    assert data[idx[6][2] : idx[6][2] + idx[6][3]] == samples[6]


def test_mp4_rejects_garbage():
    with pytest.raises(ValueError):
        mp4_sample_index(b"definitely not an mp4 container")


def test_sample_video_frames_in_spark(spark):
    from fortune_500_financial_insights_pipeline_spark.operators.multimodal import (
        sample_video_frames,
    )

    samples, durations, data = _fixture(n=6, spc=2)
    df = spark.createDataFrame(
        [(9, bytearray(data))], "doc_id long, media binary"
    )
    rows = sorted(
        sample_video_frames(df, every_n=2).collect(), key=lambda r: r.frame_idx
    )
    assert [r.frame_idx for r in rows] == [0, 2, 4]
    for r in rows:
        assert bytes(r.frame) == samples[r.frame_idx]
        assert r.n_bytes == len(samples[r.frame_idx])
    assert rows[1].frame_ts == pytest.approx((durations[0] + durations[1]) / 1000.0)
