"""Real MP4 (ISO BMFF) sample-table indexing — round 5.

What a 100 TB video-curation pipeline actually does on the data-plane is
CONTAINER work, not codec work: walk `moov/trak/mdia/minf/stbl`, read the
sample tables (stts timing, stsz sizes, stsc sample→chunk, stco chunk
offsets), and slice each encoded frame's bytes out of `mdat` — the GPU
decoder pool gets handed (ts, bytes) pairs. That walk is pure public spec
(ISO/IEC 14496-12) and needs no media library, so it is implemented here
for real; only the H.264 entropy decode of the sliced bytes remains
library-bound (multimodal.sample_frames' pixel stub).

`mp4_build_minimal` synthesizes a valid one-track file (ftyp + mdat +
moov with the four sample tables) so tests and the oracle key can
round-trip: builder and parser meet only at the byte format.
"""

from __future__ import annotations

import struct

import numpy as np


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


def _full(btype: bytes, payload: bytes, version: int = 0, flags: int = 0) -> bytes:
    return _box(btype, struct.pack(">B", version) + flags.to_bytes(3, "big") + payload)


def mp4_build_minimal(
    samples: "list[bytes]",
    durations: "list[int]",
    timescale: int = 1000,
    samples_per_chunk: int = 2,
) -> bytes:
    """One-track MP4: ftyp, a single mdat holding the concatenated sample
    bytes, and a moov whose stbl indexes them — chunked
    ``samples_per_chunk`` at a time so stsc/stco resolution is genuinely
    exercised (not one trivial chunk)."""
    if len(samples) != len(durations):
        raise ValueError("samples and durations must align")
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat_payload = b"".join(samples)
    mdat = _box(b"mdat", mdat_payload)
    mdat_offset = len(ftyp)  # mdat box starts here; data begins +8

    # stts: run-length (count, delta)
    runs: list[tuple[int, int]] = []
    for d in durations:
        if runs and runs[-1][1] == d:
            runs[-1] = (runs[-1][0] + 1, d)
        else:
            runs.append((1, d))
    stts = _full(
        b"stts",
        struct.pack(">I", len(runs))
        + b"".join(struct.pack(">II", c, d) for c, d in runs),
    )
    stsz = _full(
        b"stsz",
        struct.pack(">II", 0, len(samples))
        + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    stsc = _full(b"stsc", struct.pack(">I", 1) + struct.pack(">III", 1, samples_per_chunk, 1))
    offsets = []
    pos = mdat_offset + 8
    for i in range(0, len(samples), samples_per_chunk):
        offsets.append(pos)
        pos += sum(len(s) for s in samples[i : i + samples_per_chunk])
    stco = _full(
        b"stco",
        struct.pack(">I", len(offsets))
        + b"".join(struct.pack(">I", o) for o in offsets),
    )
    stsd = _full(b"stsd", struct.pack(">I", 0))  # no codec entries: index-only
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", stbl)
    total = sum(durations)
    mdhd = _full(
        b"mdhd", struct.pack(">IIII", 0, 0, timescale, total) + struct.pack(">HH", 0x55C4, 0)
    )
    mdia = _box(b"mdia", mdhd + minf)
    tkhd = _full(b"tkhd", b"\x00" * 80, version=0, flags=7)
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd",
        struct.pack(">IIII", 0, 0, timescale, total) + b"\x00" * 80,
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        btype = data[pos + 4 : pos + 8]
        if size < 8 or pos + size > end:
            raise ValueError("corrupt MP4: bad box size")
        yield btype, pos + 8, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, btype: bytes):
    for t, s, e in _walk(data, start, end):
        if t == btype:
            return s, e
    return None


def _must_find(data: bytes, span, btype: bytes):
    """A required child box; ValueError (not a None unpack) when a
    corrupt parent lacks it."""
    if span is None:
        raise ValueError("corrupt MP4: missing parent box")
    t = _find(data, span[0], span[1], btype)
    if t is None:
        raise ValueError(f"corrupt MP4: missing {btype.decode()} box")
    return t


def _unpack(fmt: str, data: bytes, start: int, end: int):
    """struct.unpack with the ValueError discipline for short buffers."""
    if end > len(data) or start < 0:
        raise ValueError("corrupt MP4: field beyond payload")
    try:
        return struct.unpack(fmt, data[start:end])
    except struct.error as exc:
        raise ValueError(f"corrupt MP4: truncated field ({exc})") from exc


def mp4_sample_index(data: bytes) -> "list[tuple[int, float, int, int]]":
    """Parse the first track's sample tables → one row per sample:
    (sample_idx, dts_seconds, byte_offset, byte_size). Pure box walk —
    stts gives decode timestamps, stsz sizes, stsc maps samples into
    chunks, stco places chunks in the file. Corrupt containers raise
    ValueError (never IndexError/struct.error/MemoryError): every
    required box is presence-checked, every field is bounds-checked, and
    every count field is sanity-capped against the payload size before
    it drives an allocation (fuzz-gated by tests/test_fuzz_codecs.py)."""
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("not an MP4: no moov box")
    trak = _must_find(data, moov, b"trak")
    mdia = _must_find(data, trak, b"mdia")
    mdhd = _must_find(data, mdia, b"mdhd")
    version = data[mdhd[0]] if mdhd[0] < len(data) else 0
    if version == 0:
        timescale = _unpack(">I", data, mdhd[0] + 12, mdhd[0] + 16)[0]
    else:
        timescale = _unpack(">I", data, mdhd[0] + 20, mdhd[0] + 24)[0]
    if timescale == 0:
        raise ValueError("corrupt MP4: zero timescale")
    minf = _must_find(data, mdia, b"minf")
    stbl = _must_find(data, minf, b"stbl")

    def table(btype: bytes) -> tuple[int, int]:
        return _must_find(data, stbl, btype)

    # a sample table can never describe more entries than the payload
    # has bytes — the cap that keeps a flipped count field from driving
    # a giant allocation
    sanity = len(data)

    # stts → per-sample dts
    s, _e = table(b"stts")
    (n_runs,) = _unpack(">I", data, s + 4, s + 8)
    deltas: list[int] = []
    p = s + 8
    for _ in range(n_runs):
        c, d = _unpack(">II", data, p, p + 8)
        if c > sanity or len(deltas) + c > sanity:
            raise ValueError("corrupt MP4: stts sample count exceeds payload")
        deltas.extend([d] * c)
        p += 8
    dts = np.concatenate([[0], np.cumsum(deltas)[:-1]]) if deltas else np.array([])

    # stsz → sizes
    s, _e = table(b"stsz")
    fixed, count = _unpack(">II", data, s + 4, s + 12)
    if count > sanity:
        raise ValueError("corrupt MP4: stsz sample count exceeds payload")
    if fixed:
        sizes = [fixed] * count
    else:
        sizes = list(
            _unpack(f">{count}I", data, s + 12, s + 12 + 4 * count)
        )

    # stsc runs
    s, _e = table(b"stsc")
    (n_sc,) = _unpack(">I", data, s + 4, s + 8)
    if n_sc > sanity:
        raise ValueError("corrupt MP4: stsc run count exceeds payload")
    sc = [
        _unpack(">III", data, s + 8 + 12 * i, s + 20 + 12 * i)
        for i in range(n_sc)
    ]

    # stco offsets
    s, _e = table(b"stco")
    (n_chunks,) = _unpack(">I", data, s + 4, s + 8)
    if n_chunks > sanity:
        raise ValueError("corrupt MP4: stco chunk count exceeds payload")
    chunk_offsets = list(
        _unpack(f">{n_chunks}I", data, s + 8, s + 8 + 4 * n_chunks)
    )

    # expand stsc: samples per chunk for every chunk
    per_chunk: list[int] = []
    for i, (first, spc, _desc) in enumerate(sc):
        last = sc[i + 1][0] - 1 if i + 1 < len(sc) else n_chunks
        if spc > sanity or (last - first + 1) > sanity or \
                len(per_chunk) + max(0, last - first + 1) > sanity:
            raise ValueError("corrupt MP4: stsc expansion exceeds payload")
        per_chunk.extend([spc] * (last - first + 1))

    out: list[tuple[int, float, int, int]] = []
    idx = 0
    for chunk_i, coff in enumerate(chunk_offsets):
        if chunk_i >= len(per_chunk):
            raise ValueError("corrupt MP4: stco/stsc chunk counts disagree")
        pos = coff
        for _ in range(per_chunk[chunk_i]):
            if idx >= len(sizes):
                break
            if idx >= len(dts):
                raise ValueError("corrupt MP4: stts/stsz sample counts disagree")
            out.append((idx, float(dts[idx]) / timescale, pos, sizes[idx]))
            pos += sizes[idx]
            idx += 1
    if idx != len(sizes):
        raise ValueError("corrupt MP4: sample tables disagree on count")
    return out


def mp4_extract_samples(data: bytes, every_n: int = 1) -> "list[tuple[int, float, bytes]]":
    """(sample_idx, ts_seconds, encoded bytes) for every ``every_n``-th
    sample — the real frame-sampling data-plane: timestamps and encoded
    payloads come straight out of the container; pixel decode of the
    payload is the (library-bound) next stage."""
    return [
        (i, ts, data[off : off + size])
        for i, ts, off, size in mp4_sample_index(data)
        if i % every_n == 0
    ]
