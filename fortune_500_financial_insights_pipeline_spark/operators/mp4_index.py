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


def mp4_sample_index(data: bytes) -> "list[tuple[int, float, int, int]]":
    """Parse the first track's sample tables → one row per sample:
    (sample_idx, dts_seconds, byte_offset, byte_size). Pure box walk —
    stts gives decode timestamps, stsz sizes, stsc maps samples into
    chunks, stco places chunks in the file."""
    if _find(data, 0, len(data), b"moov") is None:
        raise ValueError("not an MP4: no moov box")
    ms, me = _find(data, 0, len(data), b"moov")
    trak = _find(data, ms, me, b"trak")
    if trak is None:
        raise ValueError("corrupt MP4: no trak")
    mdia = _find(data, *trak, b"mdia")
    mdhd = _find(data, *mdia, b"mdhd")
    version = data[mdhd[0]]
    if version == 0:
        timescale = struct.unpack(">I", data[mdhd[0] + 12 : mdhd[0] + 16])[0]
    else:
        timescale = struct.unpack(">I", data[mdhd[0] + 20 : mdhd[0] + 24])[0]
    minf = _find(data, *mdia, b"minf")
    stbl = _find(data, *minf, b"stbl")

    def table(btype: bytes) -> tuple[int, int]:
        t = _find(data, *stbl, btype)
        if t is None:
            raise ValueError(f"corrupt MP4: missing {btype.decode()}")
        return t

    # stts → per-sample dts
    s, _e = table(b"stts")
    (n_runs,) = struct.unpack(">I", data[s + 4 : s + 8])
    deltas: list[int] = []
    p = s + 8
    for _ in range(n_runs):
        c, d = struct.unpack(">II", data[p : p + 8])
        deltas.extend([d] * c)
        p += 8
    dts = np.concatenate([[0], np.cumsum(deltas)[:-1]]) if deltas else np.array([])

    # stsz → sizes
    s, _e = table(b"stsz")
    fixed, count = struct.unpack(">II", data[s + 4 : s + 12])
    if fixed:
        sizes = [fixed] * count
    else:
        sizes = list(
            struct.unpack(f">{count}I", data[s + 12 : s + 12 + 4 * count])
        )

    # stsc runs
    s, _e = table(b"stsc")
    (n_sc,) = struct.unpack(">I", data[s + 4 : s + 8])
    sc = [
        struct.unpack(">III", data[s + 8 + 12 * i : s + 20 + 12 * i])
        for i in range(n_sc)
    ]

    # stco offsets
    s, _e = table(b"stco")
    (n_chunks,) = struct.unpack(">I", data[s + 4 : s + 8])
    chunk_offsets = list(
        struct.unpack(f">{n_chunks}I", data[s + 8 : s + 8 + 4 * n_chunks])
    )

    # expand stsc: samples per chunk for every chunk
    per_chunk: list[int] = []
    for i, (first, spc, _desc) in enumerate(sc):
        last = sc[i + 1][0] - 1 if i + 1 < len(sc) else n_chunks
        per_chunk.extend([spc] * (last - first + 1))

    out: list[tuple[int, float, int, int]] = []
    idx = 0
    for chunk_i, coff in enumerate(chunk_offsets):
        pos = coff
        for _ in range(per_chunk[chunk_i]):
            if idx >= len(sizes):
                break
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
