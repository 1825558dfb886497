"""Pure-numpy baseline JPEG codec (ITU-T T.81, public spec) — round 5.

Decoder: baseline sequential DCT (SOF0), 8-bit samples, Huffman entropy
coding (DHT), single interleaved scan, 4:4:4 / 4:2:0 / 4:2:2 chroma
subsampling, restart markers, JFIF YCbCr→RGB. That covers the classic
baseline JPEG. Progressive (SOF2) dispatches to
operators/jpeg_progressive (round-5: spectral selection + successive
approximation, fully decoded); arithmetic coding and the lossless/
hierarchical SOF variants raise ValueError with the reason.

Encoder: minimal 4:4:4 baseline encoder (level shift → float DCT →
quantize → Annex-K Huffman) — exists so tests can roundtrip without any
reference library: lossy, but with all-ones quantization tables the only
error is DCT/IDCT rounding, bounded to a few counts per pixel.

Everything is stdlib + numpy: the entropy decode walks a bit reader in
Python (images in this repo's tests are small; a production still-image
service would decode on the executor inside the same mapInPandas batch,
which is exactly where multimodal.decode_image calls this)."""

from __future__ import annotations

import struct

import numpy as np

# --- shared DCT basis --------------------------------------------------------

_C = np.array([1.0 / np.sqrt(2.0)] + [1.0] * 7)
_COS = np.cos((2 * np.arange(8)[:, None] + 1) * np.arange(8)[None, :] * np.pi / 16)
# orthonormal 2-D DCT-II basis: B[u, x] = C(u)/2 * cos((2x+1)uπ/16)
_B = (_C[:, None] / 2.0) * _COS.T  # shape (u, x)

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])


def _idct2(block: np.ndarray) -> np.ndarray:
    return _B.T @ block @ _B


def _dct2(block: np.ndarray) -> np.ndarray:
    return _B @ block @ _B.T


# --- Annex K (spec example) Huffman tables, used by the encoder --------------

_DC_LUM_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_AC_LUM_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical JPEG construction."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    """(length, code) -> symbol lookup built from BITS/HUFFVAL."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length]):
                self.lut[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, reader: "_BitReader") -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.bit()
            sym = self.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("corrupt JPEG: invalid Huffman code")


class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.cur = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("corrupt JPEG: entropy stream ran out")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError("corrupt JPEG: marker inside entropy data")
            self.cur = b
            self.nbits = 8
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> int:
        """Skip to the next marker (for RSTn); returns the marker byte."""
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                marker = self.data[self.pos + 1]
                self.pos += 2
                return marker
            self.pos += 1
        raise ValueError("corrupt JPEG: expected restart marker")


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG to (H, W, 3) RGB uint8 (grayscale comes
    back replicated? no — (H, W, 1) for single-component scans)."""
    try:
        return _decode_baseline(data)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"truncated JPEG payload ({exc})") from exc
    except KeyError as exc:
        # a corrupt scan can reference a table id no DHT/DQT defined —
        # same corrupt-payload contract as truncation
        raise ValueError(f"corrupt JPEG: undefined table id {exc}") from exc


def _decode_baseline(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    dc_tables: dict[int, _HuffDecoder] = {}
    ac_tables: dict[int, _HuffDecoder] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq != 0:
                    raise ValueError("unsupported JPEG: 16-bit quant table")
                tbl = np.zeros(64, np.int64)
                tbl[_ZIGZAG] = np.frombuffer(seg[p : p + 64], np.uint8)
                qt[tq] = tbl.reshape(8, 8)
                p += 64
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            _prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker == 0xC2:  # progressive: hand the whole stream over
            from fortune_500_financial_insights_pipeline_spark.operators.jpeg_progressive import (
                jpeg_decode_progressive,
            )

            return jpeg_decode_progressive(data)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported JPEG: not baseline/progressive DCT")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = [0] + list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                dec = _HuffDecoder(bits, vals)
                (dc_tables if tc == 0 else ac_tables)[th] = dec
                p += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows the segment
            if frame is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(
                    (c for c in frame["comps"] if c["id"] == cs), None
                )
                if comp is None:
                    raise ValueError(
                        f"corrupt JPEG: SOS references undefined component {cs}"
                    )
                scan.append({**comp, "dc": tdta >> 4, "ac": tdta & 0xF})
            reader = _BitReader(data, pos + seglen)
            return _decode_scan(frame, scan, qt, dc_tables, ac_tables,
                                restart_interval, reader)
        pos += seglen
    raise ValueError("corrupt JPEG: no SOS scan found")


def _decode_scan(frame, scan, qt, dc_tables, ac_tables, restart_interval, reader):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), np.float64)
        for c in scan
    }
    pred = {c["id"]: 0 for c in scan}
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                marker = reader.align_to_marker()
                if not (0xD0 <= marker <= 0xD7):
                    raise ValueError("corrupt JPEG: bad restart marker")
                pred = {c["id"]: 0 for c in scan}
            for c in scan:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        block = np.zeros(64, np.int64)
                        t = dc_tables[c["dc"]].decode(reader)
                        diff = _extend(reader.receive(t), t)
                        pred[c["id"]] += diff
                        block[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = ac_tables[c["ac"]].decode(reader)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("corrupt JPEG: AC index overrun")
                            block[_ZIGZAG[k]] = _extend(reader.receive(s), s)
                            k += 1
                        dq = block.reshape(8, 8) * qt[c["tq"]]
                        px = _idct2(dq.astype(np.float64))
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = px
            n_mcu += 1
    # upsample each component to full MCU-grid resolution, crop, shift
    out = []
    for c in scan:
        p = planes[c["id"]]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        gray = np.clip(np.round(out[0] + 128.0), 0, 255).astype(np.uint8)
        return gray[:, :, None]
    y, cb, cr = out[0] + 128.0, out[1], out[2]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --- minimal 4:4:4 baseline encoder (tests' roundtrip partner) ---------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.cur = (self.cur << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.cur)
                if self.cur == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.cur = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.cur <<= 8 - self.nbits
            self.cur |= (1 << (8 - self.nbits)) - 1  # pad with 1s per spec
            self.out.append(self.cur)
            if self.cur == 0xFF:
                self.out.append(0x00)
            self.cur = 0
            self.nbits = 0


def _magnitude(v: int) -> tuple[int, int]:
    """(size, raw bits) for the DC/AC magnitude coding."""
    t = 0
    a = abs(v)
    while a:
        t += 1
        a >>= 1
    return t, (v if v >= 0 else v + (1 << t) - 1)


def jpeg_encode_baseline(img: np.ndarray, quant: "np.ndarray | None" = None) -> bytes:
    """Encode (H, W) grayscale or (H, W, 3) RGB as a baseline 4:4:4 JPEG
    with Annex-K Huffman tables. ``quant`` is an 8×8 table (default all
    ones — near-lossless: only DCT rounding error survives)."""
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    if quant is None:
        quant = np.ones((8, 8), np.int64)
    quant = np.asarray(quant, np.int64)
    if nc == 3:
        rf = arr[:, :, 0].astype(np.float64)
        gf = arr[:, :, 1].astype(np.float64)
        bf = arr[:, :, 2].astype(np.float64)
        comps = [
            0.299 * rf + 0.587 * gf + 0.114 * bf - 128.0,
            -0.168736 * rf - 0.331264 * gf + 0.5 * bf,
            0.5 * rf - 0.418688 * gf - 0.081312 * bf,
        ]
    else:
        comps = [arr[:, :, 0].astype(np.float64) - 128.0]
    dc_codes = _canonical_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_codes = _canonical_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    bw = _BitWriter()
    hb = -(-h // 8)
    wb = -(-w // 8)
    pred = [0] * len(comps)
    for by in range(hb):
        for bx in range(wb):
            for ci, plane in enumerate(comps):
                block = np.zeros((8, 8), np.float64)
                tile = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                block[: tile.shape[0], : tile.shape[1]] = tile
                # edge-extend partial tiles with the last row/col
                if tile.shape[0] < 8:
                    block[tile.shape[0] :, : tile.shape[1]] = tile[-1:, :]
                if tile.shape[1] < 8:
                    block[:, tile.shape[1] :] = block[:, tile.shape[1] - 1 : tile.shape[1]]
                coef = np.round(_dct2(block) / quant).astype(np.int64)
                zz = coef.reshape(64)[_ZIGZAG]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                t, bits = _magnitude(diff)
                code, ln = dc_codes[t]
                bw.write(code, ln)
                if t:
                    bw.write(bits, t)
                run = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes[0xF0]
                        bw.write(code, ln)
                        run -= 16
                    t, bits = _magnitude(v)
                    code, ln = ac_codes[(run << 4) | t]
                    bw.write(code, ln)
                    bw.write(bits, t)
                    run = 0
                if run:
                    code, ln = ac_codes[0x00]
                    bw.write(code, ln)
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    # quant table serialized in zigzag order: position i holds quant flat
    # index _ZIGZAG[i] (the same mapping the decoder's DQT parser inverts)
    qz = quant.reshape(64)[_ZIGZAG]
    dqt = seg(0xDB, bytes([0x00]) + bytes(int(v) for v in qz))
    comps_sof = b"".join(
        bytes([i + 1, 0x11, 0]) for i in range(len(comps))
    )
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, len(comps)) + comps_sof)
    dht_dc = seg(0xC4, bytes([0x00]) + bytes(_DC_LUM_BITS[1:]) + bytes(_DC_LUM_VALS))
    dht_ac = seg(0xC4, bytes([0x10]) + bytes(_AC_LUM_BITS[1:]) + bytes(_AC_LUM_VALS))
    sos = seg(
        0xDA,
        bytes([len(comps)])
        + b"".join(bytes([i + 1, 0x00]) for i in range(len(comps)))
        + bytes([0, 63, 0]),
    )
    return (
        b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos + bytes(bw.out) + b"\xff\xd9"
    )
