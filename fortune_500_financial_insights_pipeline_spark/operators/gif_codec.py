"""Pure-stdlib GIF codec: REAL decode for the third still-image format
the multimodal component detects (detect_format: png/jpeg/gif).

GIF (GIF87a/GIF89a, the complete public specification): header → logical
screen descriptor → global color table → extension blocks skipped →
image descriptor (+ optional local color table) → sub-block-assembled
LZW stream → variable-width LZW decode (CLEAR/EOI codes, 12-bit cap,
KwKwK case) → palette lookup → (H, W, 3) uint8 array, with the 4-pass
interlace row permutation undone when flagged. ``gif_decode`` returns
the first frame; ``gif_decode_frames`` composes EVERY frame of an
animation (offsets, transparency, disposal) — the video path. The encoder writes GIF87a with a global palette (the image's
unique colors, lexicographically sorted, power-of-two padded) and a REAL
LZW compressor (dictionary growth, width escalation, 4096-entry reset) —
so round-trips exercise genuine variable-width entropy coding, not a
stored-literal shortcut.

Same discipline as operators/media_codec (PNG/WAV) and
operators/jpeg_codec: nothing beyond stdlib ``struct`` + numpy, runs
inside Arrow-batched mapInPandas workers, and the decode seam
(multimodal.decode_image / _pure_decode) dispatches on the magic bytes.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")
_MAX_CODE_WIDTH = 12


def _interlace_rows(h: int) -> list[int]:
    """GIF 4-pass interlace row order: pass 1 every 8th row from 0,
    pass 2 every 8th from 4, pass 3 every 4th from 2, pass 4 odd rows.
    Returns the source-row index for each transmitted row, so
    ``img[rows] = decoded`` de-interlaces and ``decoded = img[rows]``
    interlaces — one permutation, both directions."""
    return (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )


# ---------------------------------------------------------------------------
# LZW — the GIF variant (LSB-first bit packing, CLEAR/EOI, 12-bit cap)
# ---------------------------------------------------------------------------


def lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """Decode a GIF LZW stream (sub-blocks already assembled) into palette
    indices. Implements the full spec: variable code width starting at
    min_code_size+1, CLEAR resets the dictionary, EOI terminates, the
    KwKwK case emits prev + prev[0], width grows when the next free slot
    reaches 2**width (capped at 12 bits — past 4096 entries the encoder
    must CLEAR, and this decoder holds width until it does)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    # bit reader: LSB-first across the whole stream
    nbits = len(data) * 8
    pos = 0
    width = min_code_size + 1

    def read_code() -> int | None:
        nonlocal pos
        if pos + width > nbits:
            return None
        byte0 = pos >> 3
        # up to 12 bits span at most 3 bytes
        chunk = int.from_bytes(data[byte0 : byte0 + 3], "little")
        code = (chunk >> (pos & 7)) & ((1 << width) - 1)
        pos += width
        return code

    def fresh_table() -> list[bytes | None]:
        t: list[bytes | None] = [bytes([i]) for i in range(clear)]
        t += [None, None]  # CLEAR, EOI slots
        return t

    table = fresh_table()
    out: list[int] = []
    prev: bytes | None = None
    while True:
        code = read_code()
        if code is None:
            break  # truncated stream: emit what we have (lenient, like PNG)
        if code == clear:
            table = fresh_table()
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            # first code after (implicit) clear must be a root
            if code >= len(table) or table[code] is None:
                raise ValueError("GIF LZW: first code after clear is not a root")
            entry = table[code]
        elif code < len(table) and table[code] is not None:
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]  # the KwKwK case
            table.append(entry)
        else:
            raise ValueError(f"GIF LZW: code {code} beyond table ({len(table)})")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1
    return out


def lzw_encode(indices: "np.ndarray | list[int]", min_code_size: int) -> bytes:
    """Encode palette indices as a GIF LZW stream (no sub-block framing):
    a real dictionary compressor — emits CLEAR first (decoder-friendly
    convention), grows code width exactly when the decoder's table would
    (next free slot == 2**width), and CLEAR-resets at the 4096-entry
    cap."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nacc = 0
    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += width
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    def fresh() -> tuple[dict[bytes, int], int]:
        return {bytes([i]): i for i in range(clear)}, eoi + 1

    emit(clear)
    table, next_code = fresh()
    seq = b""
    for idx in indices:
        nxt = seq + bytes([int(idx)])
        if nxt in table:
            seq = nxt
            continue
        emit(table[seq])
        if next_code == (1 << _MAX_CODE_WIDTH):
            # table is full (codes 0..4095 assigned): never assign the
            # unemittable 13-bit code 4096 — CLEAR-reset instead, before
            # inserting, so every table entry is an emittable code
            emit(clear)
            table, next_code = fresh()
            width = min_code_size + 1
        else:
            table[nxt] = next_code
            # the decoder grows its read width when ITS next slot hits
            # 2**width; its table is one entry behind ours mid-phrase, so
            # the encoder widens after assigning code 2**width - 1
            if next_code == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
            next_code += 1
        seq = bytes([int(idx)])
    if seq:
        emit(table[seq])
    emit(eoi)
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------


def _truncation_guard(fn):
    """Translate the IndexError/struct.error a truncated container raises
    mid-walk into the ValueError discipline the PNG/JPEG decoders follow
    (callers catch ValueError as "corrupt payload", not IndexError)."""
    import functools

    @functools.wraps(fn)
    def wrapped(data: bytes, *a, **kw):
        try:
            return fn(data, *a, **kw)
        except (IndexError, struct.error) as exc:
            raise ValueError(f"truncated GIF payload ({exc})") from exc

    return wrapped


def _sub_blocks(payload: bytes) -> bytes:
    """Frame a raw stream into <=255-byte GIF sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(payload), 255):
        part = payload[i : i + 255]
        out.append(len(part))
        out += part
    out.append(0)
    return bytes(out)


@_truncation_guard
def gif_decode(data: bytes) -> np.ndarray:
    """Decode GIF bytes to an (H, W, 3) uint8 array (first image frame,
    non-interlaced). Walks the real container: screen descriptor, global
    color table, 0x21 extensions (skipped via their sub-block chains),
    0x2C image descriptor with optional local color table, LZW data."""
    if data[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF payload")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    palette = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        palette = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-block chain
            pos += 1
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        _lx, _ty, w, h, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        pal = palette
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image has no color table")
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos]:
            ln = data[pos]
            lzw += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = lzw_decode(bytes(lzw), min_code)
        if len(idx) < w * h:
            raise ValueError(f"GIF LZW underrun: {len(idx)} < {w * h}")
        arr = np.asarray(idx[: w * h], np.int64).reshape(h, w)
        if iflags & 0x40:  # 4-pass interlace: undo the row permutation
            out = np.empty_like(arr)
            out[_interlace_rows(h)] = arr
            arr = out
        if arr.max(initial=0) >= len(pal):
            raise ValueError("GIF index beyond palette")
        return pal[arr]
    raise ValueError("GIF contains no image block")


@_truncation_guard
def gif_dimensions(data: bytes) -> tuple[int, int]:
    """(width, height) from the logical screen descriptor — header-only,
    no entropy decode (the metadata twin of png_dimensions)."""
    if data[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF payload")
    sw, sh = struct.unpack("<HH", data[6:10])
    return sw, sh


def gif_encode(img: np.ndarray, interlace: bool = False) -> bytes:
    """Encode an (H, W, 3) uint8 array with <= 256 distinct colors as
    GIF87a: global palette = the image's unique colors in lexicographic
    order (deterministic — oracles can replay it), power-of-two padded;
    pixel indices LZW-compressed for real. ``interlace=True`` transmits
    rows in the 4-pass order (the decoder undoes it)."""
    img = np.asarray(img, np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("gif_encode expects (H, W, 3) uint8")
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    pal, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError(f"{len(pal)} distinct colors; GIF caps at 256")
    size_bits = 1
    while (2 << size_bits - 1) < max(len(pal), 2):
        size_bits += 1
    n_slots = 2 << (size_bits - 1)
    table = np.zeros((n_slots, 3), np.uint8)
    table[: len(pal)] = pal
    min_code = max(size_bits, 2)  # LZW min code size must be >= 2
    out = bytearray()
    out += b"GIF87a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_bits - 1), 0, 0)
    out += table.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    out.append(min_code)
    seq = inv.reshape(h, w)
    if interlace:
        seq = seq[_interlace_rows(h)]
    out += _sub_blocks(lzw_encode(seq.reshape(-1), min_code))
    out += b"\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# Animation (GIF89a): the one video-like format fully decodable here
# ---------------------------------------------------------------------------


@_truncation_guard
def gif_decode_frames(data: bytes) -> list[tuple[int, np.ndarray]]:
    """Decode ALL frames of a (possibly animated) GIF as
    [(delay_cs, (H, W, 3) canvas), ...] — real frame COMPOSITION, not
    just extraction: each image block draws at its (left, top) offset
    over the running canvas, honoring the graphic-control extension's
    delay, transparency index, and disposal methods 0/1 (leave) and 2
    (restore background, cleared to color 0). This is the genuinely
    decodable member of the video family: the MP4 path
    (operators/mp4_index) walks the sample table and slices encoded
    H.264 frames; here every frame's pixels are recovered for real."""
    if data[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF payload")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gpal = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gpal = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((sh, sw, 3), np.uint8)
    if gpal is not None:
        canvas[:] = gpal[0]
    frames: list[tuple[int, np.ndarray]] = []
    delay = 0
    transparent = -1
    disposal = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                ln = data[pos]
                gflags = data[pos + 1]
                (delay,) = struct.unpack("<H", data[pos + 2 : pos + 4])
                transparent = data[pos + 4] if gflags & 0x01 else -1
                disposal = (gflags >> 2) & 0x07
                pos += 1 + ln
            else:
                while data[pos]:
                    pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        lx, ty, w, h, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        pal = gpal
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image has no color table")
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos]:
            ln = data[pos]
            lzw += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.asarray(lzw_decode(bytes(lzw), min_code)[: w * h], np.int64)
        if idx.size < w * h:
            raise ValueError("GIF LZW underrun")
        idx = idx.reshape(h, w)
        if iflags & 0x40:
            out = np.empty_like(idx)
            out[_interlace_rows(h)] = idx
            idx = out
        region = canvas[ty : ty + h, lx : lx + w]
        px = pal[idx]
        if transparent >= 0:
            mask = idx != transparent
            region[mask] = px[mask]
        else:
            region[:] = px
        frames.append((delay, canvas.copy()))
        if disposal == 2:  # restore to background
            canvas[ty : ty + h, lx : lx + w] = (
                gpal[0] if gpal is not None else 0
            )
        delay, transparent, disposal = 0, -1, 0
    if not frames:
        raise ValueError("GIF contains no image block")
    return frames


def gif_encode_animation(
    frames: "list[np.ndarray]", delays_cs: "list[int]", loop: int = 0
) -> bytes:
    """Encode full-canvas RGB frames (shared <=256-color palette across
    all frames) as an animated GIF89a: NETSCAPE loop extension + one
    graphic-control extension (delay, disposal=1) per frame, each frame
    LZW-compressed for real."""
    if len(frames) != len(delays_cs) or not frames:
        raise ValueError("frames/delays length mismatch or empty")
    h, w = frames[0].shape[:2]
    stack = np.concatenate([np.asarray(f, np.uint8).reshape(-1, 3) for f in frames])
    pal, inv = np.unique(stack, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError(f"{len(pal)} distinct colors across frames; GIF caps at 256")
    size_bits = 1
    while (2 << size_bits - 1) < max(len(pal), 2):
        size_bits += 1
    n_slots = 2 << (size_bits - 1)
    table = np.zeros((n_slots, 3), np.uint8)
    table[: len(pal)] = pal
    min_code = max(size_bits, 2)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_bits - 1), 0, 0)
    out += table.tobytes()
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01" + struct.pack("<H", loop) + b"\x00"
    per = w * h
    for i, delay in enumerate(delays_cs):
        if frames[i].shape[:2] != (h, w):
            raise ValueError("all frames must share the canvas size")
        out += b"\x21\xf9" + bytes([4, 0x04]) + struct.pack("<H", delay) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(min_code)
        out += _sub_blocks(lzw_encode(inv[i * per : (i + 1) * per], min_code))
    out += b"\x3b"
    return bytes(out)
