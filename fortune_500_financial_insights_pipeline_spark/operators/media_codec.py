"""Pure-stdlib media codecs: REAL decode for the two fully-open formats.

Round-5 upgrade of the multimodal component: the container has no
PIL/ffmpeg (installs disallowed), but PNG and WAV-PCM are completely
specified public formats decodable with nothing beyond ``zlib``/``struct``
(both stdlib) and numpy — so pixel and audio-sample decode are implemented
here for real, and the "needs a media library" stub now covers only
formats whose decoders genuinely embed large codec stacks (JPEG entropy
coding, H.264 video).

PNG (RFC 2083): signature → chunk walk → IHDR geometry → concatenated
IDAT zlib inflate → per-scanline unfilter (the five standard filters:
None/Sub/Up/Average/Paeth) → (H, W, C) uint8 array; 8-bit depth,
sequential AND Adam7-interlaced (seven independently-filtered
sub-images reassembled by pass geometry), grayscale/RGB/palette/RGBA. The encoder (filter-0 rows +
zlib) exists so resize can re-encode and tests can round-trip — the
decoder handles ALL filters, so round-trip tests that pre-filter rows
exercise the inverse transform, not a shared code path.

WAV (RIFF): chunk walk → fmt (PCM, 8/16-bit) → data → float64 samples in
[-1, 1), (n_frames, n_channels).

These run inside Arrow-batched mapInPandas workers (operators/multimodal):
per-image Python cost is the decoder norm (PIL's inner loops are C, ours
are numpy-vectorized except the inherently sequential Sub/Average/Paeth
scanline carry), and the Spark plumbing around them is unchanged.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 6: 4}  # gray, rgb, palette, rgba

# Adam7 pass geometry: (x_start, y_start, x_step, y_step) per pass
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Undo the five per-scanline PNG filters over one (sub-)image whose
    serialized form is ``height`` rows of 1 filter byte + ``stride``
    bytes. Returns (height, stride) uint16 (values already & 0xFF)."""
    out = np.empty((height, stride), np.uint16)
    prev = np.zeros(stride, np.uint16)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).astype(np.uint16)
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f == 1:  # Sub: left-carry, sequential in x
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif f == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"corrupt PNG: unknown filter {f}")
        out[y] = cur
        prev = cur
    return out


def png_decode(data: bytes) -> np.ndarray:
    """Decode a PNG payload to an (H, W, C) uint8 array (C = 1/3/4;
    palette images come back expanded to RGB). Supports bit depth 8,
    non-interlaced — the overwhelmingly common case and the one our
    encoder emits; anything else raises ValueError with the reason."""
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        if len(chunk) < length:
            raise ValueError("corrupt PNG: truncated chunk")
        pos += 12 + length  # length + type + payload + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", chunk)
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(chunk, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("not a PNG: missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth} (only 8)")
    if interlace not in (0, 1):
        raise ValueError(f"unsupported PNG interlace method {interlace}")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    ch = _PNG_CHANNELS[color_type]
    stride = width * ch
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG: bad deflate stream ({exc})") from exc
    if interlace == 1:  # Adam7: seven independently-filtered sub-images
        out = np.empty((height, width, ch), np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            wp = (width - x0 + dx - 1) // dx
            hp = (height - y0 + dy - 1) // dy
            if wp <= 0 or hp <= 0:
                continue
            sp = wp * ch
            need = (sp + 1) * hp
            if off + need > len(raw):
                raise ValueError("corrupt PNG: Adam7 pass truncated")
            sub = _unfilter(raw[off : off + need], hp, sp, ch)
            off += need
            out[y0::dy, x0::dx] = sub.astype(np.uint8).reshape(hp, wp, ch)
        if off != len(raw):
            raise ValueError("corrupt PNG: Adam7 size mismatch")
        img = out
    else:
        if len(raw) != (stride + 1) * height:
            raise ValueError("corrupt PNG: inflated size mismatch")
        out = _unfilter(raw, height, stride, ch)
        img = out.astype(np.uint8).reshape(height, width, ch)
    if color_type == 3:
        if palette is None:
            raise ValueError("corrupt PNG: palette image without PLTE")
        img = palette[img[:, :, 0]]
    return img


def png_encode(img: np.ndarray, interlace: bool = False) -> bytes:
    """Encode an (H, W) or (H, W, C) uint8 array as a minimal valid PNG
    (filter 0 on every row, one IDAT). Gray (C=1), RGB (C=3), RGBA (C=4).
    ``interlace=True`` serializes the seven Adam7 sub-images."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = {1: 0, 3: 2, 4: 6}[ch]

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 1 if interlace else 0)
    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = arr[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            parts.append(
                b"".join(b"\x00" + sub[y].tobytes() for y in range(sub.shape[0]))
            )
        rows = b"".join(parts)
    else:
        rows = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(rows, 6))
        + chunk(b"IEND", b"")
    )


def png_luma(img: np.ndarray) -> np.ndarray:
    """(H, W) integer luma from a decoded array: ITU-R BT.601 integer
    coefficients with floor division — L = (299·R + 587·G + 114·B) // 1000
    for color inputs, identity for grayscale; the alpha channel is ignored
    (no compositing). Deterministic integer math, stated here because it
    defines the feature values downstream oracles/tests pin."""
    if img.shape[2] == 1:
        return img[:, :, 0].astype(np.int64)
    r = img[:, :, 0].astype(np.int64)
    g = img[:, :, 1].astype(np.int64)
    b = img[:, :, 2].astype(np.int64)
    return (299 * r + 587 * g + 114 * b) // 1000


def resize_nearest(img: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resample of an (H, W, C) array: source index =
    floor(i · src/target) — the standard integer mapping, deterministic,
    no floating-point kernels."""
    h, w = img.shape[0], img.shape[1]
    ys = (np.arange(target_h) * h) // target_h
    xs = (np.arange(target_w) * w) // target_w
    return img[ys][:, xs]


def wav_decode(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a RIFF/WAVE PCM payload → (sample_rate, n_channels,
    samples) with samples float64 in [-1, 1), shape (n_frames,
    n_channels). 16-bit signed little-endian and 8-bit unsigned PCM
    (the two PCM encodings WAV defines for these depths)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("corrupt WAV: truncated fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            raw = body
    if fmt is None or raw is None:
        raise ValueError("not a WAV: missing fmt/data chunk")
    audio_format, n_ch, rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1:
        raise ValueError(f"unsupported WAV format {audio_format} (only PCM)")
    if n_ch < 1:
        raise ValueError("corrupt WAV: zero channels")
    if bits == 16:
        arr = np.frombuffer(raw[: len(raw) // 2 * 2], "<i2").astype(np.float64)
        arr /= 32768.0
    elif bits == 8:
        arr = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV bit depth {bits} (8/16 PCM)")
    n_frames = len(arr) // n_ch
    return rate, n_ch, arr[: n_frames * n_ch].reshape(n_frames, n_ch)


def wav_encode_pcm16(pcm: np.ndarray, sample_rate: int) -> bytes:
    """Encode an int16 (n_frames,) or (n_frames, n_channels) array as
    16-bit PCM WAV with NO float quantization — the integer-exact path
    (decode then multiplies by 32768 back to these exact values)."""
    arr = np.asarray(pcm)
    if arr.ndim == 1:
        arr = arr[:, None]
    return _wav_container(arr.astype("<i2"), sample_rate)


def wav_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode (n_frames, n_channels) float samples in [-1, 1] as 16-bit
    PCM WAV (round-half-away from zero via np.round then clip)."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    pcm = np.clip(np.round(arr * 32767.0), -32768, 32767).astype("<i2")
    return _wav_container(pcm, sample_rate)


def _wav_container(pcm: np.ndarray, sample_rate: int) -> bytes:
    n_ch = pcm.shape[1]
    raw = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, n_ch, sample_rate, sample_rate * 2 * n_ch, 2 * n_ch, 16)
    size = 4 + (8 + len(fmt)) + (8 + len(raw))
    return (
        b"RIFF"
        + struct.pack("<I", size)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(raw))
        + raw
    )
