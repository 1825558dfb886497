"""Pure-stdlib BMP (Windows DIB) codec — the fourth real still-image
format next to PNG/JPEG/GIF.

Uncompressed BMP is a struct walk, no entropy coding: BITMAPFILEHEADER
('BM', pixel-data offset) → BITMAPINFOHEADER (40+ bytes: geometry, bit
depth, BI_RGB only) → optional BGRA palette → rows bottom-up (top-down
when height is negative), each padded to 4 bytes. Supported depths:
24-bit BGR, 32-bit BGRX, and 8-bit paletted. The encoder writes 24-bit
BI_RGB — the roundtrip partner and the re-encode target for resize.

Same discipline as the other codecs: stdlib ``struct`` + numpy, runs
inside Arrow-batched mapInPandas workers, ValueError on anything
corrupt/truncated or outside the supported profile."""

from __future__ import annotations

import struct

import numpy as np

BMP_MAGIC = b"BM"


def _truncation_guard(fn):
    import functools

    @functools.wraps(fn)
    def wrapped(data: bytes, *a, **kw):
        try:
            return fn(data, *a, **kw)
        except (IndexError, struct.error) as exc:
            raise ValueError(f"truncated BMP payload ({exc})") from exc

    return wrapped


@_truncation_guard
def bmp_decode(data: bytes) -> np.ndarray:
    """Decode BMP bytes to an (H, W, 3) uint8 RGB array."""
    if data[:2] != BMP_MAGIC:
        raise ValueError("not a BMP payload")
    (pix_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h_raw = struct.unpack("<ii", data[18:26])
    planes, depth = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression} (BI_RGB only)")
    if depth not in (8, 24, 32):
        raise ValueError(f"unsupported BMP bit depth {depth}")
    if w <= 0 or h_raw == 0:
        raise ValueError("corrupt BMP: non-positive dimensions")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    palette = None
    if depth == 8:
        (n_colors,) = struct.unpack("<I", data[46:50])
        n_colors = n_colors or 256
        pal_off = 14 + hdr_size
        raw = np.frombuffer(
            data, np.uint8, n_colors * 4, pal_off
        ).reshape(n_colors, 4)
        palette = raw[:, [2, 1, 0]].copy()  # BGRA -> RGB
    bpp = depth // 8
    stride = (w * bpp + 3) & ~3
    need = stride * h
    if pix_off + need > len(data):
        raise ValueError("corrupt BMP: pixel array truncated")
    rows = np.frombuffer(data, np.uint8, need, pix_off).reshape(h, stride)
    rows = rows[:, : w * bpp].reshape(h, w, bpp)
    if not top_down:
        rows = rows[::-1]
    if depth == 8:
        return palette[rows[:, :, 0]]
    return rows[:, :, [2, 1, 0]].copy()  # BGR(X) -> RGB


@_truncation_guard
def bmp_dimensions(data: bytes) -> tuple[int, int]:
    """(width, height) from the info header — metadata-only."""
    if data[:2] != BMP_MAGIC:
        raise ValueError("not a BMP payload")
    if len(data) < 26:
        raise ValueError("truncated BMP payload (info header)")
    w, h = struct.unpack("<ii", data[18:26])
    return w, abs(h)


def bmp_encode(img: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as 24-bit BI_RGB BMP
    (bottom-up rows, 4-byte padded)."""
    img = np.asarray(img, np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("bmp_encode expects (H, W, 3) uint8")
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = img[::-1][:, :, [2, 1, 0]].reshape(h, w * 3)
    pix = rows.tobytes()
    header = (
        BMP_MAGIC
        + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    )
    return header + pix
