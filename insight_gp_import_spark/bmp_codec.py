"""Pure-stdlib BMP codec (round-6).

- ``decode_bmp``: BITMAPINFOHEADER (and the larger V4/V5 headers)
  uncompressed BI_RGB images at 8-bit (palettized), 24-bit and 32-bit
  depths, bottom-up and top-down row orders, 4-byte row padding.
  Returns uint8 (h, w, 3) RGB (BMP stores BGR). RLE compression and
  16-bit bitfields refuse explicitly.
- ``encode_bmp``: 24-bit BI_RGB bottom-up writer — the universally
  readable layout.
"""

from __future__ import annotations

import struct

import numpy as np


def is_bmp(data: bytes) -> bool:
    return bytes(data[:2]) == b"BM"


def decode_bmp(data: bytes) -> np.ndarray:
    if not is_bmp(data):
        raise ValueError("not a BMP (bad signature)")
    (pix_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise NotImplementedError(f"BMP header size {hdr_size} (CORE header)")
    w, h_raw = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if compression != 0:
        raise NotImplementedError(f"BMP compression {compression} (BI_RGB only)")
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"BMP bit depth {bpp} (8/24/32 supported)")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    palette = None
    if bpp == 8:
        (ncolors,) = struct.unpack("<I", data[46:50])
        ncolors = ncolors or 256
        pal_off = 14 + hdr_size
        raw = np.frombuffer(
            data[pal_off:pal_off + 4 * ncolors], dtype=np.uint8
        ).reshape(-1, 4)
        palette = raw[:, [2, 1, 0]]  # BGRx -> RGB
    stride = ((w * bpp // 8) + 3) & ~3
    rows = []
    for y in range(h):
        at = pix_off + y * stride
        row = np.frombuffer(data, dtype=np.uint8,
                            count=w * bpp // 8, offset=at)
        rows.append(row)
    img = np.stack(rows)
    if not top_down:
        img = img[::-1]
    if bpp == 8:
        idx = img
        if int(idx.max(initial=0)) >= palette.shape[0]:
            raise ValueError("BMP palette index out of range")
        return palette[idx]
    px = img.reshape(h, w, bpp // 8)
    return px[:, :, [2, 1, 0]].copy()  # BGR(A) -> RGB, drop alpha


def encode_bmp(arr: np.ndarray) -> bytes:
    """uint8 (h, w[, 3]) RGB -> 24-bit BI_RGB bottom-up BMP bytes."""
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=2)
    h, w = arr.shape[:2]
    bgr = arr[:, :, [2, 1, 0]].astype(np.uint8)
    stride = ((w * 3) + 3) & ~3
    pad = b"\x00" * (stride - w * 3)
    body = b"".join(bgr[y].tobytes() + pad for y in range(h - 1, -1, -1))
    pix_off = 14 + 40
    header = (
        b"BM"
        + struct.pack("<IHHI", pix_off + len(body), 0, 0, pix_off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    )
    return header + body
