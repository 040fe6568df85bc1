"""Unit tests for the pure-stdlib BMP codec (round-6). BMP BI_RGB is
lossless, so roundtrips are exact array equalities."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from insight_gp_import_spark.bmp_codec import decode_bmp, encode_bmp, is_bmp


@pytest.mark.parametrize("h,w", [(13, 17), (8, 8), (5, 3), (1, 1), (9, 2)])
def test_roundtrip_exact_with_padding(h, w):
    rng = np.random.RandomState(h * 10 + w)
    img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    out = decode_bmp(encode_bmp(img))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def test_gray_2d_input():
    g = (np.arange(42).reshape(6, 7) * 5).astype(np.uint8)
    out = decode_bmp(encode_bmp(g))
    assert np.array_equal(out[:, :, 0], g)


def test_top_down_negative_height():
    """Hand-flip the header to top-down (negative height) and reorder
    the rows accordingly: decode must return identical pixels."""
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (6, 4, 3)).astype(np.uint8)
    data = bytearray(encode_bmp(img))
    (pix_off,) = struct.unpack("<I", bytes(data[10:14]))
    h, w = 6, 4
    data[22:26] = struct.pack("<i", -h)
    stride = ((w * 3) + 3) & ~3
    body = bytes(data[pix_off:])
    rows = [body[y * stride:(y + 1) * stride] for y in range(h)]
    data[pix_off:] = b"".join(reversed(rows))
    assert np.array_equal(decode_bmp(bytes(data)), img)


def test_8bit_palettized():
    """Hand-build an 8-bit palettized BMP (bottom-up)."""
    pal_rgb = np.array([[10, 20, 30], [200, 100, 50]], dtype=np.uint8)
    idx = np.array([[0, 1, 0], [1, 1, 0]], dtype=np.uint8)
    h, w = idx.shape
    stride = (w + 3) & ~3
    body = b"".join(
        idx[y].tobytes() + b"\x00" * (stride - w)
        for y in range(h - 1, -1, -1)
    )
    pal = b"".join(bytes([b, g, r, 0]) for r, g, b in pal_rgb)
    pix_off = 14 + 40 + len(pal)
    data = (
        b"BM" + struct.pack("<IHHI", pix_off + len(body), 0, 0, pix_off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(body),
                      2835, 2835, 2, 2)
        + pal + body
    )
    assert np.array_equal(decode_bmp(data), pal_rgb[idx])


def test_rle_compression_rejected():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    data = bytearray(encode_bmp(img))
    data[30:34] = struct.pack("<I", 1)  # BI_RLE8
    with pytest.raises(NotImplementedError, match="compression"):
        decode_bmp(bytes(data))


def test_not_a_bmp_rejected():
    assert not is_bmp(b"GIF89a")
    with pytest.raises(ValueError, match="signature"):
        decode_bmp(b"\x89PNG" + b"\x00" * 64)
