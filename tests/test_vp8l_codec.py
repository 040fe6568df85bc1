"""Unit tests for the pure-stdlib WebP-lossless (VP8L) codec (round-7).

The decoder is pinned two ways: a HAND-PACKED bitstream built by the
test's own LSB-first writer (independent of the module's encoder —
catches bit-order/header/simple-code layout bugs that a mirrored
encoder/decoder pair could self-certify), plus round-trips across
every transform / cache / palette / LZ77 / meta-Huffman combination
the encoder can emit. Lossy VP8 must refuse by name.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from insight_gp_import_spark.vp8l_codec import (
    decode_webp,
    encode_webp,
    is_webp,
)


def _wrap_riff(payload: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


class _W:
    """Test-local LSB-first bit writer (deliberately NOT the module's)."""

    def __init__(self):
        self.bits = []

    def w(self, value, n):
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def bytes(self):
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i:i + 8]):
                b |= bit << j
            out.append(b)
        return bytes(out)


def test_hand_packed_two_pixel_stream():
    """2x1 image, no transforms/cache/meta, five simple prefix codes,
    two literals. Pins the header layout, the spec's
    cache-before-meta read order, the simple-code field layout, and
    that 2-symbol simple codes map 0/1 in READ order (not by symbol
    value — sym0 > sym1 here on purpose)."""
    w = _W()
    w.w(0x2F, 8)       # signature
    w.w(1, 14)         # width - 1
    w.w(0, 14)         # height - 1
    w.w(0, 1)          # alpha hint
    w.w(0, 3)          # version
    w.w(0, 1)          # no transforms
    w.w(0, 1)          # no color cache
    w.w(0, 1)          # no meta-Huffman
    # green code: simple, 2 symbols, READ order (200, 10)
    w.w(1, 1); w.w(1, 1); w.w(1, 1); w.w(200, 8); w.w(10, 8)
    # red code: simple, 1 symbol = 77 (8-bit form)
    w.w(1, 1); w.w(0, 1); w.w(1, 1); w.w(77, 8)
    # blue code: simple, 1 symbol = 1 (1-bit form)
    w.w(1, 1); w.w(0, 1); w.w(0, 1); w.w(1, 1)
    # alpha code: simple, 1 symbol = 255
    w.w(1, 1); w.w(0, 1); w.w(1, 1); w.w(255, 8)
    # distance code: simple, 1 symbol = 0 (unused)
    w.w(1, 1); w.w(0, 1); w.w(0, 1); w.w(0, 1)
    # data: pixel 0 -> green sym0 (code 0), pixel 1 -> green sym1
    # (code 1); red/blue/alpha cost zero bits (single-symbol codes)
    w.w(0, 1)
    w.w(1, 1)
    data = _wrap_riff(bytes([0]) * 0 + w.bytes())
    # note: signature byte was written through the bit writer byte-
    # aligned first, so w.bytes() already starts with 0x2F
    out = decode_webp(data)
    assert out.shape == (1, 2, 3)
    assert [int(v) for v in out[0, 0]] == [77, 200, 1]
    assert [int(v) for v in out[0, 1]] == [77, 10, 1]


def test_is_webp_and_refusals():
    assert not is_webp(b"\x89PNG" + b"\x00" * 16)
    with pytest.raises(ValueError, match="RIFF"):
        decode_webp(b"nope" + b"\x00" * 32)
    lossy = (b"RIFF" + struct.pack("<I", 16) + b"WEBP"
             + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4)
    with pytest.raises(NotImplementedError, match="lossy"):
        decode_webp(lossy)
    with pytest.raises(ValueError, match="signature"):
        decode_webp(_wrap_riff(b"\x00\x00\x00\x00"))
    with pytest.raises(ValueError, match="truncated"):
        decode_webp(_wrap_riff(b"\x2f\x01"))


def _img(seed, h, w):
    return np.random.RandomState(seed).randint(
        0, 256, (h, w, 3)
    ).astype(np.uint8)


@pytest.mark.parametrize("mode", range(14))
def test_all_predictor_modes_roundtrip(mode):
    img = _img(mode, 19, 17)
    assert np.array_equal(decode_webp(encode_webp(img, predictor_mode=mode)), img)


@pytest.mark.parametrize("ncol", [2, 3, 4, 5, 16, 17, 256])
def test_palette_bundling_widths(ncol):
    """Every sub-byte bundling width (8/4/2 px per byte) + unbundled,
    incl. non-multiple image widths."""
    rng = np.random.RandomState(ncol)
    pal = rng.randint(0, 256, (ncol, 3)).astype(np.uint8)
    img = pal[rng.randint(0, ncol, (11, 13))]
    assert np.array_equal(decode_webp(encode_webp(img, use_palette=True)), img)


def test_color_transform_and_stacking():
    img = _img(42, 21, 16)
    data = encode_webp(
        img, subtract_green=True, color_transform=(130, 5, 200),
        predictor_mode=11,
    )
    assert np.array_equal(decode_webp(data), img)


def test_color_cache_roundtrip():
    rng = np.random.RandomState(7)
    # few distinct colors -> many cache hits
    pal = rng.randint(0, 256, (4, 3)).astype(np.uint8)
    img = pal[rng.randint(0, 4, (20, 20))]
    for bits in (1, 4, 11):
        data = encode_webp(img, cache_bits=bits, use_lz77=False)
        assert np.array_equal(decode_webp(data), img)


def test_lz77_overlapping_and_vertical_copies():
    # constant image: dist=1 overlapping copy of length ~n
    img = np.full((16, 16, 3), 123, np.uint8)
    small = encode_webp(img)
    assert np.array_equal(decode_webp(small), img)
    assert len(small) < 100  # the run actually compressed
    # row-periodic image: dist=width vertical copies
    row = _img(3, 1, 32)
    img2 = np.tile(row, (24, 1, 1))
    assert np.array_equal(decode_webp(encode_webp(img2)), img2)


def test_meta_huffman_groups():
    img = _img(5, 18, 18)
    data = encode_webp(img, use_meta=True)
    assert np.array_equal(decode_webp(data), img)


@pytest.mark.parametrize("h,w", [(1, 1), (1, 4), (4, 4), (4, 5), (5, 4)])
def test_meta_huffman_single_tile_images(h, w):
    """Soak-caught regression: with <= one 4x4 tile only group 0
    exists; the decoder reads (max meta index + 1) groups, so writing
    a second group's codes desyncs the stream."""
    img = _img(h * 16 + w, h, w)
    assert np.array_equal(decode_webp(encode_webp(img, use_meta=True)), img)


def test_grayscale_2d_input():
    g = (np.arange(48).reshape(6, 8) * 5).astype(np.uint8)
    out = decode_webp(encode_webp(g))
    assert np.array_equal(out[:, :, 0], g)
