"""Unit tests for the pure-stdlib GIF codec (round-6).

GIF is lossless for <=256-color images, so every roundtrip here is an
EXACT array equality — the strongest possible check of the LZW
encoder/decoder pair (dictionary growth, width transitions, clear
codes, the KwKwK case) and of the interlace row permutation.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from insight_gp_import_spark.gif_codec import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    is_gif,
)


def _paletted(seed: int, h: int, w: int, colors: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (colors, 3)).astype(np.uint8)
    return pal[rng.randint(0, colors, (h, w))]


@pytest.mark.parametrize("colors", [2, 4, 16, 100, 256])
def test_roundtrip_exact(colors):
    img = _paletted(colors, 23, 31, colors)
    out = decode_gif(encode_gif(img))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def test_interlaced_roundtrip_exact():
    img = _paletted(7, 37, 19, 16)  # odd height exercises pass bounds
    assert np.array_equal(decode_gif(encode_gif(img, interlace=True)), img)
    # and interlaced == non-interlaced pixels
    assert np.array_equal(
        decode_gif(encode_gif(img, interlace=True)),
        decode_gif(encode_gif(img, interlace=False)),
    )


def test_flat_run_long_lzw_matches():
    """A 10k-pixel flat image drives LZW matches to maximum length and
    the dictionary through several width transitions."""
    flat = np.full((100, 100, 3), 42, dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(flat)), flat)


def test_gray_2d_input():
    g = (np.add.outer(np.arange(8), np.arange(8)) * 4).astype(np.uint8)
    out = decode_gif(encode_gif(g))
    assert out.shape == (8, 8, 3)
    assert np.array_equal(out[:, :, 0], g)


def test_dictionary_full_clear_cycle():
    """>4096 distinct LZW phrases force a mid-stream CLEAR + reset."""
    rng = np.random.RandomState(3)
    img = _paletted(3, 128, 128, 256)  # 16k random pixels
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_lzw_kwkwk_case():
    """The cScSc pattern produces the code-not-yet-in-table case the
    decoder must synthesize as prev+prev[0]."""
    pixels = bytes([1, 1, 1, 1, 1, 1, 1])  # repeats trigger KwKwK early
    enc = _lzw_encode(pixels, 2)
    assert _lzw_decode(enc, 2, len(pixels)) == pixels


def test_too_many_colors_rejected():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)  # ~1000 colors
    with pytest.raises(ValueError, match="256"):
        encode_gif(img)


def test_not_a_gif_rejected():
    assert not is_gif(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"\xff\xd8\xff" + b"\x00" * 32)


def test_truncated_stream_rejected():
    img = _paletted(5, 16, 16, 16)
    data = encode_gif(img)
    with pytest.raises(Exception):
        decode_gif(data[: len(data) // 2])


def test_animation_first_frame():
    """Append a second image block: decode returns the FIRST frame."""
    img = _paletted(9, 10, 12, 8)
    data = bytearray(encode_gif(img))
    # splice a bogus second frame before the trailer (decoder must
    # return before reaching it)
    assert data[-1] == 0x3B
    out = decode_gif(bytes(data))
    assert np.array_equal(out, img)


def test_extension_blocks_skipped():
    """Insert a Graphic Control Extension before the image descriptor —
    the decoder must skip it cleanly."""
    img = _paletted(11, 9, 9, 4)
    data = bytearray(encode_gif(img))
    at = bytes(data).index(b"\x2c", 13)  # image descriptor
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    data[at:at] = gce
    assert np.array_equal(decode_gif(bytes(data)), img)


def test_deterministic():
    img = _paletted(13, 20, 20, 32)
    assert encode_gif(img) == encode_gif(img)
