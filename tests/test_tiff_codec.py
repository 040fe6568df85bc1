"""Unit tests for the narrow pure-stdlib TIFF codec (round-6):
uncompressed baseline TIFF only, both byte orders; everything
compressed refuses with the scheme named."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from insight_gp_import_spark.tiff_codec import decode_tiff, encode_tiff, is_tiff


@pytest.mark.parametrize("h,w", [(13, 17), (1, 1), (5, 3), (8, 8)])
def test_rgb_roundtrip_exact(h, w):
    rng = np.random.RandomState(h * 10 + w)
    img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    out = decode_tiff(encode_tiff(img))
    assert np.array_equal(out, img)


def test_gray_2d_input():
    g = (np.arange(42).reshape(6, 7) * 5).astype(np.uint8)
    out = decode_tiff(encode_tiff(g))
    assert np.array_equal(out[:, :, 0], g)


def test_big_endian_file():
    """Hand-built MM (big-endian) grayscale file."""
    img = np.array([[1, 2], [3, 4]], dtype=np.uint8)
    body = img.tobytes()
    entries = [(256, 3, 1, 2), (257, 3, 1, 2), (259, 3, 1, 1),
               (262, 3, 1, 1), (273, 4, 1, 8), (277, 3, 1, 1),
               (279, 4, 1, 4)]
    data = bytearray(b"MM\x00*" + struct.pack(">I", 8 + len(body)))
    data += body
    data += struct.pack(">H", len(entries))
    for tag, typ, count, val in entries:
        data += struct.pack(">HHI", tag, typ, count)
        data += (struct.pack(">HH", val, 0) if typ == 3
                 else struct.pack(">I", val))
    data += struct.pack(">I", 0)
    assert np.array_equal(decode_tiff(bytes(data))[:, :, 0], img)


def test_white_is_zero_inverted():
    """PhotometricInterpretation 0, single-sample grayscale: values
    must invert (encode_tiff always writes RGB, so hand-build)."""
    body = bytes([0, 255])
    entries = [(256, 3, 1, 2), (257, 3, 1, 1), (259, 3, 1, 1),
               (262, 3, 1, 0), (273, 4, 1, 8), (277, 3, 1, 1),
               (279, 4, 1, 2)]
    data = bytearray(b"II*\x00" + struct.pack("<I", 8 + len(body)))
    data += body
    data += struct.pack("<H", len(entries))
    for tag, typ, count, val in entries:
        data += struct.pack("<HHI", tag, typ, count)
        data += (struct.pack("<HH", val, 0) if typ == 3
                 else struct.pack("<I", val))
    data += struct.pack("<I", 0)
    out = decode_tiff(bytes(data))
    assert [int(v) for v in out[0, :, 0]] == [255, 0]


@pytest.mark.parametrize("comp,name", [(5, "LZW"), (7, "JPEG"),
                                       (8, "Deflate"), (32773, "PackBits")])
def test_compression_schemes_rejected_by_name(comp, name):
    data = bytearray(encode_tiff(np.zeros((2, 2, 3), np.uint8)))
    at = bytes(data).index(struct.pack("<HHI", 259, 3, 1))
    data[at + 8:at + 10] = struct.pack("<H", comp)
    with pytest.raises(NotImplementedError, match=name):
        decode_tiff(bytes(data))


def test_not_a_tiff_rejected():
    assert not is_tiff(b"BM\x00\x00")
    with pytest.raises(ValueError, match="signature"):
        decode_tiff(b"\x89PNG" + b"\x00" * 32)


def test_multi_strip_reassembly():
    """RowsPerStrip=2 over 5 rows -> three strips; decode reassembles."""
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (5, 4, 3)).astype(np.uint8)
    body = img.tobytes()
    row_bytes = 4 * 3
    strips = [body[i * 2 * row_bytes:(i + 1) * 2 * row_bytes] for i in range(3)]
    offs, cnts, blob, pos = [], [], b"", 8
    for s in strips:
        offs.append(pos); cnts.append(len(s)); blob += s; pos += len(s)
    n = 10
    ifd_off = 8 + len(blob) + 6
    data = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    data += blob
    data += struct.pack("<HHH", 8, 8, 8)  # bits array (3 shorts)
    bits_off = 8 + len(blob)
    arrays_off = ifd_off + 2 + 12 * n + 4
    entries = [(256, 3, 1, 4), (257, 3, 1, 5), (258, 3, 3, bits_off),
               (259, 3, 1, 1), (262, 3, 1, 2),
               (273, 4, 3, arrays_off), (277, 3, 1, 3), (278, 3, 1, 2),
               (279, 4, 3, arrays_off + 12), (284, 3, 1, 1)]
    data += struct.pack("<H", n)
    for tag, typ, count, val in entries:
        data += struct.pack("<HHI", tag, typ, count)
        data += (struct.pack("<HH", val, 0) if typ == 3 and count == 1
                 else struct.pack("<I", val))
    data += struct.pack("<I", 0)
    data += struct.pack("<III", *offs)
    data += struct.pack("<III", *cnts)
    assert np.array_equal(decode_tiff(bytes(data)), img)
