"""Unit tests for the pure-stdlib TIFF codec: uncompressed (round-6)
plus LZW / Deflate strips and Predictor 2 (round-7), both byte orders;
unsupported schemes refuse with the scheme named.

The LZW decoder is pinned by a HAND-PACKED code stream (independent of
our encoder), so a mirrored encoder/decoder bug cannot self-certify;
width-transition alignment follows libtiff tif_lzw.c (decoder bumps at
next-free == 2^w - 1, encoder at 2^w)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from insight_gp_import_spark.tiff_codec import (
    decode_tiff,
    encode_tiff,
    is_tiff,
    lzw_decode,
    lzw_encode,
    packbits_decode,
    packbits_encode,
)


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


def test_packbits_known_vectors():
    """The worked example from the TIFF 6.0 spec (Apple PackBits):
    FE AA 02 80 00 2A FD AA 03 80 00 2A 22 F7 AA
    -> AA AA AA 80 00 2A AA AA AA AA 80 00 2A 22 AA*10 (24 bytes)."""
    enc = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    dec = bytes.fromhex("AAAAAA80002A") + b"\xaa" * 4 + \
        bytes.fromhex("80002A22") + b"\xaa" * 10
    assert packbits_decode(enc) == dec
    # -128 control byte is a documented no-op
    assert packbits_decode(b"\x80\x00A") == b"A"
    # our encoder round-trips the spec's plaintext
    assert packbits_decode(packbits_encode(dec)) == dec


def test_packbits_long_runs_and_literals():
    rng = np.random.RandomState(3)
    buf = (b"\x00" * 300 + bytes(rng.randint(0, 256, 500, dtype=np.int64))
           + b"\xff" * 129)
    assert packbits_decode(packbits_encode(buf)) == buf
    assert len(packbits_encode(b"\x07" * 1000)) < 20  # RLE actually packs


def test_packbits_tiff_roundtrip():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 4, (9, 5, 3)).astype(np.uint8) * 80
    data = encode_tiff(img, compression=32773, rows_per_strip=4)
    assert np.array_equal(decode_tiff(data), img)


@pytest.mark.parametrize("comp,name", [(7, "JPEG"), (4, "CCITT"),
                                       (2, "CCITT")])
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


def _pack_msb(codes_widths):
    """Pack (code, width) pairs MSB-first into bytes — the test's own
    bit packer, independent of the codec's."""
    acc = nbits = 0
    out = bytearray()
    for code, width in codes_widths:
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def test_lzw_decode_hand_packed_vector():
    """Known-answer decode of a hand-constructed code stream: Clear,
    'A', 'B', code 258 (the 'AB' entry the decoder itself built), EOI
    -> b'ABAB'. Catches bit-order and table-construction bugs without
    trusting lzw_encode."""
    stream = _pack_msb([(256, 9), (65, 9), (66, 9), (258, 9), (257, 9)])
    assert lzw_decode(stream) == b"ABAB"


def test_lzw_decode_kwkwk_case():
    """The code-equals-next-free case (cScSc pattern): Clear, 'A',
    258 before 258 exists -> old + old[0] = 'AA'."""
    stream = _pack_msb([(256, 9), (65, 9), (258, 9), (257, 9)])
    assert lzw_decode(stream) == b"AAA"


def test_lzw_width_transition_alignment():
    """253 distinct two-byte-novel inputs fill the table to slot 510;
    per libtiff the DECODER reads at 10 bits from next-free == 511
    while the ENCODER widens at 512 — an off-by-one on either side
    desyncs exactly at this boundary. 300 unique pairs crosses it."""
    buf = bytes(
        v for i in range(300) for v in ((i * 7) % 256, (i * 13 + 5) % 256)
    )
    assert lzw_decode(lzw_encode(buf)) == buf


def test_lzw_table_full_clear():
    """~16K of low-entropy data pushes the table past 4094 -> encoder
    must emit Clear and both sides resynchronize."""
    rng = np.random.RandomState(7)
    buf = bytes(rng.randint(0, 5, 16384, dtype=np.int64) % 256)
    enc = lzw_encode(buf)
    assert lzw_decode(enc) == buf
    assert len(enc) < len(buf)  # low-entropy data actually compresses


@pytest.mark.parametrize("comp", [5, 8])
@pytest.mark.parametrize("pred", [1, 2])
def test_compressed_roundtrip(comp, pred):
    rng = np.random.RandomState(comp * 10 + pred)
    img = rng.randint(0, 256, (11, 7, 3)).astype(np.uint8)
    data = encode_tiff(img, compression=comp, rows_per_strip=3,
                       predictor=pred)
    assert np.array_equal(decode_tiff(data), img)


def test_deflate_strips_are_real_zlib():
    """The Deflate payload must be a plain zlib stream per strip (TIFF
    compression 8), decodable by stdlib zlib directly."""
    img = np.arange(60, dtype=np.uint8).reshape(4, 5, 3)
    data = encode_tiff(img, compression=8)
    # single strip: offsets/counts inlined; strip starts at byte 8
    at = data.index(struct.pack("<HHI", 279, 4, 1))
    (cnt,) = struct.unpack("<I", data[at + 8:at + 12])
    assert zlib.decompress(data[8:8 + cnt]) == img.tobytes()


def test_predictor2_hand_built_ground_truth():
    """Hand-built grayscale strip of horizontal deltas: [10, 250, 20]
    must integrate (mod 256) to pixels [10, 4, 24] — ground truth for
    the predictor independent of encode_tiff."""
    body = zlib.compress(bytes([10, 250, 20]))
    entries = [(256, 3, 1, 3), (257, 3, 1, 1), (259, 3, 1, 8),
               (262, 3, 1, 1), (273, 4, 1, 8), (277, 3, 1, 1),
               (279, 4, 1, len(body)), (317, 3, 1, 2)]
    data = bytearray(b"II*\x00" + struct.pack("<I", 8 + len(body)))
    data += body
    data += struct.pack("<H", len(entries))
    for tag, typ, count, val in entries:
        data += struct.pack("<HHI", tag, typ, count)
        data += (struct.pack("<HH", val, 0) if typ == 3
                 else struct.pack("<I", val))
    data += struct.pack("<I", 0)
    out = decode_tiff(bytes(data))
    assert [int(v) for v in out[0, :, 0]] == [10, 4, 24]


def test_old_style_deflate_code_32946():
    """Compression 32946 (pre-standard Deflate) decodes identically."""
    img = np.full((2, 2, 3), 9, np.uint8)
    data = bytearray(encode_tiff(img, compression=8))
    at = bytes(data).index(struct.pack("<HHI", 259, 3, 1))
    data[at + 8:at + 10] = struct.pack("<H", 32946)
    assert np.array_equal(decode_tiff(bytes(data)), img)


def test_wide_image_dimensions_use_long_tags():
    """r6 ADVICE: dimensions beyond 65535 used to crash struct.pack on
    SHORT tags; LONG (type 4) tags must encode and round-trip. Deflate
    keeps the fixture small."""
    img = np.tile(np.arange(70000, dtype=np.uint8) % 251, (1, 1, 1))
    img = np.repeat(img.reshape(1, 70000, 1), 3, axis=2)
    data = encode_tiff(img, compression=8)
    out = decode_tiff(data)
    assert out.shape == (1, 70000, 3)
    assert np.array_equal(out, img)


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
