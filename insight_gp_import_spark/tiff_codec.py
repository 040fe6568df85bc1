"""Pure-stdlib TIFF codec (round-6, narrow by design).

TIFF is a container with dozens of compression schemes; real-world
coverage needs a library. What IS tractable — and common for
raw/scientific exports — is baseline uncompressed TIFF:

- ``decode_tiff``: first IFD of little- or big-endian TIFF files,
  Compression=1 (none) only, 8-bit grayscale / RGB / RGBA, strip
  layout (any RowsPerStrip), PlanarConfiguration=1 (chunky).
  LZW/Deflate/PackBits/JPEG-in-TIFF and tiled layouts refuse
  explicitly with the scheme named.
- ``encode_tiff``: single-strip uncompressed little-endian writer.

Spec: TIFF 6.0 (Adobe, 1992; public).
"""

from __future__ import annotations

import struct

import numpy as np

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}

_COMPRESSION_NAMES = {
    2: "CCITT G3", 3: "CCITT T.4", 4: "CCITT T.6", 5: "LZW",
    6: "old JPEG", 7: "JPEG", 8: "Deflate", 32773: "PackBits",
}


def is_tiff(data: bytes) -> bool:
    return bytes(data[:4]) in (b"II*\x00", b"MM\x00*")


def _read_ifd(data: bytes, endian: str):
    (ifd_off,) = struct.unpack(endian + "I", data[4:8])
    (n_entries,) = struct.unpack(endian + "H", data[ifd_off:ifd_off + 2])
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        at = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack(endian + "HHI", data[at:at + 8])
        if typ not in _TYPE_SIZES:
            continue
        size = _TYPE_SIZES[typ] * count
        if size <= 4:
            payload = data[at + 8:at + 8 + size]
        else:
            (off,) = struct.unpack(endian + "I", data[at + 8:at + 12])
            payload = data[off:off + size]
        if typ == 3:
            vals = list(struct.unpack(endian + "H" * count, payload))
        elif typ == 4:
            vals = list(struct.unpack(endian + "I" * count, payload))
        elif typ == 1:
            vals = list(payload)
        else:
            continue  # ASCII/RATIONAL tags are irrelevant here
        tags[tag] = vals
    return tags


def decode_tiff(data: bytes) -> np.ndarray:
    if not is_tiff(data):
        raise ValueError("not a TIFF (bad signature)")
    endian = "<" if data[:2] == b"II" else ">"
    tags = _read_ifd(data, endian)
    if _TAG_WIDTH not in tags or _TAG_HEIGHT not in tags:
        raise ValueError("TIFF missing dimensions")
    w, h = tags[_TAG_WIDTH][0], tags[_TAG_HEIGHT][0]
    comp = tags.get(_TAG_COMPRESSION, [1])[0]
    if comp != 1:
        name = _COMPRESSION_NAMES.get(comp, str(comp))
        raise NotImplementedError(
            f"TIFF compression {name} (only uncompressed supported)"
        )
    if tags.get(_TAG_PLANAR, [1])[0] != 1:
        raise NotImplementedError("TIFF planar configuration 2")
    spp = tags.get(_TAG_SAMPLES, [1])[0]
    bits = tags.get(_TAG_BITS, [8] * spp)
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"TIFF bit depths {bits} (8-bit only)")
    if spp not in (1, 3, 4):
        raise NotImplementedError(f"TIFF {spp} samples per pixel")
    offsets = tags.get(_TAG_STRIP_OFFSETS)
    counts = tags.get(_TAG_STRIP_COUNTS)
    if not offsets or not counts:
        raise NotImplementedError("TIFF tiled layout (no strip offsets)")
    raw = b"".join(
        data[off:off + cnt] for off, cnt in zip(offsets, counts)
    )
    need = h * w * spp
    if len(raw) < need:
        raise ValueError("TIFF strip data shorter than image")
    img = np.frombuffer(raw[:need], dtype=np.uint8).reshape(h, w, spp)
    if spp == 4:
        img = img[:, :, :3]  # drop alpha
    if spp == 1:
        # PhotometricInterpretation 0 = WhiteIsZero: invert to the
        # conventional black-is-zero grayscale
        if tags.get(_TAG_PHOTOMETRIC, [1])[0] == 0:
            img = 255 - img
        img = np.repeat(img, 3, axis=2)
    return img.copy()


def encode_tiff(arr: np.ndarray) -> bytes:
    """uint8 (h, w[, 3]) RGB -> single-strip uncompressed LE TIFF."""
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=2)
    h, w, spp = arr.shape
    body = np.ascontiguousarray(arr, dtype=np.uint8).tobytes()
    # layout: header(8) | pixel data | BitsPerSample array | IFD
    pix_off = 8
    bits_off = pix_off + len(body)
    ifd_off = bits_off + 2 * spp
    entries = [
        (_TAG_WIDTH, 3, 1, w),
        (_TAG_HEIGHT, 3, 1, h),
        (_TAG_BITS, 3, spp, bits_off),
        (_TAG_COMPRESSION, 3, 1, 1),
        (_TAG_PHOTOMETRIC, 3, 1, 2 if spp >= 3 else 1),
        (_TAG_STRIP_OFFSETS, 4, 1, pix_off),
        (_TAG_SAMPLES, 3, 1, spp),
        (_TAG_ROWS_PER_STRIP, 3, 1, h),
        (_TAG_STRIP_COUNTS, 4, 1, len(body)),
        (_TAG_PLANAR, 3, 1, 1),
    ]
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += body
    out += struct.pack("<" + "H" * spp, *([8] * spp))
    out += struct.pack("<H", len(entries))
    for tag, typ, count, val in entries:
        out += struct.pack("<HHI", tag, typ, count)
        if typ == 3 and count == 1:
            out += struct.pack("<HH", val, 0)
        else:
            out += struct.pack("<I", val)
    out += struct.pack("<I", 0)  # no next IFD
    return bytes(out)
