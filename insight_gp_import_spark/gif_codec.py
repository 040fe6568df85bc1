"""Pure-stdlib GIF codec (round-6: shrinking the media-decode refusal
surface further — GIF is ubiquitous in scraped web corpora).

- ``decode_gif``: GIF87a/GIF89a static images and the FIRST frame of
  animations — full LZW decompression (variable code widths, clear /
  EOI codes, the KwKwK case, 12-bit cap), global and local color
  tables, interlaced row order, extension-block skipping. Returns
  uint8 (h, w, 3) RGB. Frames smaller than the logical screen are
  composited onto it (background-color fill).
- ``encode_gif``: minimal valid GIF89a writer over a palettized image
  (<=256 distinct colors): real LZW compression with dictionary
  growth and clear-on-full, optional interlacing — enough to exercise
  every decoder path with genuine streams.

GIF bit order is the OPPOSITE of JPEG's: LZW codes pack LSB-first
into the byte stream, inside <=255-byte sub-blocks.

Spec: GIF89a specification (CompuServe, 1990; public).
"""

from __future__ import annotations

import struct

import numpy as np

GIF_INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]  # (start, step)


def is_gif(data: bytes) -> bool:
    return bytes(data[:6]) in (b"GIF87a", b"GIF89a")


# ---------------------------------------------------------------------- LZW


class _LsbBitReader:
    """LSB-first bit reader over the concatenated sub-block payload."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("GIF LZW stream truncated")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return v


class _LsbBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= (code & ((1 << width) - 1)) << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    reader = _LsbBitReader(data)
    out = bytearray()

    def reset():
        return (
            {i: bytes([i]) for i in range(clear)},
            eoi + 1,
            min_code_size + 1,
        )

    table, next_code, width = reset()
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = reader.read(width)
        if code == clear:
            table, next_code, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"GIF LZW: invalid code {code}")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out[:n_pixels])


def _lzw_encode(pixels: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _LsbBitWriter()

    def reset():
        return {bytes([i]): i for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, width = reset()
    bw.write(clear, width)
    run = b""
    for byte in pixels:
        cand = run + bytes([byte])
        if cand in table:
            run = cand
            continue
        bw.write(table[run], width)
        if next_code < 4096:
            table[cand] = next_code
            # decoder grows width when ITS next_code hits 2^width; the
            # encoder must widen at the same point
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            bw.write(clear, width)
            table, next_code, width = reset()
        run = bytes([byte])
    if run:
        bw.write(table[run], width)
    bw.write(eoi, width)
    return bw.flush()


# -------------------------------------------------------------------- codec


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes -> uint8 (h, w, 3) RGB (first frame of animations)."""
    if not is_gif(data):
        raise ValueError("not a GIF (bad signature)")
    w, h, flags, bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos:pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n

    def skip_subblocks(p):
        while data[p] != 0:
            p += 1 + data[p]
        return p + 1

    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos = skip_subblocks(pos + 2)
            continue
        if b != 0x2C:
            raise ValueError(f"GIF: unexpected block 0x{b:02X}")
        ix, iy, iw, ih, iflags = struct.unpack("<HHHHB", data[pos + 1:pos + 10])
        pos += 10
        ct = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(data[pos:pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image with no color table")
        min_code_size = data[pos]
        pos += 1
        chunks = []
        while data[pos] != 0:
            ln = data[pos]
            chunks.append(data[pos + 1:pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(
            _lzw_decode(b"".join(chunks), min_code_size, iw * ih),
            dtype=np.uint8,
        )
        if idx.size != iw * ih:
            raise ValueError("GIF frame pixel count mismatch")
        frame = idx.reshape(ih, iw)
        if iflags & 0x40:  # interlaced: rows arrive in 4-pass order
            de = np.zeros_like(frame)
            src = 0
            for start, step in GIF_INTERLACE_PASSES:
                rows = range(start, ih, step)
                for r in rows:
                    de[r] = frame[src]
                    src += 1
            frame = de
        if int(frame.max(initial=0)) >= ct.shape[0]:
            raise ValueError("GIF pixel index outside color table")
        # composite onto the logical screen (background fill); the bg
        # index may exceed a small local table — clamp defensively
        screen = np.full((h, w), bg if gct is not None else 0, dtype=np.uint8)
        screen[iy:iy + ih, ix:ix + iw] = frame
        return ct[np.minimum(screen, ct.shape[0] - 1)]
    raise ValueError("GIF contains no image data")


def encode_gif(
    arr: np.ndarray, interlace: bool = False
) -> bytes:
    """uint8 (h, w, 3) RGB with <=256 distinct colors -> GIF89a bytes."""
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=2)
    h, w = arr.shape[:2]
    flat = arr.reshape(-1, 3)
    palette, idx = np.unique(flat, axis=0, return_inverse=True)
    if palette.shape[0] > 256:
        raise ValueError("encode_gif needs <=256 distinct colors")
    # pad palette to a power of two >= 2
    size_exp = max(1, int(np.ceil(np.log2(max(palette.shape[0], 2)))))
    n = 1 << size_exp
    pal = np.zeros((n, 3), dtype=np.uint8)
    pal[:palette.shape[0]] = palette
    frame = idx.reshape(h, w).astype(np.uint8)
    if interlace:
        rows = [
            r
            for start, step in GIF_INTERLACE_PASSES
            for r in range(start, h, step)
        ]
        stream = frame[rows].tobytes()
    else:
        stream = frame.tobytes()
    min_code_size = max(2, size_exp)
    lzw = _lzw_encode(stream, min_code_size)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_exp - 1), 0, 0)
    out += pal.tobytes()
    iflags = 0x40 if interlace else 0
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
    out.append(min_code_size)
    for off in range(0, len(lzw), 255):
        chunk = lzw[off:off + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3B"
    return bytes(out)
