"""Pure-stdlib WebP-LOSSLESS (VP8L) codec (round-7).

WebP has two entirely different bitstreams under one RIFF container:
lossy VP8 (a video intra-frame — boolean arithmetic coder, DCT, loop
filter; genuinely out of proportion for stdlib+numpy) and LOSSLESS
VP8L (canonical Huffman + LZ77 + color cache + four spatial
transforms — the same family of machinery as this repo's PNG/GIF
codecs). This module implements VP8L; lossy VP8 refuses explicitly.

- ``decode_webp``: VP8L decode — all four transforms (predictor with
  its 14 modes, color transform, subtract-green, color-indexing incl.
  the mandatory sub-byte pixel bundling for palettes <= 16), color
  cache, meta-Huffman (entropy image), simple and normal Huffman
  codes, LZ77 backward references incl. the 120-entry 2D distance
  neighborhood map.
- ``encode_webp``: a valid-bitstream encoder used as the fixture
  source for the round-trip tests: canonical Huffman over literal
  frequencies (full code-length-code emission), optional
  subtract-green, optional color cache, optional palette
  (color-indexing with bundling), optional uniform predictor tiles,
  and run-length LZ77 (dist=1 / dist=width — which exercises
  overlapping copies AND the 2D distance map's first entries).

Spec: "WebP Lossless Bitstream Specification" (Google; RFC 9649).
Bit I/O is LSB-first within bytes (like DEFLATE/GIF; unlike
JPEG/TIFF-LZW). The predictor's top-right pixel at the rightmost
column follows libwebp (wraps to the leftmost pixel of the row
above); encoder and decoder share one ``_predict_at`` helper, so
round-trips are exact by construction even at that edge.

SIZE NOTE (r8 ADVICE): decode is bit-at-a-time Huffman plus per-pixel
Python loops for the predictor/color-transform inverses — correct,
and fine for the fixture-scale payloads the driver gate and
resize_images tests feed it, but a real-world MEGAPIXEL WebP routed
through resize_images would take minutes. If large WebP payloads
become a real input, vectorize ``_inv_predictor`` /
``_inv_color_transform`` row-wise (the PNG/BMP paths show the numpy
shape) before putting this codec on that path.
"""

from __future__ import annotations

import struct

import numpy as np

_RIFF = b"RIFF"
_WEBP = b"WEBP"


def is_webp(data: bytes) -> bool:
    return bytes(data[:4]) == _RIFF and bytes(data[8:12]) == _WEBP


# ------------------------------------------------------------------- bit IO


class _BitReader:
    """LSB-first bit reader (DEFLATE convention)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        p = self.pos
        data = self.data
        try:
            for i in range(n):
                byte = data[(p + i) >> 3]
                v |= ((byte >> ((p + i) & 7)) & 1) << i
        except IndexError:
            raise ValueError("VP8L: truncated bitstream") from None
        self.pos = p + n
        return v


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


# ----------------------------------------------------------------- huffman

_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length); canonical assignment (RFC 1951 style:
    codes increase with symbol order within each length; the MSB of
    the code is the first bit read)."""
    max_len = max(lengths) if lengths else 0
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for bits in range(1, max_len + 1):
        code = (code + bl_count[bits - 1]) << 1
        next_code[bits] = code
    out: dict[int, tuple[int, int]] = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return out


class _HuffDecoder:
    """Bit-at-a-time canonical decoder (images here are small; a
    table-based fast path is an optimization the tests don't need)."""

    def __init__(self, lengths: list[int]):
        nz = [(s, ln) for s, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise ValueError("VP8L: empty Huffman code")
        if len(nz) == 1:
            self.single: int | None = nz[0][0]
            self.map: dict[tuple[int, int], int] = {}
            return
        self.single = None
        max_ln = max(ln for _, ln in nz)
        # Kraft equality: an over/under-subscribed code would desync
        # the stream silently
        if sum(1 << (max_ln - ln) for _, ln in nz) != (1 << max_ln):
            raise ValueError("VP8L: non-canonical Huffman code lengths")
        codes = _canonical_codes(lengths)
        self.map = {(ln, code): sym for sym, (code, ln) in codes.items()}

    @classmethod
    def fixed(cls, symbol: int) -> "_HuffDecoder":
        dec = cls.__new__(cls)
        dec.single = symbol
        dec.map = {}
        return dec

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, 16):
            code = (code << 1) | br.read(1)
            sym = self.map.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("VP8L: invalid Huffman code in stream")


def _read_huffman_code(br: _BitReader, alphabet_size: int) -> _HuffDecoder:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        sym0 = br.read(8) if br.read(1) else br.read(1)
        if num_symbols == 1:
            return _HuffDecoder.fixed(sym0)
        sym1 = br.read(8)
        # simple-code symbols take codes 0/1 in READ order (libwebp),
        # NOT canonical-by-symbol order — build the map directly
        dec = _HuffDecoder.__new__(_HuffDecoder)
        dec.single = None
        dec.map = {(1, 0): sym0, (1, 1): sym1}
        return dec
    # normal code: code-length code first
    num_clc = 4 + br.read(4)
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _HuffDecoder(clc_lengths)
    if br.read(1):  # explicit count of coded length symbols
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    symbol = 0
    while symbol < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        code_len = clc.read(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev_len = code_len
        elif code_len == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if symbol < alphabet_size:
                    lengths[symbol] = prev_len
                    symbol += 1
        elif code_len == 17:
            symbol += 3 + br.read(3)
        else:  # 18
            symbol += 11 + br.read(7)
    return _HuffDecoder(lengths)


def _limited_huffman(freqs: dict[int, int], cap: int) -> dict[int, int]:
    """Length-limited Huffman code lengths via package-merge (exact,
    Kraft-tight). freqs: symbol -> positive count."""
    syms = sorted(s for s, f in freqs.items() if f > 0)
    if not syms:
        raise ValueError("VP8L encoder: no symbols")
    if len(syms) == 1:
        return {syms[0]: 1}
    if len(syms) > (1 << cap):
        raise ValueError("VP8L encoder: alphabet exceeds length cap")
    leaves = sorted((freqs[s], (s,)) for s in syms)
    merged = list(leaves)
    for _ in range(cap - 1):
        packages = [
            (merged[i][0] + merged[i + 1][0], merged[i][1] + merged[i + 1][1])
            for i in range(0, len(merged) - 1, 2)
        ]
        merged = sorted(packages + leaves)
    lengths = {s: 0 for s in syms}
    for _, group in merged[: 2 * len(syms) - 2]:
        for s in group:
            lengths[s] += 1
    return lengths


def _write_huffman_code(
    bw: _BitWriter, lengths: list[int]
) -> dict[int, tuple[int, int]]:
    """Emit one prefix-code description and return the symbol ->
    (code, nbits) map the data section must use. The simple form is
    used when <= 2 symbols; else the full code-length-code machinery.
    No 16/17/18 repeat codes — every length is emitted literally
    (valid, just not maximally compact; these streams are fixtures)."""
    nz = [s for s, ln in enumerate(lengths) if ln > 0]
    if 1 <= len(nz) <= 2 and max(nz) <= 255:  # 8-bit symbol fields
        bw.write(1, 1)  # simple code
        bw.write(len(nz) - 1, 1)  # num_symbols - 1
        if nz[0] <= 1:
            bw.write(0, 1)  # first symbol in 1 bit
            bw.write(nz[0], 1)
        else:
            bw.write(1, 1)  # first symbol in 8 bits
            bw.write(nz[0], 8)
        if len(nz) == 2:
            bw.write(nz[1], 8)
            return {nz[0]: (0, 1), nz[1]: (1, 1)}  # codes in READ order
        return {nz[0]: (0, 0)}  # single symbol costs zero bits
    bw.write(0, 1)  # normal code
    clc_freqs: dict[int, int] = {}
    for ln in lengths:
        clc_freqs[ln] = clc_freqs.get(ln, 0) + 1
    clens_map = _limited_huffman(clc_freqs, 7)
    if len(clens_map) == 1:
        # a 1-symbol canonical code cannot satisfy Kraft; pair the
        # real symbol with a never-emitted dummy at length 1 each
        (only,) = clens_map
        dummy = 15 if only != 15 else 14
        clens_map = {only: 1, dummy: 1}
    positions = {s: i for i, s in enumerate(_CLC_ORDER)}
    num_clc = max(4, max(positions[s] for s in clens_map) + 1)
    bw.write(num_clc - 4, 4)
    order_lengths = [0] * 19
    for s, ln in clens_map.items():
        order_lengths[s] = ln
    for i in range(num_clc):
        bw.write(order_lengths[_CLC_ORDER[i]], 3)
    bw.write(0, 1)  # no explicit max_symbol
    clc_codes = _canonical_codes(order_lengths)
    for ln in lengths:
        code, nbits = clc_codes[ln]
        for b in range(nbits - 1, -1, -1):  # canonical codes go MSB-first
            bw.write((code >> b) & 1, 1)
    return _canonical_codes(lengths)


def _write_symbol(bw: _BitWriter, codes: dict[int, tuple[int, int]], sym: int) -> None:
    code, nbits = codes[sym]
    for b in range(nbits - 1, -1, -1):
        bw.write((code >> b) & 1, 1)


# ---------------------------------------------------------- LZ77 machinery

# 2D neighborhood for distance codes 1..120 (RFC 9649): (dx, dy)
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]
_DIST_MAP_INDEX = {v: i + 1 for i, v in enumerate(_DIST_MAP)}


def _prefix_decode(code: int, br: _BitReader) -> int:
    """length/distance prefix coding: codes 0..3 are values 1..4;
    each further code pair doubles the range with extra bits."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode(value: int) -> tuple[int, int, int]:
    """value -> (code, extra_value, extra_bit_count)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    extra = v.bit_length() - 2
    offset = (2 + ((v >> extra) & 1)) << extra
    return 2 * extra + ((v >> extra) & 1) + 2, value - offset - 1, extra


def _map_distance(dist_code: int, xsize: int) -> int:
    if dist_code > 120:
        return dist_code - 120
    dx, dy = _DIST_MAP[dist_code - 1]
    d = dy * xsize + dx
    return d if d >= 1 else 1


def _cache_key(argb: int, cache_bits: int) -> int:
    return ((argb * 0x1E35A7BD) & 0xFFFFFFFF) >> (32 - cache_bits)


# ---------------------------------------------------------------- decoding


def _decode_entropy_coded(
    br: _BitReader, xsize: int, ysize: int, allow_meta: bool
) -> np.ndarray:
    """Decode one spatially-coded ARGB image as uint32 (ysize, xsize).
    Used for the main image (allow_meta=True) and for transform /
    entropy sub-images (allow_meta=False). Read order per the spec
    grammar (and libwebp DecodeImageStream): color cache info FIRST,
    then the meta-prefix bit inside the Huffman-code section."""
    cache_bits = 0
    cache = None
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("VP8L: bad color cache size")
        cache = [0] * (1 << cache_bits)
    meta: np.ndarray | None = None
    huff_bits = 0
    num_groups = 1
    if allow_meta and br.read(1):
        huff_bits = 2 + br.read(3)
        mw = (xsize + (1 << huff_bits) - 1) >> huff_bits
        mh = (ysize + (1 << huff_bits) - 1) >> huff_bits
        meta_img = _decode_entropy_coded(br, mw, mh, False)
        meta = ((meta_img >> 8) & 0xFFFF).astype(np.int64)
        num_groups = int(meta.max()) + 1
    cache_size = (1 << cache_bits) if cache_bits else 0
    alpha_sizes = [256 + 24 + cache_size, 256, 256, 256, 40]
    groups = [
        [_read_huffman_code(br, a) for a in alpha_sizes]
        for _ in range(num_groups)
    ]
    n = xsize * ysize
    pix = [0] * n
    pos = 0
    while pos < n:
        if meta is not None:
            x, y = pos % xsize, pos // xsize
            g = groups[int(meta[y >> huff_bits, x >> huff_bits])]
        else:
            g = groups[0]
        s = g[0].read(br)
        if s < 256:
            red = g[1].read(br)
            blue = g[2].read(br)
            alpha = g[3].read(br)
            argb = (alpha << 24) | (red << 16) | (s << 8) | blue
            pix[pos] = argb
            if cache is not None:
                cache[_cache_key(argb, cache_bits)] = argb
            pos += 1
        elif s < 256 + 24:
            length = _prefix_decode(s - 256, br)
            dist = _map_distance(_prefix_decode(g[4].read(br), br), xsize)
            if dist > pos:
                raise ValueError("VP8L: backward reference before start")
            for _ in range(length):
                if pos >= n:
                    break
                argb = pix[pos - dist]
                pix[pos] = argb
                if cache is not None:
                    cache[_cache_key(argb, cache_bits)] = argb
                pos += 1
        else:
            if cache is None:
                raise ValueError("VP8L: cache symbol without color cache")
            pix[pos] = cache[s - 280]
            pos += 1
    return np.array(pix, dtype=np.uint32).reshape(ysize, xsize)


# transforms ----------------------------------------------------------------


def _split(argb: int) -> np.ndarray:
    return np.array(
        [(argb >> 24) & 0xFF, (argb >> 16) & 0xFF, (argb >> 8) & 0xFF,
         argb & 0xFF],
        dtype=np.int64,
    )


def _join(ch) -> int:
    return (
        (int(ch[0]) & 0xFF) << 24
        | (int(ch[1]) & 0xFF) << 16
        | (int(ch[2]) & 0xFF) << 8
        | (int(ch[3]) & 0xFF)
    )


def _avg2(a, b):
    return (a + b) // 2


def _trunc_half(d: np.ndarray) -> np.ndarray:
    """C-style (x / 2) — truncation toward zero, incl. negatives."""
    return np.sign(d) * (np.abs(d) // 2)


def _predict_at(out: np.ndarray, x: int, y: int, mode: int, w: int) -> np.ndarray:
    """Predicted [A,R,G,B] for pixel (y,x) given already-final pixels
    in ``out``. Shared by decoder (inverse) and encoder (forward), so
    edge conventions can never disagree between the two directions.
    Edges per spec: (0,0) -> opaque black, row 0 -> LEFT, column 0 ->
    TOP; top-right at the rightmost column wraps to the leftmost pixel
    of the row above (libwebp convention)."""
    if x == 0 and y == 0:
        return np.array([255, 0, 0, 0], dtype=np.int64)
    if y == 0:
        return _split(int(out[0, x - 1]))
    if x == 0:
        return _split(int(out[y - 1, 0]))
    left = _split(int(out[y, x - 1]))
    top = _split(int(out[y - 1, x]))
    topleft = _split(int(out[y - 1, x - 1]))
    topright = (
        _split(int(out[y - 1, x + 1])) if x + 1 < w
        else _split(int(out[y - 1, 0]))
    )
    if mode == 0:
        return np.array([255, 0, 0, 0], dtype=np.int64)
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return topright
    if mode == 4:
        return topleft
    if mode == 5:
        return _avg2(_avg2(left, topright), top)
    if mode == 6:
        return _avg2(left, topleft)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(topleft, top)
    if mode == 9:
        return _avg2(top, topright)
    if mode == 10:
        return _avg2(_avg2(left, topleft), _avg2(top, topright))
    if mode == 11:  # Select: smaller Manhattan error vs L+T-TL; tie -> top
        p = left + top - topleft
        return top if int(np.abs(p - top).sum()) <= int(np.abs(p - left).sum()) else left
    if mode == 12:  # ClampAddSubtractFull
        return np.clip(left + top - topleft, 0, 255)
    if mode == 13:  # ClampAddSubtractHalf
        ave = _avg2(left, top)
        return np.clip(ave + _trunc_half(ave - topleft), 0, 255)
    raise ValueError(f"VP8L: predictor mode {mode}")


def _inv_predictor(pix: np.ndarray, tiles: np.ndarray, bits: int) -> np.ndarray:
    h, w = pix.shape
    out = pix.copy()
    for y in range(h):
        for x in range(w):
            mode = int((tiles[y >> bits, x >> bits] >> 8) & 0xFF)
            pred = _predict_at(out, x, y, mode, w)
            res = _split(int(out[y, x]))
            out[y, x] = _join(res + pred)
    return out


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: both args as signed int8; product >> 5."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _inv_color_transform(
    pix: np.ndarray, tiles: np.ndarray, bits: int
) -> np.ndarray:
    h, w = pix.shape
    out = pix.copy()
    for y in range(h):
        for x in range(w):
            t = int(tiles[y >> bits, x >> bits])
            g2r = t & 0xFF            # blue byte
            g2b = (t >> 8) & 0xFF     # green byte
            r2b = (t >> 16) & 0xFF    # red byte
            argb = int(out[y, x])
            a = (argb >> 24) & 0xFF
            r = (argb >> 16) & 0xFF
            g = (argb >> 8) & 0xFF
            b = argb & 0xFF
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
            out[y, x] = (a << 24) | (r << 16) | (g << 8) | b
    return out


def _inv_subtract_green(pix: np.ndarray) -> np.ndarray:
    g = (pix >> np.uint32(8)) & np.uint32(0xFF)
    r = (((pix >> np.uint32(16)) & np.uint32(0xFF)) + g) & np.uint32(0xFF)
    b = ((pix & np.uint32(0xFF)) + g) & np.uint32(0xFF)
    return (pix & np.uint32(0xFF00FF00)) | (r << np.uint32(16)) | b


def _palette_width_bits(n_colors: int) -> int:
    if n_colors <= 2:
        return 3
    if n_colors <= 4:
        return 2
    if n_colors <= 16:
        return 1
    return 0


def _inv_color_indexing(
    pix: np.ndarray, palette: list[int], orig_w: int
) -> np.ndarray:
    """Undo color-indexing incl. sub-byte bundling; indices live in
    the GREEN channel of the packed image."""
    width_bits = _palette_width_bits(len(palette))
    h = pix.shape[0]
    out = np.zeros((h, orig_w), dtype=np.uint32)
    px_per = 1 << width_bits
    bits_per = 8 >> width_bits
    mask = (1 << bits_per) - 1
    for y in range(h):
        for x in range(orig_w):
            packed = int((pix[y, x >> width_bits] >> 8) & 0xFF)
            idx = (packed >> (bits_per * (x % px_per))) & mask
            out[y, x] = palette[idx] if idx < len(palette) else 0
    return out


def decode_webp(data: bytes) -> np.ndarray:
    """WebP bytes -> uint8 (h, w, 3) RGB (alpha dropped, like the
    other codecs here)."""
    if not is_webp(data):
        raise ValueError("not a WebP (bad RIFF/WEBP header)")
    pos = 12
    payload = None
    while pos + 8 <= len(data):
        fourcc = bytes(data[pos:pos + 4])
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        if fourcc == b"VP8L":
            payload = data[pos + 8:pos + 8 + size]
            break
        if fourcc == b"VP8 ":
            raise NotImplementedError(
                "WebP lossy (VP8) — only lossless VP8L is supported"
            )
        pos += 8 + size + (size & 1)
    if payload is None:
        raise ValueError("WebP: no VP8L chunk found")
    if payload[0] != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    br = _BitReader(bytes(payload[1:]))
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("VP8L: unknown version")

    transforms: list[tuple] = []
    xsize = w
    while br.read(1):
        ttype = br.read(2)
        if ttype in (0, 1):  # predictor / color transform
            bits = 2 + br.read(3)
            tw = (xsize + (1 << bits) - 1) >> bits
            th = (h + (1 << bits) - 1) >> bits
            tiles = _decode_entropy_coded(br, tw, th, False)
            transforms.append((ttype, bits, tiles))
        elif ttype == 2:  # subtract green
            transforms.append((2,))
        else:  # color indexing
            n_colors = br.read(8) + 1
            pal_img = _decode_entropy_coded(br, n_colors, 1, False)
            palette: list[int] = []
            prev = 0
            for i in range(n_colors):  # component-wise delta coding
                cur = int(pal_img[0, i])
                summed = 0
                for shift in (24, 16, 8, 0):
                    comp = (((prev >> shift) & 0xFF) + ((cur >> shift) & 0xFF)) & 0xFF
                    summed |= comp << shift
                palette.append(summed)
                prev = summed
            transforms.append((3, palette, xsize))
            wb = _palette_width_bits(n_colors)
            xsize = (xsize + (1 << wb) - 1) >> wb

    pix = _decode_entropy_coded(br, xsize, h, True)

    for t in reversed(transforms):
        if t[0] == 0:
            pix = _inv_predictor(pix, t[2], t[1])
        elif t[0] == 1:
            pix = _inv_color_transform(pix, t[2], t[1])
        elif t[0] == 2:
            pix = _inv_subtract_green(pix)
        else:
            pix = _inv_color_indexing(pix, t[1], t[2])

    rgb = np.zeros((h, w, 3), dtype=np.uint8)
    rgb[:, :, 0] = (pix >> np.uint32(16)) & np.uint32(0xFF)
    rgb[:, :, 1] = (pix >> np.uint32(8)) & np.uint32(0xFF)
    rgb[:, :, 2] = pix & np.uint32(0xFF)
    return rgb


# ---------------------------------------------------------------- encoding


def _fwd_subtract_green(pix: list[int]) -> list[int]:
    out = []
    for argb in pix:
        g = (argb >> 8) & 0xFF
        r = (((argb >> 16) & 0xFF) - g) & 0xFF
        b = ((argb & 0xFF) - g) & 0xFF
        out.append((argb & 0xFF00FF00) | (r << 16) | b)
    return out


def _fwd_predictor(
    grid: np.ndarray, mode: int, bits: int
) -> tuple[list[int], np.ndarray]:
    """Residual pixel list + the uniform tiles image. Predictions use
    the same ``_predict_at`` the decoder uses, over the decoder's view
    (the progressively reconstructed = original image), so the
    round-trip is exact by construction."""
    h, w = grid.shape
    res: list[int] = []
    for y in range(h):
        for x in range(w):
            pred = _predict_at(grid, x, y, mode, w)
            cur = _split(int(grid[y, x]))
            res.append(_join((cur - pred) & 0xFF))
    tw = (w + (1 << bits) - 1) >> bits
    th = (h + (1 << bits) - 1) >> bits
    tiles = np.full((th, tw), (0xFF << 24) | (mode << 8), dtype=np.uint32)
    return res, tiles


def _tokenize(
    pix: list[int], xsize: int, cache_bits: int, use_lz77: bool
) -> list[tuple]:
    """('lit', argb) | ('copy', length, dist) | ('cache', idx) tokens,
    mirroring the decoder's color-cache updates exactly (incl. inserts
    for every pixel a backward reference copies)."""
    tokens: list[tuple] = []
    cache = [0] * (1 << cache_bits) if cache_bits else None
    n = len(pix)
    pos = 0
    while pos < n:
        if use_lz77:
            best_len, best_dist = 0, 0
            for dist in (1, xsize):
                if 1 <= dist <= pos:
                    ln = 0
                    while (
                        pos + ln < n
                        and ln < 4096
                        and pix[pos + ln - dist] == pix[pos + ln]
                    ):
                        ln += 1
                    if ln > best_len:
                        best_len, best_dist = ln, dist
            if best_len >= 3:
                tokens.append(("copy", best_len, best_dist))
                if cache is not None:
                    for i in range(best_len):
                        v = pix[pos + i]
                        cache[_cache_key(v, cache_bits)] = v
                pos += best_len
                continue
        argb = pix[pos]
        if cache is not None and cache[_cache_key(argb, cache_bits)] == argb:
            tokens.append(("cache", _cache_key(argb, cache_bits)))
        else:
            tokens.append(("lit", argb))
            if cache is not None:
                cache[_cache_key(argb, cache_bits)] = argb
        pos += 1
    return tokens


def _encode_entropy_coded(
    bw: _BitWriter,
    pix: list[int],
    xsize: int,
    allow_meta: bool,
    cache_bits: int = 0,
    use_lz77: bool = True,
) -> None:
    """Write one spatially-coded image (single Huffman group)."""
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if allow_meta:
        bw.write(0, 1)  # no meta-Huffman
    tokens = _tokenize(pix, xsize, cache_bits, use_lz77)
    # distance emission: alternate the 2D-map form ((1,0) -> code 2,
    # (0,1) -> code 1) with the linear form (dist + 120), so BOTH
    # decoder paths are exercised by round-trips
    dist_codes: list[int] = []
    flip = 0
    for t in tokens:
        if t[0] != "copy":
            dist_codes.append(-1)
            continue
        _, _, dist = t
        mapped = None
        if dist == 1:
            mapped = _DIST_MAP_INDEX[(1, 0)]
        elif dist == xsize:
            mapped = _DIST_MAP_INDEX[(0, 1)]
        use_mapped = mapped is not None and flip % 2 == 0
        flip += 1
        dist_codes.append(mapped if use_mapped else dist + 120)

    freqs = [dict() for _ in range(5)]

    def bump(i: int, s: int) -> None:
        freqs[i][s] = freqs[i].get(s, 0) + 1

    for t, dcode in zip(tokens, dist_codes):
        if t[0] == "lit":
            argb = t[1]
            bump(0, (argb >> 8) & 0xFF)
            bump(1, (argb >> 16) & 0xFF)
            bump(2, argb & 0xFF)
            bump(3, (argb >> 24) & 0xFF)
        elif t[0] == "copy":
            bump(0, 256 + _prefix_encode(t[1])[0])
            bump(4, _prefix_encode(dcode)[0])
        else:
            bump(0, 280 + t[1])
    cache_size = (1 << cache_bits) if cache_bits else 0
    alpha_sizes = [256 + 24 + cache_size, 256, 256, 256, 40]
    codes: list[dict[int, tuple[int, int]]] = []
    for i, asize in enumerate(alpha_sizes):
        if not freqs[i]:
            freqs[i] = {0: 1}  # unused code: trivial single-symbol form
        lens = _limited_huffman(freqs[i], 15)
        lengths = [0] * asize
        for s, ln in lens.items():
            lengths[s] = ln
        codes.append(_write_huffman_code(bw, lengths))
    for t, dcode in zip(tokens, dist_codes):
        if t[0] == "lit":
            argb = t[1]
            _write_symbol(bw, codes[0], (argb >> 8) & 0xFF)
            _write_symbol(bw, codes[1], (argb >> 16) & 0xFF)
            _write_symbol(bw, codes[2], argb & 0xFF)
            _write_symbol(bw, codes[3], (argb >> 24) & 0xFF)
        elif t[0] == "copy":
            lcode, lextra, lbits = _prefix_encode(t[1])
            _write_symbol(bw, codes[0], 256 + lcode)
            bw.write(lextra, lbits)
            pcode, pextra, pbits = _prefix_encode(dcode)
            _write_symbol(bw, codes[4], pcode)
            bw.write(pextra, pbits)
        else:
            _write_symbol(bw, codes[0], 280 + t[1])


def _encode_meta_grouped(
    bw: _BitWriter, pix: list[int], xsize: int, ysize: int
) -> None:
    """Write a spatially-coded image with a real meta-Huffman section:
    two groups assigned by tile-parity over 4x4 tiles (huffman_bits=2),
    pure literals (the group lookup is per-pixel; LZ77/cache would not
    add coverage here). Exercises the decoder's entropy-image recursion
    and per-tile group selection."""
    bw.write(0, 1)  # no color cache
    bw.write(1, 1)  # meta-Huffman present
    huff_bits = 2
    bw.write(huff_bits - 2, 3)
    mw = (xsize + 3) >> 2
    mh = (ysize + 3) >> 2
    # meta index = (red << 8) | green; use groups 0/1 in green only
    meta_pix = [
        (0xFF << 24) | ((((tx + ty) & 1)) << 8)
        for ty in range(mh)
        for tx in range(mw)
    ]
    _encode_entropy_coded(bw, meta_pix, mw, False)
    group_of = [
        (((x >> huff_bits) + (y >> huff_bits)) & 1)
        for y in range(ysize)
        for x in range(xsize)
    ]
    # the decoder reads (max meta index + 1) groups — with a single
    # tile only group 0 exists, and writing two groups' codes would
    # desync the stream (soak-caught on <=4x4 images)
    num_groups = max(group_of) + 1
    freqs: list[list[dict]] = [[{}, {}, {}, {}, {}] for _ in range(num_groups)]
    for argb, grp in zip(pix, group_of):
        for i, s in (
            (0, (argb >> 8) & 0xFF), (1, (argb >> 16) & 0xFF),
            (2, argb & 0xFF), (3, (argb >> 24) & 0xFF),
        ):
            freqs[grp][i][s] = freqs[grp][i].get(s, 0) + 1
    alpha_sizes = [256 + 24, 256, 256, 256, 40]
    codes = []
    for grp in range(num_groups):
        gcodes = []
        for i, asize in enumerate(alpha_sizes):
            f = freqs[grp][i] or {0: 1}
            lens = _limited_huffman(f, 15)
            lengths = [0] * asize
            for s, ln in lens.items():
                lengths[s] = ln
            gcodes.append(_write_huffman_code(bw, lengths))
        codes.append(gcodes)
    for argb, grp in zip(pix, group_of):
        _write_symbol(bw, codes[grp][0], (argb >> 8) & 0xFF)
        _write_symbol(bw, codes[grp][1], (argb >> 16) & 0xFF)
        _write_symbol(bw, codes[grp][2], argb & 0xFF)
        _write_symbol(bw, codes[grp][3], (argb >> 24) & 0xFF)


def encode_webp(
    arr: np.ndarray,
    *,
    subtract_green: bool = False,
    predictor_mode: int | None = None,
    color_transform: tuple[int, int, int] | None = None,
    cache_bits: int = 0,
    use_palette: bool = False,
    use_lz77: bool = True,
    use_meta: bool = False,
) -> bytes:
    """uint8 (h, w[, 3]) RGB -> lossless WebP (VP8L in RIFF).

    The knobs select which decoder paths the fixture exercises:
    subtract-green, a uniform-mode predictor transform (any of the 14
    modes), a uniform color transform (g2r, g2b, r2b int8 deltas), a
    color cache, a palette (color-indexing transform with the
    mandatory sub-byte bundling when <= 16 colors), LZ77 runs (dist=1
    overlapping copies + vertical dist=width copies, emitted through
    both the 2D distance map and the linear code space), and a real
    two-group meta-Huffman section (use_meta; literals only).
    use_palette is mutually exclusive with the pixel transforms.
    """
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=2)
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError("VP8L: dimensions must be 1..16384")
    grid = (
        np.uint32(0xFF000000)
        | (arr[:, :, 0].astype(np.uint32) << np.uint32(16))
        | (arr[:, :, 1].astype(np.uint32) << np.uint32(8))
        | arr[:, :, 2].astype(np.uint32)
    )
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)  # version
    xsize = w
    pix: list[int]
    if use_palette:
        if subtract_green or predictor_mode is not None:
            raise ValueError("palette excludes pixel transforms here")
        flat = [int(v) for v in grid.reshape(-1)]
        palette = list(dict.fromkeys(flat))  # first-seen order
        if len(palette) > 256:
            raise ValueError("palette transform needs <= 256 colors")
        index_of = {c: i for i, c in enumerate(palette)}
        bw.write(1, 1)  # transform present
        bw.write(3, 2)  # color indexing
        bw.write(len(palette) - 1, 8)
        deltas = []
        prev = 0
        for c in palette:  # component-wise delta coding
            d = 0
            for shift in (24, 16, 8, 0):
                comp = (((c >> shift) & 0xFF) - ((prev >> shift) & 0xFF)) & 0xFF
                d |= comp << shift
            deltas.append(d)
            prev = c
        _encode_entropy_coded(bw, deltas, len(palette), False)
        wb = _palette_width_bits(len(palette))
        px_per = 1 << wb
        bits_per = 8 >> wb
        xsize = (w + px_per - 1) >> wb
        pix = []
        for y in range(h):
            for xp in range(xsize):
                packed = 0
                for k in range(px_per):
                    x = xp * px_per + k
                    if x < w:
                        packed |= index_of[int(grid[y, x])] << (bits_per * k)
                pix.append((0xFF << 24) | (packed << 8))
    else:
        work = grid
        if subtract_green:
            bw.write(1, 1)
            bw.write(2, 2)  # subtract green
            flat = _fwd_subtract_green([int(v) for v in work.reshape(-1)])
            work = np.array(flat, dtype=np.uint32).reshape(h, w)
        if color_transform is not None:
            # forward = inverse mirrored: stored_red = red - d(g2r, g);
            # stored_blue = blue - d(g2b, g) - d(r2b, red) — the r2b
            # delta uses the ORIGINAL red, which is what the decoder's
            # reconstructed red equals at that point
            g2r, g2b, r2b = (v & 0xFF for v in color_transform)
            bits = 4
            bw.write(1, 1)
            bw.write(1, 2)  # color transform
            bw.write(bits - 2, 3)
            flat = []
            for argb in (int(v) for v in work.reshape(-1)):
                a = (argb >> 24) & 0xFF
                r = (argb >> 16) & 0xFF
                g = (argb >> 8) & 0xFF
                b = argb & 0xFF
                sr = (r - _ct_delta(g2r, g)) & 0xFF
                sb = (b - _ct_delta(g2b, g) - _ct_delta(r2b, r)) & 0xFF
                flat.append((a << 24) | (sr << 16) | (g << 8) | sb)
            work = np.array(flat, dtype=np.uint32).reshape(h, w)
            tw = (w + (1 << bits) - 1) >> bits
            th = (h + (1 << bits) - 1) >> bits
            cte = (0xFF << 24) | (r2b << 16) | (g2b << 8) | g2r
            _encode_entropy_coded(bw, [cte] * (tw * th), tw, False)
        if predictor_mode is not None:
            bits = 4
            bw.write(1, 1)
            bw.write(0, 2)  # predictor
            bw.write(bits - 2, 3)
            res, tiles = _fwd_predictor(work, predictor_mode, bits)
            _encode_entropy_coded(
                bw, [int(v) for v in tiles.reshape(-1)], tiles.shape[1], False
            )
            pix = res
        else:
            pix = [int(v) for v in work.reshape(-1)]
    bw.write(0, 1)  # end of transforms
    if use_meta:
        _encode_meta_grouped(bw, pix, xsize, h)
    else:
        _encode_entropy_coded(bw, pix, xsize, True, cache_bits, use_lz77)
    payload = b"\x2f" + bw.finish()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = _RIFF + struct.pack("<I", 4 + len(chunk)) + _WEBP + chunk
    return riff
