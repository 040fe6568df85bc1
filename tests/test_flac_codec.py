"""Unit tests for the pure-stdlib FLAC codec (round-7).

Round-trips cover what the encoder emits (CONSTANT/VERBATIM/FIXED,
independent + left-side stereo, multi-frame, 8/16/24-bit). The decoder
paths the encoder never takes — LPC subframes, right-side and
mid-side decorrelation, the Rice escape-to-raw partition, wasted bits
— are exercised by HAND-BUILT frames assembled from the module's bit
primitives but through independent constructions, with expected PCM
computed by the spec formulas in the test itself. CRC and MD5
corruption must be detected.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from insight_gp_import_spark.flac_codec import (
    _BitWriter,
    _crc8,
    _crc16,
    _pcm_md5,
    decode_flac,
    encode_flac,
    is_flac,
)


def _streaminfo(rate, channels, bps, total, md5=b"\x00" * 16):
    si = _BitWriter()
    si.write(4096, 16)
    si.write(4096, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    body = si.bytes() + md5
    return b"fLaC" + bytes([0x80]) + struct.pack(">I", len(body))[1:] + body


def _frame(chan_code, bps_code, blocksize, subframe_writers):
    """Build one frame: header + per-channel subframe writer callbacks
    (each gets the shared _BitWriter) + CRCs."""
    bw = _BitWriter()
    bw.write(0x3FFE, 14)
    bw.write(0, 2)
    bw.write(7, 4)          # 16-bit blocksize at end
    bw.write(0, 4)          # rate from STREAMINFO
    bw.write(chan_code, 4)
    bw.write(bps_code, 3)
    bw.write(0, 1)
    bw.write(0, 8)          # frame number 0
    bw.write(blocksize - 1, 16)
    bw.write(_crc8(bytes(bw.out)), 8)
    for w in subframe_writers:
        w(bw)
    bw.align()
    bw.write(_crc16(bytes(bw.out)), 16)
    return bw.bytes()


def _verbatim_writer(samples, bps):
    def w(bw):
        bw.write(0, 1)      # padding
        bw.write(1, 6)      # VERBATIM
        bw.write(0, 1)      # no wasted bits
        for v in samples:
            bw.write(int(v) & ((1 << bps) - 1), bps)
    return w


@pytest.mark.parametrize("bps,channels", [(8, 1), (16, 2), (24, 2), (16, 1)])
def test_roundtrip_random(bps, channels):
    rng = np.random.RandomState(bps + channels)
    lim = 1 << (bps - 1)
    s = rng.randint(-lim, lim, (1777, channels)).astype(np.int64)
    out, rate = decode_flac(encode_flac(s, 22050, bps=bps, blocksize=576))
    assert rate == 22050
    assert np.array_equal(out, s)


def test_fixed_predictors_compress_smooth_signals():
    t = np.arange(8192)
    s = (5000 * np.sin(t / 80)).astype(np.int64)[:, None]
    enc = encode_flac(s, 16000)
    assert np.array_equal(decode_flac(enc)[0], s)
    assert len(enc) < s.size * 2 * 0.7  # beats raw 16-bit PCM by >30%


def test_left_side_and_constant_and_verbatim():
    rng = np.random.RandomState(4)
    st = rng.randint(-30000, 30000, (2048, 2)).astype(np.int64)
    assert np.array_equal(
        decode_flac(encode_flac(st, 44100, left_side=True))[0], st)
    cs = np.full((700, 1), -42, dtype=np.int64)
    assert np.array_equal(
        decode_flac(encode_flac(cs, 8000, blocksize=256))[0], cs)
    vb = rng.randint(-100, 100, (513, 1)).astype(np.int64)
    assert np.array_equal(
        decode_flac(encode_flac(vb, 8000, force_verbatim=True))[0], vb)


def test_hand_built_lpc_subframe():
    """Order-2 LPC, coefs [3, -1], shift 1: pred = (3*s[i-1] - s[i-2])
    >> 1. Expected PCM computed forward in the test."""
    warm = [100, 103]
    resid = [2, -1, 0, 3, -2, 1]
    n = len(warm) + len(resid)
    expect = list(warm)
    for r in resid:
        pred = (3 * expect[-1] - expect[-2]) >> 1
        expect.append(r + pred)

    def lpc_writer(bw):
        bw.write(0, 1)               # padding
        bw.write(32 + (2 - 1), 6)    # LPC, order 2
        bw.write(0, 1)               # no wasted bits
        for v in warm:
            bw.write(v & 0xFFFF, 16)
        bw.write(15 - 1, 4)          # precision 15
        bw.write(1, 5)               # shift 1
        bw.write(3 & 0x7FFF, 15)     # coef 3
        bw.write((-1) & 0x7FFF, 15)  # coef -1
        bw.write(0, 2)               # 4-bit rice params
        bw.write(0, 4)               # partition order 0
        bw.write(0, 4)               # rice param 0 -> pure unary
        for r in resid:
            u = (r << 1) if r >= 0 else ((-r << 1) - 1)
            for _ in range(u):
                bw.write(0, 1)
            bw.write(1, 1)

    data = _streaminfo(8000, 1, 16, n) + _frame(0, 4, n, [lpc_writer])
    out, _ = decode_flac(data)
    assert [int(v) for v in out[:, 0]] == expect


@pytest.mark.parametrize("chan_code", [9, 10])
def test_hand_built_right_side_and_mid_side(chan_code):
    """Verbatim decorrelated channels; reconstruction formulas from
    the spec, incl. the odd (L+R) parity bit mid-side must carry."""
    L = np.array([100, -5, 32767, -32768, 7], dtype=np.int64)
    R = np.array([99, 5, -32768, 32767, 8], dtype=np.int64)
    side = L - R
    if chan_code == 9:  # right-side: [side(bps+1), right(bps)]
        writers = [_verbatim_writer(side, 17), _verbatim_writer(R, 16)]
    else:  # mid-side: [mid(bps), side(bps+1)], mid = (L+R)>>1
        mid = (L + R) >> 1
        writers = [_verbatim_writer(mid, 16), _verbatim_writer(side, 17)]
    data = _streaminfo(8000, 2, 16, len(L)) + _frame(
        chan_code, 4, len(L), writers)
    out, _ = decode_flac(data)
    assert np.array_equal(out[:, 0], L)
    assert np.array_equal(out[:, 1], R)


def test_hand_built_rice_escape_and_wasted_bits():
    """One FIXED-order-0 subframe whose single partition uses the
    escape (raw 6-bit residuals), with 2 wasted bits: decoded samples
    are the raw values shifted left by 2."""
    raw = [-17, 3, 0, 31, -32, 9, 12, -1]

    def writer(bw):
        bw.write(0, 1)       # padding
        bw.write(8, 6)       # FIXED order 0
        bw.write(1, 1)       # wasted-bits flag
        bw.write(0, 1)       # unary 1 -> wasted = 2? unary value 1 = "01"
        bw.write(1, 1)
        bw.write(0, 2)       # 4-bit rice params
        bw.write(0, 4)       # partition order 0
        bw.write(0xF, 4)     # ESCAPE
        bw.write(6, 5)       # 6-bit raw residuals
        for v in raw:
            bw.write(v & 0x3F, 6)

    data = _streaminfo(8000, 1, 16, len(raw)) + _frame(0, 4, len(raw), [writer])
    out, _ = decode_flac(data)
    assert [int(v) for v in out[:, 0]] == [v << 2 for v in raw]


def test_crc_and_md5_detection():
    rng = np.random.RandomState(9)
    s = rng.randint(-1000, 1000, (600, 1)).astype(np.int64)
    data = bytearray(encode_flac(s, 8000))
    # flip a bit inside the last frame's audio payload
    data[-10] ^= 0x40
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(data))
    # corrupt STREAMINFO md5 only -> frames CRC-clean, md5 must catch it
    good = bytearray(encode_flac(s, 8000))
    good[30] ^= 0xFF  # inside the 16-byte md5 field (offset 8+18..8+34)
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(good))
    out, _ = decode_flac(bytes(good), verify_md5=False)
    assert np.array_equal(out, s)


def test_is_flac_and_refusals():
    assert not is_flac(b"RIFF" + b"\x00" * 10)
    with pytest.raises(ValueError, match="fLaC"):
        decode_flac(b"nope" + b"\x00" * 40)


def test_pcm_md5_matches_flac_convention():
    """little-endian interleaved bytes, bps/8 bytes per sample."""
    s = np.array([[1, -1], [258, -258]], dtype=np.int64)
    import hashlib
    manual = hashlib.md5(
        b"\x01\x00" + b"\xff\xff" + b"\x02\x01" + b"\xfe\xfe"
    ).digest()
    assert _pcm_md5(s, 16) == manual


def test_multibyte_frame_numbers_roundtrip():
    """r8 ADVICE fix: the coded frame number must survive past the
    2-byte UTF-8 form (frame_no >= 0x800 used to overflow the lead
    byte silently and desync into a downstream CRC error). 2100
    frames of blocksize 16 crosses the 2048 boundary; losslessness
    proves every frame header parsed at the right offset."""
    rng = np.random.RandomState(8)
    samples = rng.randint(-2000, 2000, size=(2100 * 16, 1)).astype(np.int64)
    blob = encode_flac(samples, 8000, bps=16, blocksize=16)
    out, rate = decode_flac(blob)
    assert rate == 8000
    assert np.array_equal(out, samples)


def test_multibyte_coded_number_forms():
    """The encoder's UTF-8-style forms must match the decoder's
    _read_utf8_number across every byte-length boundary."""
    from insight_gp_import_spark.flac_codec import _BitReader, _read_utf8_number

    for fn in (0, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10000,
               0x1FFFFF, 0x200000, 0x3FFFFFF, 0x4000000, 0x7FFFFFFF):
        bw = _BitWriter()
        if fn < 0x80:
            bw.write(fn, 8)
        else:
            n_extra = 1
            while fn >= (1 << (6 - n_extra)) << (6 * n_extra):
                n_extra += 1
            assert n_extra <= 5
            lead_prefix = (0xFF << (7 - n_extra)) & 0xFF
            bw.write(lead_prefix | (fn >> (6 * n_extra)), 8)
            for i in range(n_extra - 1, -1, -1):
                bw.write(0x80 | ((fn >> (6 * i)) & 0x3F), 8)
        assert _read_utf8_number(_BitReader(bw.bytes())) == fn
