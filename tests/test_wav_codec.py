"""Unit tests for the pure-stdlib WAV codec (round-7).

The a-law / mu-law expansions are pinned against the well-known G.711
constants (mu-law 0x00 -> -32124, 0xFF -> 0, 0x80 -> +32124; a-law
0x55 -> +8, 0x2A -> +32256) and hand-built files — independent of the
vectorized table code — so the companding tables are not
self-certified by round-trips.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from insight_gp_import_spark.wav_codec import decode_wav, encode_wav, is_wav


def _wav_raw(audio_format, channels, rate, bits, payload, extra_chunks=b""):
    fmt = struct.pack("<HHIIHH", audio_format, channels, rate,
                      rate * channels * bits // 8, channels * bits // 8, bits)
    chunks = (extra_chunks
              + b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(payload)) + payload)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
def test_pcm_roundtrip(bits):
    rng = np.random.RandomState(bits)
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    s = rng.randint(max(lo, -(1 << 30)), min(hi, (1 << 30) - 1),
                    (500, 2)).astype(np.int32)
    out, rate = decode_wav(encode_wav(s, 44100, bits=bits))
    assert rate == 44100
    assert out.shape == (500, 2)
    assert np.array_equal(out, s)


def test_float32_roundtrip():
    rng = np.random.RandomState(0)
    s = rng.uniform(-1, 1, (300, 1)).astype(np.float32)
    out, rate = decode_wav(encode_wav(s, 16000, bits=32))
    assert out.dtype == np.float64
    assert np.array_equal(out[:, 0], s[:, 0].astype(np.float64))


def test_mono_1d_input_and_odd_payload_padding():
    s = np.arange(-63, 64, dtype=np.int32)
    data = encode_wav(s, 8000, bits=8)  # 127 bytes -> needs pad byte
    out, rate = decode_wav(data)
    assert out.shape == (127, 1)
    assert np.array_equal(out[:, 0], s)


def test_g711_known_constants():
    """ITU-T G.711 anchor values, independent of the expansion code."""
    mu = _wav_raw(7, 1, 8000, 8, bytes([0x00, 0xFF, 0x80, 0x7F]))
    out, _ = decode_wav(mu)
    assert [int(v) for v in out[:, 0]] == [-32124, 0, 32124, 0]
    al = _wav_raw(6, 1, 8000, 8, bytes([0x55, 0xD5, 0x2A, 0xAA]))
    out, _ = decode_wav(al)
    assert [int(v) for v in out[:, 0]] == [8, -8, 32256, -32256]


def test_g711_monotone_magnitudes():
    """Within each sign half, decoded magnitude is monotone in the
    segment/mantissa ordering — a structural law of both laws that a
    shifted exponent or bias would break."""
    from insight_gp_import_spark.wav_codec import _alaw_expand, _mulaw_expand

    mu_pos = _mulaw_expand(np.arange(0x80, 0x100, dtype=np.int32))
    assert all(np.diff(mu_pos) <= 0)  # 0x80 largest .. 0xFF == 0
    # bytes with bit7 set land in the negative half after the 0x55
    # inversion; magnitudes are never zero (a-law has no true zero)
    a_neg = _alaw_expand(np.arange(0x80, 0x100, dtype=np.int32))
    assert set(np.sign(a_neg)) == {-1}
    a_pos = _alaw_expand(np.arange(0x00, 0x80, dtype=np.int32))
    assert set(np.sign(a_pos)) == {1}
    assert int(np.abs(a_pos).min()) == 8 and int(a_pos.max()) == 32256


def test_chunk_walker_tolerates_extra_chunks():
    s = (np.arange(10, dtype=np.int32) - 5) * 100
    base = encode_wav(s, 22050, bits=16)
    # inject a LIST chunk between WAVE and fmt
    extra = b"LIST" + struct.pack("<I", 6) + b"INFOab"
    fmt_and_data = base[12:]
    data = b"RIFF" + struct.pack("<I", 4 + len(extra) + len(fmt_and_data)) \
        + b"WAVE" + extra + fmt_and_data
    out, rate = decode_wav(data)
    assert rate == 22050
    assert np.array_equal(out[:, 0], s)


def test_refusals():
    assert not is_wav(b"RIFF....WEBP")
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"nope" + b"\x00" * 16)
    with pytest.raises(NotImplementedError, match="ADPCM"):
        decode_wav(_wav_raw(2, 1, 8000, 4, b"\x00\x00"))
    with pytest.raises(ValueError, match="missing"):
        decode_wav(b"RIFF" + struct.pack("<I", 4) + b"WAVE")


def test_encode_rejects_out_of_range_samples():
    """r8 ADVICE fix: out-of-range integer samples must raise a named
    error at encode time (mirroring encode_flac), never wrap via
    astype into a confusing downstream mismatch."""
    import numpy as np
    import pytest

    from insight_gp_import_spark.wav_codec import decode_wav, encode_wav

    for bits, bad in ((8, 128), (8, -129), (16, 1 << 15), (24, -(1 << 23) - 1),
                      (32, 1 << 31)):
        with pytest.raises(ValueError, match=f"{bits}-bit range"):
            encode_wav(np.array([[0], [bad]], dtype=np.int64), 8000, bits=bits)
    # boundary values still encode and round-trip exactly
    for bits in (8, 16, 24, 32):
        lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
        s = np.array([[lo], [hi], [0]], dtype=np.int64)
        out, rate = decode_wav(encode_wav(s, 8000, bits=bits))
        assert np.array_equal(out, s)
