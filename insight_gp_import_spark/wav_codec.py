"""Pure-stdlib WAV (RIFF/WAVE) audio codec (round-7).

The audio twin of the image codecs: real sample decode for the
mapInPandas audio path instead of the byte-count fake. Scope — the
formats that actually occur in bulk corpora:

- ``decode_wav``: PCM 8-bit unsigned / 16-bit / 24-bit / 32-bit
  signed (format 1), IEEE float32/float64 (format 3), and the G.711
  telephony companding laws — a-law (format 6) and mu-law (format 7)
  — expanded to int16 per the ITU-T tables. Any channel count;
  chunk-walking parser tolerates extra chunks (LIST/fact/cue) in any
  order. Returns (samples int32/float64 array of shape
  (n_frames, channels), sample_rate).
- ``encode_wav``: PCM 8/16/24/32-bit and float32 writer (fixture
  source for round-trips; the a/mu-law DECODE paths are pinned by
  hand-built files in the tests, expanded against the reference
  formula, so the decode tables are not self-certified).

Spec: RIFF WAVE (Microsoft/IBM, 1991; public), ITU-T G.711 for the
companding laws.
"""

from __future__ import annotations

import struct

import numpy as np

_FMT_PCM = 1
_FMT_FLOAT = 3
_FMT_ALAW = 6
_FMT_MULAW = 7


def is_wav(data: bytes) -> bool:
    return bytes(data[:4]) == b"RIFF" and bytes(data[8:12]) == b"WAVE"


def _mulaw_expand(byte_vals: np.ndarray) -> np.ndarray:
    """G.711 mu-law byte -> int16 (the canonical bias-33 expansion)."""
    u = (~byte_vals) & 0xFF
    sign = u & 0x80
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    magnitude = ((mantissa << 3) + 0x84) << exponent
    magnitude = magnitude - 0x84
    out = np.where(sign != 0, -magnitude, magnitude)
    return out.astype(np.int32)


def _alaw_expand(byte_vals: np.ndarray) -> np.ndarray:
    """G.711 a-law byte -> int16 (even-bit inversion 0x55)."""
    a = byte_vals ^ 0x55
    sign = a & 0x80
    exponent = (a >> 4) & 0x07
    mantissa = a & 0x0F
    magnitude = np.where(
        exponent == 0,
        (mantissa << 4) + 8,
        ((mantissa << 4) + 0x108) << (exponent - 1),
    )
    out = np.where(sign != 0, -magnitude, magnitude)
    return out.astype(np.int32)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (samples, sample_rate). Integer formats (incl.
    expanded a/mu-law) return int32 of shape (n_frames, channels);
    float formats return float64."""
    if not is_wav(data):
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    pos = 12
    fmt = None
    payload = None
    while pos + 8 <= len(data):
        cid = bytes(data[pos:pos + 4])
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", bytes(body[:16]))
        elif cid == b"data":
            payload = bytes(body)
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or payload is None:
        raise ValueError("WAV: missing fmt or data chunk")
    audio_format, channels, rate, _brate, _balign, bits = fmt
    if channels < 1:
        raise ValueError("WAV: zero channels")
    if audio_format == _FMT_PCM:
        if bits == 8:
            arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int32) - 128
        elif bits == 16:
            arr = np.frombuffer(payload, dtype="<i2").astype(np.int32)
        elif bits == 24:
            n = len(payload) // 3
            b = np.frombuffer(payload[: n * 3], dtype=np.uint8).reshape(n, 3)
            arr = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            arr = np.where(arr >= 1 << 23, arr - (1 << 24), arr)
        elif bits == 32:
            arr = np.frombuffer(payload, dtype="<i4").astype(np.int32)
        else:
            raise NotImplementedError(f"WAV: {bits}-bit PCM")
    elif audio_format == _FMT_FLOAT:
        if bits == 32:
            arr = np.frombuffer(payload, dtype="<f4").astype(np.float64)
        elif bits == 64:
            arr = np.frombuffer(payload, dtype="<f8").astype(np.float64)
        else:
            raise NotImplementedError(f"WAV: {bits}-bit float")
    elif audio_format == _FMT_ALAW:
        arr = _alaw_expand(np.frombuffer(payload, dtype=np.uint8).astype(np.int32))
    elif audio_format == _FMT_MULAW:
        arr = _mulaw_expand(np.frombuffer(payload, dtype=np.uint8).astype(np.int32))
    else:
        names = {2: "ADPCM", 0x11: "IMA ADPCM", 0x55: "MP3",
                 0xFFFE: "WAVE_FORMAT_EXTENSIBLE"}
        raise NotImplementedError(
            f"WAV format {names.get(audio_format, audio_format)}"
        )
    n_frames = len(arr) // channels
    return arr[: n_frames * channels].reshape(n_frames, channels), rate


def encode_wav(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """(n_frames, channels) or (n_frames,) samples -> WAV bytes.
    Integer input + bits in {8, 16, 24, 32} writes PCM; float input
    requires bits=32 and writes IEEE float."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    is_float = np.issubdtype(samples.dtype, np.floating)
    if not is_float and bits in (8, 16, 24, 32) and samples.size:
        # mirror encode_flac's explicit range check (r7 ADVICE): an
        # out-of-range sample used to wrap silently via astype and
        # surface later as a confusing hash mismatch instead of a
        # named error at encode time.
        lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
        smin, smax = int(samples.min()), int(samples.max())
        if smin < lo or smax > hi:
            raise ValueError(
                f"samples exceed {bits}-bit range "
                f"[{lo}, {hi}]: min={smin} max={smax}"
            )
    if is_float:
        if bits != 32:
            raise ValueError("float WAV is written as 32-bit")
        payload = samples.astype("<f4").tobytes()
        audio_format = _FMT_FLOAT
    elif bits == 8:
        payload = (samples.astype(np.int32) + 128).astype(np.uint8).tobytes()
        audio_format = _FMT_PCM
    elif bits == 16:
        payload = samples.astype("<i2").tobytes()
        audio_format = _FMT_PCM
    elif bits == 24:
        v = samples.astype(np.int64).reshape(-1) & 0xFFFFFF
        b = np.zeros((len(v), 3), dtype=np.uint8)
        b[:, 0] = v & 0xFF
        b[:, 1] = (v >> 8) & 0xFF
        b[:, 2] = (v >> 16) & 0xFF
        payload = b.tobytes()
        audio_format = _FMT_PCM
    elif bits == 32:
        payload = samples.astype("<i4").tobytes()
        audio_format = _FMT_PCM
    else:
        raise ValueError(f"unsupported bits {bits}")
    block_align = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", audio_format, channels, rate,
        rate * block_align, block_align, bits,
    )
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
        + (b"\x00" if len(payload) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
