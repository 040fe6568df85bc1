"""Unit tests for the ISO-BMFF box parser (round-7).

Structure pinned by a HAND-BUILT byte layout in the test (independent
of build_mp4), plus round-trips, 64-bit largesize boxes, v1 headers,
unknown-atom tolerance, and malformed-box rejection.
"""

from __future__ import annotations

import struct

import numpy as np  # noqa: F401  (parity with sibling codec tests)
import pytest

from insight_gp_import_spark.mp4_boxes import (
    build_mp4,
    decode_video_frames,
    is_mp4,
    parse_mp4,
)


def test_roundtrip_two_tracks():
    data = build_mp4(600, 1234, [(1, 1920, 1080), (2, 640, 480)])
    meta = parse_mp4(data)
    assert meta["brand"] == "isom"
    assert meta["timescale"] == 600 and meta["duration"] == 1234
    assert meta["duration_ms"] == 1234 * 1000 // 600
    assert [t["track_id"] for t in meta["tracks"]] == [1, 2]
    assert meta["tracks"][0]["width"] == 1920
    assert meta["tracks"][1]["height"] == 480


def test_hand_built_v1_and_largesize_and_unknown_atoms():
    """v1 mvhd (64-bit duration), a 64-bit largesize free box, and a
    vendor atom the parser must skip — all laid out by hand."""
    ftyp = struct.pack(">I", 16) + b"ftypmp42" + struct.pack(">I", 0)
    vendor = struct.pack(">I", 12) + b"xyz " + b"abcd"
    mvhd_payload = (
        struct.pack(">B3x", 1)          # version 1
        + struct.pack(">QQ", 0, 0)      # 64-bit creation/modification
        + struct.pack(">I", 90000)      # timescale
        + struct.pack(">Q", 450000)     # 64-bit duration
        + b"\x00" * 80
    )
    mvhd = struct.pack(">I", 8 + len(mvhd_payload)) + b"mvhd" + mvhd_payload
    moov = struct.pack(">I", 8 + len(vendor) + len(mvhd)) + b"moov" + vendor + mvhd
    free_payload = b"\x00" * 5
    free = struct.pack(">I", 1) + b"free" + struct.pack(">Q", 16 + 5) + free_payload
    meta = parse_mp4(ftyp + free + moov)
    assert meta["brand"] == "mp42"
    assert meta["timescale"] == 90000
    assert meta["duration"] == 450000
    assert meta["duration_ms"] == 5000
    assert meta["tracks"] == []


def test_refusals_and_malformed():
    assert not is_mp4(b"RIFF" + b"\x00" * 20)
    with pytest.raises(ValueError, match="ftyp"):
        parse_mp4(b"\x00" * 20)
    # truncated box: size says 100, only 20 bytes present
    bad = struct.pack(">I", 16) + b"ftypisom" + struct.pack(">I", 0) \
        + struct.pack(">I", 100) + b"moov" + b"\x00" * 8
    with pytest.raises(ValueError, match="malformed"):
        parse_mp4(bad)
    # ftyp but no moov/mvhd anywhere
    with pytest.raises(ValueError, match="mvhd"):
        parse_mp4(struct.pack(">I", 16) + b"ftypisom" + struct.pack(">I", 0))
    with pytest.raises(NotImplementedError, match="H.264"):
        decode_video_frames(b"whatever")
