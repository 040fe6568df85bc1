"""Pure-stdlib ISO-BMFF (MP4/MOV) box-structure parser (round-7).

The video twin of the image/audio codecs, scoped honestly: parsing the
CONTAINER (box tree, movie/track headers — what a bulk pipeline needs
for metadata extraction, duration bucketing, resolution filtering) is
pure struct-walking and is implemented for real; decoding actual video
FRAMES (H.264/AV1/HEVC) is a hardware-codec-class problem and stays a
named NotImplementedError, with frame sampling modeled by
``mm_frame_sample``'s deterministic fake.

- ``parse_mp4``: walks the box tree (32-bit and 64-bit largesize
  boxes), extracts ftyp major brand, mvhd timescale/duration (v0 and
  v1), and per-trak tkhd (track_id, duration, 16.16 fixed-point
  width/height). Unknown boxes are skipped by size — the parser
  tolerates any vendor atoms.
- ``build_mp4``: minimal valid ftyp+moov(mvhd+trak*)+mdat writer —
  the fixture source for round-trip tests.

Spec: ISO/IEC 14496-12 (public; also Apple QuickTime File Format).
All integers big-endian, unlike RIFF.
"""

from __future__ import annotations

import struct


def is_mp4(data: bytes) -> bool:
    return len(data) >= 12 and bytes(data[4:8]) == b"ftyp"


def _iter_boxes(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos:pos + 4])
        btype = bytes(data[pos + 4:pos + 8])
        header = 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack(">Q", data[pos + 8:pos + 16])
            header = 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < header or pos + size > end:
            raise ValueError(f"MP4: malformed box {btype!r} at {pos}")
        yield btype, pos + header, pos + size
        pos += size


def parse_mp4(data: bytes) -> dict:
    """MP4 bytes -> {brand, timescale, duration, duration_ms, tracks}.
    tracks: list of {track_id, duration, width, height} from tkhd
    (width/height are the integer part of the 16.16 fixed values)."""
    if not is_mp4(data):
        raise ValueError("not an MP4 (no ftyp box)")
    out: dict = {"brand": None, "timescale": None, "duration": None,
                 "tracks": []}
    for btype, body, bend in _iter_boxes(data, 0, len(data)):
        if btype == b"ftyp":
            out["brand"] = bytes(data[body:body + 4]).decode("latin-1")
        elif btype == b"moov":
            for mtype, mbody, mend in _iter_boxes(data, body, bend):
                if mtype == b"mvhd":
                    version = data[mbody]
                    if version == 1:
                        ts, dur = struct.unpack(
                            ">IQ", data[mbody + 20:mbody + 32]
                        )
                    else:
                        ts, dur = struct.unpack(
                            ">II", data[mbody + 12:mbody + 20]
                        )
                    out["timescale"], out["duration"] = ts, dur
                elif mtype == b"trak":
                    for ttype, tbody, tend in _iter_boxes(data, mbody, mend):
                        if ttype != b"tkhd":
                            continue
                        version = data[tbody]
                        if version == 1:
                            track_id, = struct.unpack(
                                ">I", data[tbody + 20:tbody + 24]
                            )
                            dur, = struct.unpack(
                                ">Q", data[tbody + 28:tbody + 36]
                            )
                            geo = tbody + 36 + 8 + 6 + 2 + 36
                        else:
                            track_id, = struct.unpack(
                                ">I", data[tbody + 12:tbody + 16]
                            )
                            dur, = struct.unpack(
                                ">I", data[tbody + 20:tbody + 24]
                            )
                            geo = tbody + 24 + 8 + 6 + 2 + 36
                        w_fx, h_fx = struct.unpack(
                            ">II", data[geo:geo + 8]
                        )
                        out["tracks"].append({
                            "track_id": track_id,
                            "duration": dur,
                            "width": w_fx >> 16,
                            "height": h_fx >> 16,
                        })
    if out["timescale"] is None:
        raise ValueError("MP4: no mvhd found")
    out["duration_ms"] = (out["duration"] * 1000) // out["timescale"]
    return out


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def build_mp4(
    timescale: int,
    duration: int,
    tracks: list[tuple[int, int, int]],
    brand: bytes = b"isom",
) -> bytes:
    """Minimal valid MP4: ftyp + moov(mvhd + trak(tkhd)*) + empty
    mdat. tracks: (track_id, width, height); every track gets the
    movie duration."""
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0) + brand + b"mp41")
    matrix = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                         0x40000000)
    mvhd = _box(
        b"mvhd",
        struct.pack(">B3x", 0)                    # version 0, flags
        + struct.pack(">II", 0, 0)                # creation, modification
        + struct.pack(">II", timescale, duration)
        + struct.pack(">I", 0x00010000)           # rate 1.0
        + struct.pack(">H", 0x0100)               # volume 1.0
        + b"\x00" * 10                            # reserved
        + matrix
        + b"\x00" * 24                            # pre_defined
        + struct.pack(">I", len(tracks) + 1),     # next_track_ID
    )
    traks = b""
    for track_id, w, h in tracks:
        tkhd = _box(
            b"tkhd",
            struct.pack(">B", 0) + b"\x00\x00\x07"  # version, flags=enabled
            + struct.pack(">II", 0, 0)              # creation, modification
            + struct.pack(">I", track_id)
            + b"\x00" * 4                           # reserved
            + struct.pack(">I", duration)
            + b"\x00" * 8                           # reserved
            + struct.pack(">hh", 0, 0)              # layer, alt group
            + struct.pack(">H", 0) + b"\x00" * 2    # volume, reserved
            + matrix
            + struct.pack(">II", w << 16, h << 16),
        )
        traks += _box(b"trak", tkhd)
    moov = _box(b"moov", mvhd + traks)
    mdat = _box(b"mdat", b"")
    return ftyp + moov + mdat


def decode_video_frames(data: bytes) -> None:
    """Video FRAME decode is out of pure-stdlib proportion (H.264/
    HEVC/AV1 entropy coders + motion compensation); refuse by name so
    callers can fall back to the deterministic frame-sampling fake."""
    raise NotImplementedError(
        "video frame decode (H.264/HEVC/AV1) — container metadata via "
        "parse_mp4 is supported; frame pixels are not"
    )
