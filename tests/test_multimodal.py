"""Tests for the multimodal plumbing (binary payloads + mapInPandas)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from insight_gp_import_spark.operators.multimodal import resize_images, with_payload
from insight_gp_import_spark.registry import load_all_ops
from insight_gp_import_spark.tables import load_table

SF = "/root/testdata/sf0.001"
OPS = load_all_ops()


def test_payload_is_binary(spark):
    df = with_payload(load_table(spark, SF, "documents"))
    assert dict(df.dtypes)["payload"] == "binary"
    row = df.first()
    assert isinstance(row.payload, bytearray | bytes)


def test_decode_features_consistent_with_text(spark):
    """The fake decode over bytes must agree with text-derived truth
    (ASCII corpus: byte length == char length)."""
    docs = load_table(spark, SF, "documents")
    got = {r.doc_id: r for r in OPS["mm_decode_features"].fn(spark, SF).collect()}
    want = {
        r.doc_id: (r.n_chars, r.m)
        for r in docs.select("doc_id", "n_chars", F.md5("text").alias("m")).collect()
    }
    assert set(got) == set(want)
    for doc_id, (n_chars, m) in want.items():
        assert got[doc_id].n_bytes == n_chars
        assert got[doc_id].checksum == m
        assert got[doc_id].width % 64 == 0 and 64 <= got[doc_id].width <= 512


def test_resize_fake_plumbing(spark):
    payloads = with_payload(load_table(spark, SF, "documents")).limit(20)
    out = resize_images(payloads, 16, 16, fake=True)
    rows = out.collect()
    assert len(rows) == 20
    assert all(len(r.payload) == 256 for r in rows)


def test_resize_real_raises(spark):
    payloads = with_payload(load_table(spark, SF, "documents")).limit(1)
    with pytest.raises(Exception, match="NotImplementedError|image library"):
        resize_images(payloads, 16, 16).collect()


# ------------------------- real PNG decode path (round-5 verdict item 2) ---


def _png_frame(seed: int, h: int = 24, w: int = 24, channels: int = 3) -> bytes:
    import numpy as np

    from insight_gp_import_spark.png_codec import encode_png

    rng = np.random.RandomState(seed)
    return encode_png(
        rng.randint(0, 256, size=(h, w, channels), dtype=np.int64).astype(np.uint8)
    )


def _png_df(spark, n: int = 6):
    return spark.createDataFrame(
        [(i, bytearray(_png_frame(i))) for i in range(n)],
        "doc_id long, payload binary",
    )


def test_resize_real_png_end_to_end(spark):
    """Real (non-fake) resize through mapInPandas on actual PNG payloads:
    output is valid PNG of the target geometry, pixels match a driver-side
    resize of the same source."""
    import numpy as np

    from insight_gp_import_spark.png_codec import decode_png, resize_nearest

    out = {r.doc_id: bytes(r.payload)
           for r in resize_images(_png_df(spark), 10, 7).collect()}
    assert len(out) == 6
    for doc_id, payload in out.items():
        arr = decode_png(payload)
        assert arr.shape == (7, 10, 3)
        want = resize_nearest(decode_png(_png_frame(doc_id)), 10, 7)
        assert np.array_equal(arr, want)


def test_resize_real_palette_png(spark):
    """Palette (color type 3) PNGs decode via PLTE lookup inside the
    executor-side real path and come back resized as RGB."""
    import struct
    import zlib

    import numpy as np

    from insight_gp_import_spark.png_codec import PNG_SIG, decode_png

    def chunk(ctype, payload):
        return (struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF))

    pal = bytes(v for e in [(200, 10, 10), (10, 200, 10)] for v in e)
    idx = np.tile(np.array([0, 1], dtype=np.uint8), (4, 2))  # 4x4 checker cols
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(4))
    png = (PNG_SIG
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0))
           + chunk(b"PLTE", pal)
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    df = spark.createDataFrame([(1, bytearray(png))], "doc_id long, payload binary")
    (row,) = resize_images(df, 2, 2).collect()
    arr = decode_png(bytes(row.payload))
    assert arr.shape == (2, 2, 3)
    # nearest picks source columns 0,2 -> palette entries 0,1 on every row
    assert [int(v) for v in arr[0, 0]] == [200, 10, 10]
    assert [int(v) for v in arr[0, 1]] == [200, 10, 10]  # col 2 is idx 0
    assert np.array_equal(arr[0], arr[1])


def test_image_phash_real_matches_driver_side(spark):
    """image_phash_real (executor-side mapInPandas) must equal the same
    ahash64 construction run driver-side on the identical PNGs."""
    from insight_gp_import_spark.operators.multimodal import image_phash_real
    from insight_gp_import_spark.png_codec import ahash64, decode_png

    rows = {r.doc_id: r for r in image_phash_real(_png_df(spark)).collect()}
    assert len(rows) == 6
    for doc_id in range(6):
        arr = decode_png(_png_frame(doc_id))
        r = rows[doc_id]
        assert (r.width, r.height) == (arr.shape[1], arr.shape[0])
        assert r.phash == f"{ahash64(arr):016x}"


def test_image_phash_real_webp_dispatch(spark):
    """r7: WebP payloads must route to decode_webp, not fall through
    to the PNG decoder (which would raise on the RIFF magic)."""
    import numpy as np

    from insight_gp_import_spark.operators.multimodal import image_phash_real
    from insight_gp_import_spark.png_codec import ahash64
    from insight_gp_import_spark.vp8l_codec import decode_webp, encode_webp

    img = np.random.RandomState(3).randint(0, 256, (9, 14, 3)).astype(np.uint8)
    blob = encode_webp(img, subtract_green=True)
    df = spark.createDataFrame(
        [(1, bytearray(blob))], "doc_id long, payload binary"
    )
    (row,) = image_phash_real(df).collect()
    assert (row.width, row.height) == (14, 9)
    assert row.phash == f"{ahash64(decode_webp(blob)):016x}"


def test_image_phash_real_deterministic_rerun(spark):
    from insight_gp_import_spark.operators.multimodal import image_phash_real

    a = sorted(map(tuple, image_phash_real(_png_df(spark)).collect()))
    b = sorted(map(tuple, image_phash_real(_png_df(spark)).collect()))
    assert a == b


def test_resize_real_jpeg_end_to_end(spark):
    """Round-6: JPEG payloads through the real mapInPandas resize path —
    output is a valid JPEG of the target geometry whose pixels match a
    driver-side resize of the decoded source (JPEG re-encode is lossy,
    so compare against the same encode driver-side, exactly)."""
    import numpy as np

    from insight_gp_import_spark.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
        is_jpeg,
    )
    from insight_gp_import_spark.png_codec import resize_nearest

    def frame(seed):
        rng = np.random.RandomState(seed)
        x = np.linspace(0, 255, 32)
        g = (np.add.outer(x, x) / 2 + rng.randint(0, 30, (32, 32))).clip(0, 255)
        return encode_jpeg(
            np.stack([g, g.T, 255 - g], axis=2).astype(np.uint8), 90
        )

    df = spark.createDataFrame(
        [(i, bytearray(frame(i))) for i in range(4)],
        "doc_id long, payload binary",
    )
    out = {r.doc_id: bytes(r.payload)
           for r in resize_images(df, 12, 9).collect()}
    assert len(out) == 4
    for doc_id, payload in out.items():
        assert is_jpeg(payload)
        arr = decode_jpeg(payload)
        assert arr.shape == (9, 12, 3)
        want = decode_jpeg(
            encode_jpeg(resize_nearest(decode_jpeg(frame(doc_id)), 12, 9))
        )
        assert np.array_equal(arr, want)


def test_image_phash_real_handles_jpeg(spark):
    """image_phash_real dispatches on magic bytes: JPEG rows hash their
    decoded pixels with the same ahash64 as PNG rows."""
    import numpy as np

    from insight_gp_import_spark.jpeg_codec import decode_jpeg, encode_jpeg
    from insight_gp_import_spark.operators.multimodal import image_phash_real
    from insight_gp_import_spark.png_codec import ahash64

    x = np.linspace(0, 255, 24)
    g = np.add.outer(x, x) / 2
    img = np.stack([g, 255 - g, g.T], axis=2).astype(np.uint8)
    jpg = encode_jpeg(img, 90)
    df = spark.createDataFrame(
        [(7, bytearray(jpg))], "doc_id long, payload binary"
    )
    (row,) = image_phash_real(df).collect()
    assert (row.width, row.height) == (24, 24)
    assert row.phash == f"{ahash64(decode_jpeg(jpg)):016x}"


def test_resize_real_gif_end_to_end(spark):
    """GIF payloads through the real mapInPandas resize path — output
    is a valid GIF of the target geometry; GIF + nearest-neighbor are
    both lossless over the palette, so pixels match a driver-side
    resize EXACTLY."""
    import numpy as np

    from insight_gp_import_spark.gif_codec import decode_gif, encode_gif, is_gif
    from insight_gp_import_spark.png_codec import resize_nearest

    def frame(seed):
        rng = np.random.RandomState(seed)
        pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
        return encode_gif(pal[rng.randint(0, 16, (20, 28))])

    df = spark.createDataFrame(
        [(i, bytearray(frame(i))) for i in range(3)],
        "doc_id long, payload binary",
    )
    out = {r.doc_id: bytes(r.payload)
           for r in resize_images(df, 14, 10).collect()}
    assert len(out) == 3
    for doc_id, payload in out.items():
        assert is_gif(payload)
        arr = decode_gif(payload)
        assert arr.shape == (10, 14, 3)
        want = resize_nearest(decode_gif(frame(doc_id)), 14, 10)
        assert np.array_equal(arr, want)


def test_image_phash_real_handles_gif(spark):
    import numpy as np

    from insight_gp_import_spark.gif_codec import decode_gif, encode_gif
    from insight_gp_import_spark.operators.multimodal import image_phash_real
    from insight_gp_import_spark.png_codec import ahash64

    rng = np.random.RandomState(21)
    pal = rng.randint(0, 256, (8, 3)).astype(np.uint8)
    gif = encode_gif(pal[rng.randint(0, 8, (16, 16))])
    df = spark.createDataFrame(
        [(3, bytearray(gif))], "doc_id long, payload binary"
    )
    (row,) = image_phash_real(df).collect()
    assert (row.width, row.height) == (16, 16)
    assert row.phash == f"{ahash64(decode_gif(gif)):016x}"


def test_resize_real_bmp_end_to_end(spark):
    """BMP payloads through the real resize path — BI_RGB is lossless,
    so pixels match a driver-side resize exactly."""
    import numpy as np

    from insight_gp_import_spark.bmp_codec import decode_bmp, encode_bmp, is_bmp
    from insight_gp_import_spark.png_codec import resize_nearest

    rng = np.random.RandomState(31)
    img = rng.randint(0, 256, (21, 17, 3)).astype(np.uint8)
    df = spark.createDataFrame(
        [(5, bytearray(encode_bmp(img)))], "doc_id long, payload binary"
    )
    (row,) = resize_images(df, 11, 8).collect()
    assert is_bmp(bytes(row.payload))
    out = decode_bmp(bytes(row.payload))
    assert out.shape == (8, 11, 3)
    assert np.array_equal(out, resize_nearest(img, 11, 8))


def test_resize_real_tiff_end_to_end(spark):
    """Uncompressed TIFF through the real resize path — lossless, so
    pixels match a driver-side resize exactly."""
    import numpy as np

    from insight_gp_import_spark.png_codec import resize_nearest
    from insight_gp_import_spark.tiff_codec import (
        decode_tiff,
        encode_tiff,
        is_tiff,
    )

    rng = np.random.RandomState(41)
    img = rng.randint(0, 256, (19, 23, 3)).astype(np.uint8)
    df = spark.createDataFrame(
        [(6, bytearray(encode_tiff(img)))], "doc_id long, payload binary"
    )
    (row,) = resize_images(df, 9, 13).collect()
    assert is_tiff(bytes(row.payload))
    out = decode_tiff(bytes(row.payload))
    assert out.shape == (13, 9, 3)
    assert np.array_equal(out, resize_nearest(img, 9, 13))


def test_mm_image_jpeg_real_law_holds(spark):
    """The quant-aligned JPEG round-trip must be EXACT for every doc
    (exact=1) and the progressive/baseline decode identity must hold
    (prog_eq=1) — the two law columns the driver oracle hashes. Also
    pins dims and that pixel_sum is consistent with the corner pixels'
    closed form (64 * sum of block values)."""
    rows = OPS["mm_image_jpeg_real"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.exact == 1, f"doc {r.doc_id}: JPEG round-trip not exact"
        assert r.prog_eq == 1, f"doc {r.doc_id}: progressive != baseline"
        assert (r.width, r.height) == (32, 32)
        assert r.quality in (65, 75, 85, 90, 97)
        # constant-block image: every pixel in [128-8*q00, 128+6*q00]
        # and px_first/px_last are block values the sum must include.
        assert 0 <= r.px_first <= 255 and 0 <= r.px_last <= 255
        assert r.pixel_sum % 64 == 0
