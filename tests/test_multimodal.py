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
