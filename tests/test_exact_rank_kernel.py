"""Differential tests for the _exact_global_rank / _exact_global_ntile
kernel (r8): the bucket-offset formulation must be BIT-IDENTICAL to
the global-window form it replaces, across ties, skew, negatives, and
degenerate single-value distributions — the shapes where bucket
arithmetic or offset accounting would first go wrong."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from insight_gp_import_spark.operators.aggregation import (
    _exact_global_ntile,
    _exact_global_rank,
)


def _cases():
    import random

    rng = random.Random(20260815)
    yield "uniform", [(rng.randint(-1000, 1000), i) for i in range(500)]
    yield "heavy_ties", [(rng.randint(0, 3), i) for i in range(400)]
    yield "all_equal", [(7, i) for i in range(97)]
    yield "two_values_skewed", [(0 if i else 10**12, i) for i in range(300)]
    yield "tiny", [(5, 0), (3, 1)]
    yield "single_row", [(42, 0)]
    # Ranges past 2^63/n_buckets: the integer bucket expression would
    # overflow BIGINT (r8 ADVICE) — these must route through the
    # monotone-double branch and still rank bit-identically.
    yield "wide_range_overflow", [
        (rng.randint(-(2**62), 2**62), i) for i in range(400)
    ]
    yield "wide_range_extremes", [
        (-(2**62) - 100, 0),
        (2**62 + 100, 1),
        (0, 2),
        (-(2**62) - 100, 3),
        (17, 4),
    ]
    yield "wide_range_dense_ties", [
        ((-(2**62) if i % 3 else 2**62) + (i % 7), i) for i in range(350)
    ]


@pytest.mark.parametrize("name,rows", list(_cases()))
def test_rank_matches_global_window(spark, name, rows):
    df = spark.createDataFrame(rows, "v long, tid long").repartition(7)
    got = {
        (r.v, r.tid): r.rk
        for r in _exact_global_rank(df, "v", "tid", "rk").collect()
    }
    want = {
        (r.v, r.tid): r.rk
        for r in df.select(
            "v",
            "tid",
            F.row_number().over(Window.orderBy("v", "tid")).alias("rk"),
        ).collect()
    }
    assert got == want, name


@pytest.mark.parametrize("k", [1, 3, 10])
@pytest.mark.parametrize("name,rows", list(_cases()))
def test_ntile_matches_global_window(spark, k, name, rows):
    df = spark.createDataFrame(rows, "v long, tid long").repartition(7)
    got = {
        (r.v, r.tid): r.bin
        for r in _exact_global_ntile(df, k, "v", "tid", "bin").collect()
    }
    want = {
        (r.v, r.tid): r.bin
        for r in df.select(
            "v",
            "tid",
            F.ntile(k).over(Window.orderBy("v", "tid")).alias("bin"),
        ).collect()
    }
    assert got == want, (name, k)


def test_rank_order_cols_override(spark):
    """Composite sort keys via order_cols: val_col is only the bucket
    proxy (monotone in the leading key); the in-bucket order is the
    full key. Mirrors the string-prefix-pack usage pattern."""
    rows = [(i % 5, f"s{i % 5:02d}", i % 3, i) for i in range(200)]
    df = spark.createDataFrame(rows, "proxy long, s string, b long, tid long")
    got = {
        (r.s, r.b, r.tid): r.rk
        for r in _exact_global_rank(
            df, "proxy", "tid", "rk", order_cols=["s", "b", "tid"]
        ).collect()
    }
    want = {
        (r.s, r.b, r.tid): r.rk
        for r in df.select(
            "s",
            "b",
            "tid",
            F.row_number().over(Window.orderBy("s", "b", "tid")).alias("rk"),
        ).collect()
    }
    assert got == want
