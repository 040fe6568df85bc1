"""Property-based invariants (SURVEY.md §5.2.4) on small literal
DataFrames — hypothesis generates the inputs, Spark must uphold the
algebra. Few examples per property (each example is a Spark job)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

import tests.conftest as _c

SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows = st.lists(
    st.tuples(st.integers(0, 5), st.integers(-100, 100)), min_size=1, max_size=30
)


def _df(spark, data):
    return spark.createDataFrame([(int(k), int(v)) for k, v in data], "k int, v int")


@given(data=rows)
@SETTINGS
def test_union_all_count_additive(spark, data):
    df = _df(spark, data)
    assert df.unionAll(df).count() == 2 * df.count()


@given(left=rows, right=rows)
@SETTINGS
def test_semi_plus_anti_partitions_left(spark, left, right):
    l, r = _df(spark, left), _df(spark, right)
    semi = l.join(r, "k", "left_semi").count()
    anti = l.join(r, "k", "left_anti").count()
    assert semi + anti == l.count()


@given(data=rows)
@SETTINGS
def test_window_running_sum_ends_at_group_total(spark, data):
    df = _df(spark, data).withColumn(
        "rid", F.monotonically_increasing_id()
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("k")
        .orderBy("rid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = df.withColumn("rs", F.sum("v").over(w))
    last_per_group = (
        running.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("k").orderBy(F.desc("rid"))),
        )
        .filter(F.col("rn") == 1)
        .select("k", F.col("rs").alias("total"))
    )
    direct = df.groupBy("k").agg(F.sum("v").alias("total"))
    assert sorted(map(tuple, last_per_group.collect())) == sorted(
        map(tuple, direct.collect())
    )


@given(data=rows)
@SETTINGS
def test_dedup_idempotent(spark, data):
    df = _df(spark, data)
    once = df.dropDuplicates(["k"])
    twice = once.dropDuplicates(["k"])
    assert sorted(r.k for r in once.collect()) == sorted(r.k for r in twice.collect())


def test_events_load_zone_independent(spark):
    """A foreign session in a non-UTC zone must still read events with
    UTC-parity values: ensure_events_read_confs pins timeZone=UTC before
    the NTZ cast (ADVICE r2 — without the pin every ts shifts by the
    session zone offset and oracle parity breaks)."""
    import duckdb

    from insight_gp_import_spark import tables

    orig = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        tables._SCAN_CACHE.pop(spark, None)  # drop plans built under UTC
        ev = tables.load_events(spark, _c.SF01)
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        got = ev.agg(F.min("ts").alias("mn"), F.max("ts").alias("mx")).collect()[0]
        exp = duckdb.sql(
            f"SELECT min(ts), max(ts) FROM read_parquet('{_c.SF01}/events.parquet')"
        ).fetchone()
        assert (str(got["mn"]), str(got["mx"])) == (str(exp[0]), str(exp[1]))
    finally:
        spark.conf.set("spark.sql.session.timeZone", orig)
        tables._SCAN_CACHE.pop(spark, None)


ts_rows = st.lists(
    st.tuples(st.integers(0, 1), st.integers(0, 2000)),  # (kind, t_us)
    min_size=1,
    max_size=40,
)


@given(data=ts_rows)
@SETTINGS
def test_bucketed_interval_join_equals_naive(spark, data):
    """The equi-key-recovery technique behind join_interval_bucketed:
    for ANY point set, bucket-join + residual filter must produce
    exactly the naive theta-join pairs (window (t, t+W], W = bucket
    width — a window spans at most buckets k and k+1)."""
    W = 100
    df = spark.createDataFrame(
        [(i, int(k), int(t)) for i, (k, t) in enumerate(data)],
        "rid int, kind int, t long",
    )
    a = df.filter(F.col("kind") == 0).select(
        F.col("rid").alias("a_id"), F.col("t").alias("a_t")
    )
    b = df.filter(F.col("kind") == 1).select(
        F.col("rid").alias("b_id"),
        F.col("t").alias("b_t"),
        F.expr(f"t div {W}").alias("bucket"),
    )
    naive = a.join(
        b.drop("bucket"),
        (F.col("b_t") > F.col("a_t")) & (F.col("b_t") <= F.col("a_t") + W),
    ).select("a_id", "b_id")
    probes = a.select(
        "a_id",
        "a_t",
        F.explode(
            F.array(F.expr(f"a_t div {W}"), F.expr(f"a_t div {W} + 1"))
        ).alias("bucket"),
    )
    bucketed = (
        probes.join(b, "bucket")
        .filter(
            (F.col("b_t") > F.col("a_t")) & (F.col("b_t") <= F.col("a_t") + W)
        )
        .select("a_id", "b_id")
    )
    assert sorted(map(tuple, naive.collect())) == sorted(
        map(tuple, bucketed.collect())
    )


snap_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(-9, 9)),
    min_size=1,
    max_size=30,
    unique_by=lambda r: (r[0], r[1]),  # one snapshot per (key, time)
)


@given(data=snap_rows, cut=st.integers(10, 40))
@SETTINGS
def test_scd2_incremental_equals_rebuild(spark, data, cut):
    """The merged-incremental ≡ rebuilt invariant behind
    merge_scd2_incremental, on ARBITRARY snapshot streams and an
    arbitrary history/delta cutoff."""
    from pyspark.sql.window import Window as W_

    df = spark.createDataFrame(
        [(int(k), int(t), int(v)) for k, t, v in data], "k int, t int, v int"
    )
    w = W_.partitionBy("k").orderBy("t")

    def scd2(d):
        nxt = F.lead("t").over(w)
        return d.select(
            "k",
            F.col("t").alias("vf"),
            nxt.alias("vt"),
            nxt.isNull().alias("cur"),
            "v",
        )

    full = scd2(df)
    hist = scd2(df.filter(F.col("t") <= cut))
    delta = df.filter(F.col("t") > cut)
    first_delta = delta.groupBy("k").agg(F.min("t").alias("close_at"))
    closed = hist.join(first_delta, "k", "left").select(
        "k",
        "vf",
        F.when(
            F.col("cur") & F.col("close_at").isNotNull(), F.col("close_at")
        )
        .otherwise(F.col("vt"))
        .alias("vt"),
        (F.col("cur") & F.col("close_at").isNull()).alias("cur"),
        "v",
    )
    merged = closed.unionByName(scd2(delta))
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, merged.collect())
    )
