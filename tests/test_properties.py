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
