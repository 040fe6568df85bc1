"""Aggregation operators (SURVEY.md §2.D).

Greenplum-side aggregation in the reference's warehouse queries,
re-expressed as Spark hash aggregates. All doubles rounded in the final
projection per the determinism protocol (SURVEY.md §2.X); partial
(map-side) aggregation and whole-stage codegen come free from Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from insight_gp_import_spark.registry import op, tracked_persist
from insight_gp_import_spark.tables import load_table

CAT = "aggregation"


@op(
    "agg_global",
    oracle="""
    SELECT COUNT(*) AS cnt,
           ROUND(SUM(l_extendedprice), 2) AS sum_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           ROUND(MIN(l_quantity), 2) AS min_qty,
           ROUND(MAX(l_quantity), 2) AS max_qty
    FROM lineitem
    """,
    category=CAT,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped count/sum/avg/min/max — single-row global aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("cnt"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.round(F.min("l_quantity"), 2).alias("min_qty"),
        F.round(F.max("l_quantity"), 2).alias("max_qty"),
    )


@op(
    "agg_hash_groupby",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           COUNT(*) AS count_order,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    category=CAT,
)
def agg_hash_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 pricing summary (TPC-H Q1 shape) — the flagship query.

    scan → pushed filter → hash aggregate; Catalyst plans a partial
    aggregate before the shuffle so only 6 groups cross the exchange.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("count_order"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        )
    )


@op(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS cnt,
           COUNT(DISTINCT l_partkey) AS cnt_parts,
           COUNT(DISTINCT l_suppkey) AS cnt_supps
    FROM lineitem
    GROUP BY l_returnflag
    """,
    category=CAT,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT x), several per group (expand-based in Spark)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("cnt"),
        F.countDistinct("l_partkey").alias("cnt_parts"),
        F.countDistinct("l_suppkey").alias("cnt_supps"),
    )


APPROX_DISTINCT_BOUND_PCT = 6  # 3x the configured rsd (0.02) — the ~3σ band


@op(
    "agg_approx_distinct",
    oracle=f"""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           true AS approx_within_bound
    FROM lineitem GROUP BY l_returnflag
    """,
    category=CAT,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct, gated by a LAW oracle (r8 verdict
    item 3, the dq_hll_error_bound pattern): the sketch ESTIMATE is
    engine-specific and can never hash-match DuckDB, so the hashed
    relation carries the EXACT distinct count (independently recomputed
    by DuckDB) plus a bounded-error VERDICT — Spark must compute
    |approx − exact|·100 ≤ {APPROX_DISTINCT_BOUND_PCT}·exact in integer
    arithmetic and arrive at `true`; any sketch regression breaks the
    hash. Bound: 3× the configured rsd (0.02 → 6 %); measured max
    relative error across sf0.01/sf0.1/sf1 is 1.45 %, so the verdict
    has ≥4× margin while still catching a broken sketch (which errs by
    whole multiples, not fractions of σ). Exact + approx come from ONE
    aggregate (shared scan, two buffer states).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").cast("bigint").alias("exact_parts"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
    ).select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts")) * 100
            <= APPROX_DISTINCT_BOUND_PCT * F.col("exact_parts")
        ).alias("approx_within_bound"),
    )


@op(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS cnt,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
    category=CAT,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS incl. grand total (bench B10). NULL markers align."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("igis_orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS cnt,
               ROUND(SUM(o_totalprice), 2) AS sum_price
        FROM igis_orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        """
    )


@op(
    "agg_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS cnt,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    category=CAT,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy: (status, priority) → (status) → ()."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("cnt"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


@op(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS cnt,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    category=CAT,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 4 grouping combinations of (returnflag, linestatus)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@op(
    "agg_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS cnt,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 15
    """,
    category=CAT,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .filter(F.col("cnt") >= 15)
    )


@op(
    "agg_collect_sorted",
    oracle="""
    SELECT l_orderkey,
           string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS lines
    FROM lineitem
    GROUP BY l_orderkey
    """,
    category=CAT,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group list, deterministically sorted and serialized to a string.

    Serialization (array_join) dodges array-representation hashing
    (§2.X rule 3); sort_array makes collect_list order-insensitive.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("l_linenumber")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("lines")
    )


@op(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_extendedprice), 4) AS std_price,
           ROUND(var_samp(l_quantity), 4) AS var_qty,
           ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           ROUND(quantile_cont(l_extendedprice, 0.5), 2) AS median_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    category=CAT,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates; percentile ≡ quantile_cont (probe-6)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("std_price"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 2).alias("median_price"),
    )


@op(
    "agg_pivot",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click') AS click,
           COUNT(*) FILTER (WHERE event_type = 'error') AS error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
           COUNT(*) FILTER (WHERE event_type = 'view') AS view
    FROM events
    GROUP BY user_id
    """,
    category=CAT,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type → columns. Explicit pivot values (§2.D: never
    inferred — inference adds a scan AND can diverge from the oracle);
    coalesce(…,0) because Spark pivot yields NULL for absent combos where
    COUNT FILTER yields 0."""
    ev = load_table(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    pivoted = (
        ev.groupBy("user_id").pivot("event_type", kinds).agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "user_id",
        *[F.coalesce(F.col(k), F.lit(0)).alias(k) for k in kinds],
    )


MELT_MEASURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@op(
    "agg_unpivot",
    oracle="""
    SELECT metric,
           COUNT(*) AS cnt,
           ROUND(SUM(value), 2) AS sum_value,
           ROUND(AVG(value), 4) AS avg_value
    FROM (
        SELECT 'l_quantity' AS metric, l_quantity AS value FROM lineitem
        UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        UNION ALL SELECT 'l_tax', l_tax FROM lineitem
    ) long
    GROUP BY metric
    """,
    category=CAT,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) wide measure columns into long (metric, value)
    rows, then summarize per metric — the wide→long reshape feature
    pipelines need before per-metric stats. Spark's native `unpivot`
    expands rows inside the scan stage (no shuffle until the agg), so
    at 100 TB the cost is the same single pass a SELECT would make;
    the alternative UNION-of-scans reads the table once per measure."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot([], MELT_MEASURES, "metric", "value")
    return long.groupBy("metric").agg(
        F.count("*").alias("cnt"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )


SALT_BUCKETS = 16


@op(
    "agg_salted_skew",
    oracle="""
    SELECT event_type,
           COUNT(*) AS cnt,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY event_type
    """,
    category=CAT,
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation — the skewed-hot-key recipe.

    events has only 5 event_type values, the worst-case skew shape: a
    plain groupBy sends every 'view' row to ONE reducer. Salting splits
    each hot key into SALT_BUCKETS sub-keys for the first (heavy)
    shuffle, then combines the tiny partials in a second shuffle of
    |keys|×|salts| rows. Identical result to the direct groupBy (the
    oracle IS the direct formulation); at 100 TB this is the difference
    between one straggler reducer and even utilization. (AQE skew-join
    handles join skew automatically; agg skew still wants the salt.)
    The salt is derived from event_id — deterministic, no RNG (§2.X).
    """
    ev = load_table(spark, sf_dir, "events")
    partial = (
        ev.withColumn("salt", (F.col("event_id") % SALT_BUCKETS).cast("int"))
        .groupBy("event_type", "salt")
        .agg(F.count("*").alias("p_cnt"), F.sum("value").alias("p_sum"))
    )
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum("p_cnt").alias("cnt"),
            F.round(F.sum("p_sum"), 2).alias("sum_value"),
        )
    )


AQ_ACCURACY = 1000  # approx_percentile accuracy: rank error <= n/accuracy


@op(
    "agg_approx_quantile",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           true AS p50_rank_ok, true AS p95_rank_ok
    FROM events GROUP BY event_type
    """,
    category=CAT,
)
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based quantiles (approx_percentile, Greenwald-Khanna),
    gated by the sketch's own DECLARED guarantee as a LAW oracle (r8
    verdict item 3, the dq_quantile_sketch_bound pattern): the
    estimate VALUE is engine-specific, but GK promises the returned
    element's RANK sits within n/accuracy of the target rank — an
    engine-independent law. Spark computes rank(v̂) = |{v ≤ v̂}| per
    group (one broadcast join of the 5-row estimate table back onto
    events — no sort, no window) and must find
    |rank·10⁵ − q·10⁵·n| ≤ 100·n + 10⁵ (the guarantee n/1000 plus one
    row of slack for the q·n discretization, all BIGINT: rank ≤ 2·10⁵
    at sf1 keeps the product ≪ 2⁶³). Measured max rank error across
    sf0.01/sf0.1/sf1 is 0.00101·n — AT the declared n/1000 edge, which
    is why the law tests the guarantee and not a tighter invented
    bound. DuckDB independently recomputes n; a sketch regression
    (rank drift beyond the envelope) flips a verdict and breaks the
    hash. Estimates come from one scan; the rank pass is a second
    scan with a broadcast 5-row join — no shuffle of events."""
    ev = load_table(spark, sf_dir, "events")
    est = ev.groupBy("event_type").agg(
        F.expr("approx_percentile(value, 0.5, 1000)").alias("p50"),
        F.expr("approx_percentile(value, 0.95, 1000)").alias("p95"),
    )
    ranked = ev.join(F.broadcast(est), "event_type").groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum((F.col("value") <= F.col("p50")).cast("bigint")).alias("rk50"),
        F.sum((F.col("value") <= F.col("p95")).cast("bigint")).alias("rk95"),
    )
    slack = F.lit(100) * F.col("n") + F.lit(100000)
    return ranked.select(
        "event_type",
        "n",
        (F.abs(F.col("rk50") * 100000 - 50000 * F.col("n")) <= slack)
        .alias("p50_rank_ok"),
        (F.abs(F.col("rk95") * 100000 - 95000 * F.col("n")) <= slack)
        .alias("p95_rank_ok"),
    )


@op(
    "agg_funnel_conversion",
    oracle="""
    WITH s AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup'
                        THEN CAST(ts AS TIMESTAMP) END) AS t_signup,
               min(CASE WHEN event_type = 'view'
                        THEN CAST(ts AS TIMESTAMP) END) AS t_view,
               min(CASE WHEN event_type = 'purchase'
                        THEN CAST(ts AS TIMESTAMP) END) AS t_purchase
        FROM events GROUP BY user_id
    )
    SELECT count(*) AS users,
           CAST(sum(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS signed_up,
           CAST(sum(CASE WHEN t_signup IS NOT NULL AND t_view > t_signup
                    THEN 1 ELSE 0 END) AS BIGINT) AS viewed_after,
           CAST(sum(CASE WHEN t_signup IS NOT NULL AND t_view > t_signup
                    AND t_purchase > t_view THEN 1 ELSE 0 END)
                AS BIGINT) AS purchased_after
    FROM s
    """,
    category=CAT,
)
def agg_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis: signup → first later view → first later purchase
    conversion counts across users — the event-analytics staple, done as
    ONE conditional-min aggregation per user plus a global rollup (no
    self-joins: the naive 3-way events⋈events⋈events formulation
    shuffles the fact table three times; conditional aggregation
    shuffles it once on user_id, then the per-user stage table is tiny).

    Timestamp comparisons happen on µs-truncated values on both sides
    (the events ns-recipe / CAST AS TIMESTAMP — §1.3), so boundary
    flake is impossible.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    stage2 = F.col("t_signup").isNotNull() & (F.col("t_view") > F.col("t_signup"))
    stage3 = stage2 & (F.col("t_purchase") > F.col("t_view"))
    return per_user.agg(
        F.count("*").alias("users"),
        F.sum(F.when(F.col("t_signup").isNotNull(), 1).otherwise(0)).alias(
            "signed_up"
        ),
        F.sum(F.when(stage2, 1).otherwise(0)).alias("viewed_after"),
        F.sum(F.when(stage3, 1).otherwise(0)).alias("purchased_after"),
    )


HIST_BUCKET_WIDTH = 50000


@op(
    "agg_histogram",
    oracle=f"""
    SELECT CAST(floor(o_totalprice / {HIST_BUCKET_WIDTH}) AS BIGINT) AS bucket,
           count(*) AS cnt,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM orders GROUP BY 1
    """,
    category=CAT,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals: bucket id + count + the
    observed min/max inside each bucket. Bucketing is a scan-side
    projection (floor division — no width_bucket dialect drift), so the
    whole histogram is one map-side-combined aggregation over ~10 keys;
    at 100 TB this is the profile-a-column primitive that costs one
    pass and ~no shuffle (10 groups × partial rows).
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn(
            "bucket", (F.col("o_totalprice") / F.lit(HIST_BUCKET_WIDTH)).cast("long")
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@op(
    "agg_retention_cohort",
    oracle="""
    WITH f AS (
        SELECT user_id, min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS cohort_day
        FROM events GROUP BY user_id
    ), a AS (
        SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
        FROM events
    )
    SELECT cohort_day,
           CAST(datediff('day', cohort_day, d) // 7 AS BIGINT) AS offset_w,
           count(DISTINCT user_id) AS active_users
    FROM a JOIN f USING (user_id) GROUP BY 1, 2
    """,
    category=CAT,
)
def agg_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen date
    (cohort), counted per whole-week offset of later activity — the
    second event-analytics staple next to agg_funnel_conversion.

    Day-level cohorts on purpose: date_trunc('week') week-start
    conventions are dialect bait, while µs-truncated ts → DATE and
    day-diff ÷ 7 are engine-identical (verified sf0.01+sf0.1).

    Scale: two aggregations over events, both keyed on user_id (first
    shuffle) then the tiny (cohort, offset) grid; the distinct-day
    projection collapses the fact table before the join, so the join
    input is |users| × |active days|, not |events|.
    """
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_day"))
    act = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    return (
        act.join(first, "user_id")
        .withColumn(
            "offset_w", (F.datediff("d", "cohort_day") / F.lit(7)).cast("long")
        )
        .groupBy("cohort_day", "offset_w")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@op(
    "agg_mode_per_group",
    oracle="""
    SELECT user_id, event_type AS mode_type, n FROM (
        SELECT user_id, event_type, count(*) AS n,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY count(*) DESC, event_type) AS rn
        FROM events GROUP BY user_id, event_type
    )
    WHERE rn = 1
    """,
    category=CAT,
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode (most frequent event_type per user) with an
    alphabetical tie-break so the winner is deterministic (§2.X rule 2
    applied to a window, not a LIMIT). count-then-row_number beats
    Spark's native ``F.mode`` here: mode's tie choice is
    engine-internal, the explicit window is portable and identically
    phrased in the oracle.

    Scale: the count collapses events to ≤5 rows per user before the
    window, so the window partition is bounded regardless of fact size.
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    cnts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), "event_type")
    return (
        cnts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_type"), "n")
    )


@op(
    "agg_incremental_merge",
    oracle="""
    WITH prior AS (
        SELECT o_orderpriority, count(*) AS cnt, sum(o_totalprice) AS sm
        FROM orders WHERE o_orderkey % 4 < 3 GROUP BY 1
    ), delta AS (
        SELECT o_orderpriority, count(*) AS cnt, sum(o_totalprice) AS sm
        FROM orders WHERE o_orderkey % 4 = 3 GROUP BY 1
    ), merged AS (
        SELECT o_orderpriority,
               CAST(sum(cnt) AS BIGINT) AS n_orders,
               sum(sm) AS sum_raw
        FROM (SELECT * FROM prior UNION ALL SELECT * FROM delta) u
        GROUP BY 1
    )
    SELECT o_orderpriority, n_orders,
           round(sum_raw, 2) AS sum_total,
           round(sum_raw / n_orders, 4) AS avg_total
    FROM merged
    """,
    category=CAT,
)
def agg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: a materialized per-priority
    aggregate (batches ≡0..2 mod 4) absorbs a new batch (≡3) by merging
    PARTIAL states — counts and sums add, avg re-derives — instead of
    rescanning history. This is the algebra behind every incremental
    warehouse rollup; test_aggregation asserts merged ≡ full recompute.

    Scale shape: the prior state is |groups| rows read back from the
    materialized store (here recomputed from the batch slice for
    hash-checkability); only the delta batch is scanned at load time —
    at 100 TB that's the difference between scanning one day and
    scanning ten years. The merge itself is a map-side-combined agg
    over |groups|·2 rows: free.
    """
    orders = load_table(spark, sf_dir, "orders")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count("*").alias("cnt"), F.sum("o_totalprice").alias("sm")
        )

    prior = partial(orders.filter(F.col("o_orderkey") % 4 < 3))
    delta = partial(orders.filter(F.col("o_orderkey") % 4 == 3))
    merged = (
        prior.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(F.sum("cnt").alias("n_orders"), F.sum("sm").alias("sum_raw"))
    )
    return merged.select(
        "o_orderpriority",
        "n_orders",
        F.round("sum_raw", 2).alias("sum_total"),
        F.round(F.col("sum_raw") / F.col("n_orders"), 4).alias("avg_total"),
    )


@op(
    "agg_median_exact",
    oracle="""
    WITH cents AS (
        SELECT o_orderpriority,
               CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
        FROM orders
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(quantile_cont(price_c, 0.5), 1) AS median_c,
           round(quantile_cont(price_c, 0.9), 1) AS p90_c
    FROM cents GROUP BY o_orderpriority
    """,
    category=CAT,
)
def agg_median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group median / p90 — the no-sketch percentile path
    (agg_approx_quantile is the sketch twin). Exact percentiles need
    the full sorted group; Spark's `percentile` aggregates a per-group
    value buffer instead of a global sort, so the shuffle key stays
    o_orderpriority and groups parallelize — viable while a single
    group's distinct-value footprint fits an executor (true here;
    at 100 TB prefer the sketch twin or pre-aggregate to (group,
    value, freq) counts first, which `percentile` accepts natively).

    Determinism: quantiles over integer cents land interpolation on
    exact .0/.5 doubles (win_quantile_bin_global's probe), so Spark
    `percentile` == DuckDB `quantile_cont` bit-for-bit; round(…, 1)
    is belt-and-braces, not load-bearing.
    """
    cents = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_c"),
    )
    return cents.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.expr("percentile(price_c, 0.5)"), 1).alias("median_c"),
        F.round(F.expr("percentile(price_c, 0.9)"), 1).alias("p90_c"),
    )


HLL_MERGE_BOUND_PCT = 5  # ~3σ at the default lgConfigK=12 (rsd ≈ 1.6 %)
HLL_MERGE_DVM_PCT = 4  # direct-vs-merged drift: HIP → composite switch


@op(
    "agg_hll_partial_merge",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact,
           true AS direct_within_bound,
           true AS merged_within_bound,
           true AS merged_vs_direct_ok
    FROM orders GROUP BY o_orderpriority
    """,
    category=CAT,
)
def agg_hll_partial_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL via
    Spark's hll_sketch_agg / hll_union_agg): build per-shard PARTIAL
    sketches, then merge — the incremental-maintenance path for
    distinct counts, the one aggregate agg_incremental_merge cannot
    cover with (count, sum) states. At 100 TB this is how daily
    distinct-user counts roll up to monthly without rescanning history:
    store one small sketch per (group, day), union on demand.

    Merged and direct estimates agree closely but not bit-exactly:
    DataSketches HLL serves directly-built sketches from the HIP
    (historical inverse probability) estimator, which a union
    invalidates — the merged sketch falls back to the composite
    estimator. LAW oracle (r8 verdict item 3, graduated from
    rows-only via the dq_hll_error_bound pattern): the hashed relation
    carries the EXACT count (DuckDB recomputes it independently) plus
    three integer-arithmetic VERDICTS Spark must land at `true` —
    direct and merged each within {HLL_MERGE_BOUND_PCT} % of exact
    (~3σ at the default lgConfigK=12; measured max across
    sf0.01/sf0.1/sf1 is 2.43 %) and merged-vs-direct within
    {HLL_MERGE_DVM_PCT} % (measured max 1.15 % — the HIP/composite
    estimator gap). Estimates are quantized to BIGINT before the
    comparison so the verdicts are pure integer arithmetic; a sketch
    or union regression flips a verdict and breaks the hash.
    """
    orders = load_table(spark, sf_dir, "orders")
    direct = orders.groupBy("o_orderpriority").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("est_direct"),
        F.count_distinct("o_custkey").cast("bigint").alias("n_exact"),
    )
    partials = orders.withColumn(
        "shard", F.pmod(F.col("o_orderkey"), F.lit(8))
    ).groupBy("o_orderpriority", "shard").agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    merged = partials.groupBy("o_orderpriority").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_merged")
    )
    ed = F.col("est_direct").cast("bigint")
    em = F.col("est_merged").cast("bigint")
    ex = F.col("n_exact")
    return direct.join(merged, "o_orderpriority").select(
        "o_orderpriority",
        "n_exact",
        (F.abs(ed - ex) * 100 <= HLL_MERGE_BOUND_PCT * ex)
        .alias("direct_within_bound"),
        (F.abs(em - ex) * 100 <= HLL_MERGE_BOUND_PCT * ex)
        .alias("merged_within_bound"),
        (F.abs(ed - em) * 100 <= HLL_MERGE_DVM_PCT * ex)
        .alias("merged_vs_direct_ok"),
    )


@op(
    "agg_bitmap_distinct",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct
    FROM orders GROUP BY o_orderpriority
    """,
    category=CAT,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via mergeable bitmap partial states —
    the precise counterpart to agg_hll_partial_merge's sketches, and
    (unlike sketches) fully oracle-checkable: the answer must equal
    count(DISTINCT) bit-for-bit.

    Pattern: bitmap_bucket_number/bitmap_bit_position split the key
    space into fixed 32 KB buckets; per-shard bitmaps
    (bitmap_construct_agg) OR together (bitmap_or_agg) into one bitmap
    per (group, bucket), whose set bits (bitmap_count) sum to the
    exact distinct count. Why it matters at 100 TB: count(DISTINCT)
    cannot be maintained incrementally, but these bitmaps can — store
    per-(group, bucket, day) bitmaps and any date range's exact
    distinct is a pure merge (no rescan), same shape as
    agg_incremental_merge's (count, sum) states. Dense-key footprint:
    one bit per possible key, bucketed so only touched buckets
    materialize."""
    orders = load_table(spark, sf_dir, "orders")
    keyed = orders.select(
        "o_orderpriority",
        F.expr("bitmap_bucket_number(o_custkey)").alias("bkt"),
        F.expr("bitmap_bit_position(o_custkey)").alias("pos"),
        F.pmod(F.col("o_orderkey"), F.lit(8)).alias("shard"),
    )
    shard_partials = keyed.groupBy("o_orderpriority", "bkt", "shard").agg(
        F.expr("bitmap_construct_agg(pos)").alias("bm")
    )
    merged = shard_partials.groupBy("o_orderpriority", "bkt").agg(
        F.expr("bitmap_or_agg(bm)").alias("bm")
    )
    return merged.groupBy("o_orderpriority").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("n_distinct")
    )


@op(
    "agg_grouping_id",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
           CAST(count(*) AS BIGINT) AS cnt
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    category=CAT,
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() markers on ROLLUP — the only robust way to tell a
    subtotal row from a data row whose grouping column is genuinely
    NULL (agg_rollup leans on NULL markers, which is ambiguous the
    moment real NULLs appear in the key; GROUPING() disambiguates,
    which is why BI tools emit it). Cast to BIGINT: Spark types
    grouping() as TINYINT/INT where DuckDB says... both normalized
    explicitly (§2.X rule 6: types are part of the contract)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("bigint").alias("g_status"),
            F.grouping("o_orderpriority").cast("bigint").alias("g_prio"),
            F.count("*").alias("cnt"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "g_status", "g_prio", "cnt"
        )
    )


@op(
    "agg_multi_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps
    FROM lineitem
    GROUP BY l_returnflag
    """,
    category=CAT,
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Several COUNT(DISTINCT ...) over DIFFERENT columns in one
    aggregate — the classic warehouse cardinality dashboard query.

    Catalyst plans N distinct aggregates via the Expand operator: each
    input row is replicated once per distinct-column with a gid, then
    a two-phase aggregate dedups per (group, gid, value) and counts.
    That keeps the whole thing in two shuffles regardless of how many
    distinct columns are requested — the naive alternative (one job
    per distinct column + join) would be N scans and N shuffles. At
    100 TB the Expand multiplies scan output ×3 here, which is the
    accepted cost of exactness; the sketch alternative for dashboards
    that tolerate error is agg_approx_distinct / agg_hll_partial_merge.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@op(
    "agg_regression",
    oracle="""
    WITH m AS (
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sx,
               CAST(sum(CAST(round(l_extendedprice) AS BIGINT)) AS BIGINT) AS sy,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)
                        * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sxx,
               CAST(sum(CAST(round(l_extendedprice) AS BIGINT)
                        * CAST(round(l_extendedprice) AS BIGINT)) AS BIGINT) AS syy,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)
                        * CAST(round(l_extendedprice) AS BIGINT)) AS BIGINT) AS sxy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6) AS slope,
           round((CAST(sy AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sxy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6) AS intercept,
           round(((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                  * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy))
                 / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6) AS r2
    FROM m
    """,
    category=CAT,
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped OLS regression (slope / intercept / R²) of extended
    price on quantity — the JVM-native twin of udaf_grouped_pandas'
    applyInPandas OLS: same statistic, but computed from six exact
    integer moment sums in ONE map-combined hash aggregate instead of
    collecting each group into a Python worker.

    Same determinism protocol as win_rolling_corr / dq_anomaly_zscore:
    the moments (n, Σx, Σy, Σx², Σy², Σxy) are exact BIGINTs (values
    rounded to whole units first — dollar-scale y keeps Σy² < 2⁶³ at
    sf0.1 and far beyond; cent-scale would overflow at ~10⁵ rows/group
    because Spark's non-ANSI bigint sum wraps silently while DuckDB
    widens to HUGEINT), and the closed-form ratios are derived in the
    final projection with identical double expressions both engines.
    At 100 TB this is the canonical scale shape for regression: state
    is 6 numbers per group (DECIMAL(38) states at petabyte volumes per
    the dq_anomaly_zscore contract), fully map-side combinable —
    applyInPandas would ship every row of every group to Python.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity")).cast("bigint")
    y = F.round(F.col("l_extendedprice")).cast("bigint")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    vx = nd * F.col("sxx") - sxd * F.col("sx")
    vy = nd * F.col("syy") - syd * F.col("sy")
    cov = nd * F.col("sxy") - sxd * F.col("sy")
    return m.select(
        "l_returnflag",
        "n",
        F.round(cov / vx, 6).alias("slope"),
        F.round(
            (syd * F.col("sxx") - sxd * F.col("sxy")) / vx, 6
        ).alias("intercept"),
        F.round((cov * cov) / (vx * vy), 6).alias("r2"),
    )


@op(
    "agg_markov_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY CAST(ts AS TIMESTAMP), event_id)
                   AS prev_type
        FROM events
    ), cnt AS (
        SELECT prev_type, event_type AS next_type,
               CAST(count(*) AS BIGINT) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, n,
           round(CAST(n AS DOUBLE)
                 / sum(n) OVER (PARTITION BY prev_type), 6) AS p
    FROM cnt
    """,
    category=CAT,
)
def agg_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | previous event type) — the
    behavioral-model aggregate behind funnel and churn analyses
    (agg_funnel_conversion asks "did A→B→C happen"; this asks "how
    does the whole event language flow").

    One user_id exchange for the lag window (deterministic (ts µs,
    event_id) ordering per §2.X), then the 5×5 transition-count
    aggregate collapses everything map-side — the final matrix is
    |event_types|² rows no matter the input scale, and the probability
    normalization runs over that tiny relation. At 100 TB the only
    real cost is the per-user sort, which sessionize_gap already pays
    and AQE coalesces; no state beyond the window buffer.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    cnt = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count("*").alias("n"))
    wp = Window.partitionBy("prev_type")
    return cnt.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wp), 6).alias("p"),
    )


HH_THETA_NUM, HH_THETA_DEN = 1, 200  # heavy hitter = > 0.5 % of the stream


@op(
    "agg_heavy_hitters",
    oracle=f"""
    WITH counts AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY user_id
    ), tot AS (
        SELECT CAST(sum(cnt) AS BIGINT) AS total FROM counts
    )
    SELECT user_id, cnt,
           round(CAST(cnt AS DOUBLE) / total, 6) AS share
    FROM counts CROSS JOIN tot
    WHERE cnt * {HH_THETA_DEN} > total * {HH_THETA_NUM}
    """,
    category=CAT,
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency heavy hitters: every user above θ = 0.5 % of total
    stream volume — the THRESHOLD cut (all items above a share),
    complementing win_topn_per_group's fixed-K cut (top K regardless
    of share). The hot-entity detector feeding join_skew_salted's
    skew handling and abuse/bot triage.

    The threshold test is EXACT integer cross-multiplication
    (cnt·DEN > total·NUM) — no float enters the filter, so boundary
    membership can't drift between engines; the published share is a
    derived display column only. Scale shape: one map-combined count
    per key, a 1-row broadcast total, filter at the aggregate — the
    exact two-phase version of Misra-Gries; swap in a space-saving
    sketch only when the distinct-key table itself is too big, which
    at 100 TB it rarely is after map-side combine (keys ≪ rows by
    definition for heavy-hitter workloads).
    """
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    tot = counts.agg(F.sum("cnt").alias("total"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") * HH_THETA_DEN > F.col("total") * HH_THETA_NUM)
        .select(
            "user_id",
            "cnt",
            F.round(F.col("cnt").cast("double") / F.col("total"), 6).alias(
                "share"
            ),
        )
    )


@op(
    "agg_pareto_cut",
    oracle="""
    WITH per_user AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY user_id
    ), by_level AS (
        SELECT cnt AS c,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(cnt) AS BIGINT) AS s_events
        FROM per_user GROUP BY cnt
    ), cum AS (
        SELECT c, n_users, s_events,
               CAST(sum(n_users) OVER w AS BIGINT) AS users_ge,
               CAST(sum(s_events) OVER w AS BIGINT) AS events_ge,
               CAST(sum(s_events) OVER () AS BIGINT) AS total
        FROM by_level
        WINDOW w AS (ORDER BY c DESC)
    )
    SELECT c, n_users, users_ge, events_ge,
           round(CAST(events_ge AS DOUBLE) / total, 6) AS share_ge,
           (events_ge * 5 >= total * 4
            AND (events_ge - s_events) * 5 < total * 4) AS is_pareto_cut
    FROM cum
    """,
    category=CAT,
)
def agg_pareto_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration profile: for each activity level c, how
    many users produce ≥ c events and what share of ALL events they
    carry — with the exact 80 % crossing flagged ("how few users make
    80 % of the load"). The concentration dashboard behind capacity
    planning and the quantitative cousin of agg_heavy_hitters'
    single-threshold cut.

    Scale-safe cumulative: the naive formulation windows over USERS
    ordered by count — an unpartitioned running sum over a
    billions-row relation (single task). This formulation groups to
    DISTINCT ACTIVITY LEVELS first (bounded by max events/user — a
    few hundred rows at ANY corpus size), so the ordered window runs
    over a broadcast-scale relation. Both cumulative sums and the 80 %
    test are exact integers (cross-multiplication, no float
    boundary); the crossing flag is TRUE exactly where coverage first
    reaches 4/5 (prev level strictly below).
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    by_level = per_user.groupBy(F.col("cnt").alias("c")).agg(
        F.count("*").alias("n_users"), F.sum("cnt").alias("s_events")
    )
    w = Window.orderBy(F.desc("c")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy()
    cum = by_level.select(
        "c",
        "n_users",
        "s_events",
        F.sum("n_users").over(w).alias("users_ge"),
        F.sum("s_events").over(w).alias("events_ge"),
        F.sum("s_events").over(wt).alias("total"),
    )
    return cum.select(
        "c",
        "n_users",
        "users_ge",
        "events_ge",
        F.round(F.col("events_ge").cast("double") / F.col("total"), 6).alias(
            "share_ge"
        ),
        (
            (F.col("events_ge") * 5 >= F.col("total") * 4)
            & ((F.col("events_ge") - F.col("s_events")) * 5 < F.col("total") * 4)
        ).alias("is_pareto_cut"),
    )


@op(
    "agg_argmax",
    oracle="""
    WITH keyed AS (
        SELECT event_type, user_id, event_id,
               CAST(round(value * 100) AS BIGINT) AS cents,
               CAST(round(value * 100) AS BIGINT) * 100000000 + event_id
                   AS rank_key
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(max(cents) AS BIGINT) AS peak_cents,
           CAST(arg_max(event_id, rank_key) AS BIGINT) AS peak_event_id,
           CAST(arg_max(user_id, rank_key) AS BIGINT) AS peak_user,
           CAST(arg_min(event_id, rank_key) AS BIGINT) AS min_event_id
    FROM keyed GROUP BY event_type
    """,
    category=CAT,
)
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARGMAX aggregation (max_by / min_by): the row attribute AT the
    extremum, in one aggregate — "which event was the peak", not just
    "what was the peak". The single-pass replacement for the
    join-back-on-max anti-pattern (self-join fact to its own max) and
    the aggregate-shaped cousin of win_topn_per_group's K=1 window.

    Determinism: max_by ties are engine-arbitrary, so the ranking key
    is the EXACT integer composite cents·10⁸ + event_id — unique per
    row (event_id is unique), so no tie can exist for either engine
    to break differently (§2.X rule 2 applied to argmax; the composite
    stays < 2⁶³ for cents < 9·10¹⁰). Map-side combinable single-value
    state per group — at 100 TB this is one scan, no join, no window.
    """
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    keyed = ev.select(
        "event_type",
        "user_id",
        "event_id",
        cents.alias("cents"),
        (cents * F.lit(100000000) + F.col("event_id")).alias("rank_key"),
    )
    return keyed.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.max("cents").alias("peak_cents"),
        F.expr("max_by(event_id, rank_key)").alias("peak_event_id"),
        F.expr("max_by(user_id, rank_key)").alias("peak_user"),
        F.expr("min_by(event_id, rank_key)").alias("min_event_id"),
    )


@op(
    "agg_skew_kurtosis",
    oracle="""
    WITH m AS (
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(l_discount * 1000) AS BIGINT)) AS BIGINT) AS s1,
               CAST(sum(CAST(round(l_discount * 1000) AS BIGINT)
                        * CAST(round(l_discount * 1000) AS BIGINT)) AS BIGINT) AS s2,
               CAST(sum(CAST(round(l_discount * 1000) AS BIGINT)
                        * CAST(round(l_discount * 1000) AS BIGINT)
                        * CAST(round(l_discount * 1000) AS BIGINT)) AS BIGINT) AS s3,
               CAST(sum(CAST(round(l_discount * 1000) AS BIGINT)
                        * CAST(round(l_discount * 1000) AS BIGINT)
                        * CAST(round(l_discount * 1000) AS BIGINT)
                        * CAST(round(l_discount * 1000) AS BIGINT)) AS BIGINT) AS s4
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           round((CAST(n AS DOUBLE) * n * s3
                  - 3.0 * n * s1 * s2 + 2.0 * s1 * s1 * s1)
                 / (CAST(n AS DOUBLE) * n * n)
                 / pow(sqrt((CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
                            / (CAST(n AS DOUBLE) * n)), 3), 6) AS skew,
           round(((CAST(n AS DOUBLE) * n * n * s4
                   - 4.0 * n * n * s1 * s3 + 6.0 * n * s1 * s1 * s2
                   - 3.0 * s1 * s1 * s1 * s1)
                  / (CAST(n AS DOUBLE) * n * n * n))
                 / pow((CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
                       / (CAST(n AS DOUBLE) * n), 2) - 3.0, 6) AS kurt
    FROM m
    """,
    category=CAT,
)
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis per group — the 3rd/4th
    distribution moments (is the discount distribution lopsided /
    heavy-tailed), extending agg_stats' mean/stddev tier. Deliberately
    NOT Spark's skewness()/kurtosis() vs DuckDB's: the two engines
    implement different bias corrections (sample g1/G1 vs population),
    a dialect trap the moment protocol sidesteps entirely.

    Same exact-integer-moment protocol as agg_regression taken to 4th
    order: per-mille discounts (0..100) keep Σx⁴ ≤ 10⁸·rows — exact in
    BIGINT to ~10¹⁰ rows/group (DECIMAL(38) states beyond, per the
    dq_anomaly_zscore contract); the central-moment ratios are derived
    in the final projection with the identical double expression on
    both engines. One map-combined aggregate, 6 numbers of state per
    group.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_discount") * 1000).cast("bigint")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("s1"),
        F.sum(x * x).alias("s2"),
        F.sum(x * x * x).alias("s3"),
        F.sum(x * x * x * x).alias("s4"),
    )
    nd = F.col("n").cast("double")
    s1, s2, s3, s4 = (F.col(c) for c in ("s1", "s2", "s3", "s4"))
    var = (nd * s2 - s1.cast("double") * s1) / (nd * F.col("n"))
    m3 = (nd * F.col("n") * s3 - 3.0 * F.col("n") * s1 * s2
          + 2.0 * s1 * s1 * s1) / (nd * F.col("n") * F.col("n"))
    m4 = (nd * F.col("n") * F.col("n") * s4
          - 4.0 * F.col("n") * F.col("n") * s1 * s3
          + 6.0 * F.col("n") * s1 * s1 * s2
          - 3.0 * s1 * s1 * s1 * s1) / (nd * F.col("n") * F.col("n") * F.col("n"))
    return m.select(
        "l_returnflag", "n",
        F.round(m3 / F.pow(F.sqrt(var), 3), 6).alias("skew"),
        F.round(m4 / F.pow(var, 2) - 3.0, 6).alias("kurt"),
    )


# event_type -> bit position (fixed vocabulary, §1.3)
EVENT_BITS = {"click": 1, "error": 2, "purchase": 4, "signup": 8, "view": 16}


def _event_bit_sql() -> str:
    cases = " ".join(
        f"WHEN '{t}' THEN {b}" for t, b in sorted(EVENT_BITS.items())
    )
    return f"CASE event_type {cases} ELSE 0 END"


@op(
    "agg_bitmask_profile",
    oracle=f"""
    WITH bits AS (
        SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
               {_event_bit_sql()} AS b
        FROM events
    ), profiles AS (
        SELECT user_id, d, CAST(bit_or(b) AS BIGINT) AS type_mask
        FROM bits GROUP BY user_id, d
    )
    SELECT type_mask,
           CAST(count(*) AS BIGINT) AS n_user_days,
           CAST(bit_count(type_mask) AS BIGINT) AS n_types,
           ((type_mask & 4) != 0) AS has_purchase
    FROM profiles GROUP BY type_mask
    """,
    category=CAT,
)
def agg_bitmask_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral bitmask profile: OR-aggregate each (user, day)'s
    event types into one integer flag set, then histogram the distinct
    behavior profiles ("how many user-days did {{view,click}} but
    never purchased") — the flags pattern every feature store uses
    for bounded categorical sets, and the exact-set cousin of
    agg_bitmap_distinct's id bitmaps.

    BIT_OR is commutative/associative/idempotent — the ideal
    distributed aggregate: map-side partials are just ORs, re-delivery
    is harmless (the same property stream_upsert_sink leans on), and
    state is ONE integer per user regardless of event count. The
    profile histogram then collapses ≤2^{len(EVENT_BITS)} rows.
    Fixed vocabulary → fixed bit positions (§1.3); set membership
    tests are integer AND, no string work after the scan.
    """
    ev = load_table(spark, sf_dir, "events")
    bits = ev.select(
        "user_id",
        F.to_date("ts").alias("d"),
        F.expr(_event_bit_sql()).alias("b"),
    )
    profiles = bits.groupBy("user_id", "d").agg(
        F.expr("bit_or(b)").cast("bigint").alias("type_mask")
    )
    return profiles.groupBy("type_mask").agg(
        F.count("*").alias("n_user_days"),
        F.expr("bit_count(type_mask)").cast("bigint").alias("n_types"),
        ((F.col("type_mask").bitwiseAND(4)) != 0).alias("has_purchase"),
    )


@op(
    "agg_cohort_ltv",
    oracle="""
    WITH purchases AS (
        SELECT user_id,
               date_trunc('week', CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS m,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ), cohorts AS (
        SELECT user_id, min(m) AS cohort FROM purchases GROUP BY user_id
    ), aged AS (
        SELECT c.cohort,
               CAST(date_diff('day', c.cohort, p.m) // 7 AS BIGINT) AS age,
               p.cents
        FROM purchases p JOIN cohorts c ON p.user_id = c.user_id
    ), cohort_rev AS (
        SELECT cohort, age, CAST(sum(cents) AS BIGINT) AS rev_c
        FROM aged GROUP BY cohort, age
    ), sized AS (
        SELECT cohort, CAST(count(*) AS BIGINT) AS n_users
        FROM cohorts GROUP BY cohort
    )
    SELECT r.cohort, r.age, r.rev_c, s.n_users,
           CAST(sum(r.rev_c) OVER (PARTITION BY r.cohort ORDER BY r.age)
                AS BIGINT) AS cum_rev_c,
           CAST(sum(r.rev_c) OVER (PARTITION BY r.cohort ORDER BY r.age)
                // s.n_users AS BIGINT) AS ltv_c_per_user
    FROM cohort_rev r JOIN sized s ON r.cohort = s.cohort
    """,
    category=CAT,
)
def agg_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: users cohorted by first purchase
    WEEK, revenue accumulated by cohort age (weeks), per-user
    normalized —
    the LTV dashboard behind every retention decision
    (agg_retention_cohort counts who CAME BACK; this measures what
    they were WORTH). Weekly cohorts because the fixture spans one
    month; a production run flips one truncation unit. Exact integer
    cents end-to-end; even the per-user normalization stays integer
    (floor division — a display layer can choose decimals, the
    engine result is exact).

    Shape: purchases reduce to per-user first-month (one agg), the
    age join is keyed on user_id, the curve relation is
    |cohorts|×|ages| (tiny at any corpus scale) so its running-sum
    window is broadcast-class. The week arithmetic is integer
    day-diff div 7 on week-truncated NTZ dates — zone-independent
    (the ts_yoy_growth rule) and free of months_between's fractional
    semantics.
    """
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.trunc(F.col("ts").cast("date"), "week").alias("m"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    cohorts = purchases.groupBy("user_id").agg(F.min("m").alias("cohort"))
    aged = purchases.join(cohorts, "user_id").select(
        "cohort",
        F.expr("CAST(datediff(m, cohort) div 7 AS BIGINT)").alias("age"),
        "cents",
    )
    cohort_rev = aged.groupBy("cohort", "age").agg(
        F.sum("cents").alias("rev_c")
    )
    sized = cohorts.groupBy("cohort").agg(F.count("*").alias("n_users"))
    w = Window.partitionBy("cohort").orderBy("age")
    cum = F.sum("rev_c").over(w)
    return (
        cohort_rev.join(F.broadcast(sized), "cohort")
        .select(
            "cohort",
            "age",
            "rev_c",
            "n_users",
            cum.alias("cum_rev_c"),
            F.expr("CAST(sum(rev_c) OVER (PARTITION BY cohort ORDER BY age)"
                   " div n_users AS BIGINT)").alias("ltv_c_per_user"),
        )
    )


@op(
    "agg_gini_activity",
    oracle="""
    WITH per_user AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY user_id
    ), by_level AS (
        SELECT cnt AS c, CAST(count(*) AS BIGINT) AS k
        FROM per_user GROUP BY cnt
    ), cum AS (
        SELECT c, k,
               CAST(coalesce(sum(k) OVER (ORDER BY c
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS p
        FROM by_level
    ), moments AS (
        SELECT CAST(sum(k) AS BIGINT) AS n,
               CAST(sum(c * k) AS BIGINT) AS t,
               CAST(sum(c * (k * p + (k * (k + 1)) // 2)) AS BIGINT) AS s
        FROM cum
    )
    SELECT n AS n_users, t AS total_events,
           CAST((2000 * s - 1000 * (n + 1) * t) // (n * t) AS BIGINT)
               AS gini_milli
    FROM moments
    """,
    category=CAT,
)
def agg_gini_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of user activity concentration, EXACT — the
    single-number inequality summary whose full curve is
    agg_pareto_cut ("how unequal is the load" vs "where is the 80 %
    point"). 0 = uniform, →1 = one user is the whole stream; ops
    teams trend it to catch bot takeover and key-skew formation
    before joins start spilling.

    The textbook formulation sorts ALL users and sums rank·activity —
    an unpartitioned window over a billions-row relation at 100 TB.
    This op groups to DISTINCT ACTIVITY LEVELS first (the
    agg_pareto_cut move) and reconstructs the rank sum per level in
    closed form (ranks are contiguous: Σi = k·P + k(k+1)/2), so the
    ordered window touches only the bounded level relation and every
    quantity — including the published per-mille Gini — is exact
    integer arithmetic (overflow bound: 2000·S needs Σc·rank² < 2⁶³
    ⇒ fine to ~10⁸ users × 10⁴ events; DECIMAL(38) states beyond).
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    by_level = per_user.groupBy(F.col("cnt").alias("c")).agg(
        F.count("*").alias("k")
    )
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, -1)
    cum = by_level.withColumn(
        "p", F.coalesce(F.sum("k").over(w), F.lit(0)).cast("bigint")
    )
    moments = cum.agg(
        F.sum("k").alias("n"),
        F.sum(F.col("c") * F.col("k")).alias("t"),
        F.sum(
            F.col("c")
            * (F.col("k") * F.col("p") + F.expr("(k * (k + 1)) div 2"))
        ).alias("s"),
    )
    return moments.select(
        F.col("n").alias("n_users"),
        F.col("t").alias("total_events"),
        F.expr(
            "CAST((2000 * s - 1000 * (n + 1) * t) div (n * t) AS BIGINT)"
        ).alias("gini_milli"),
    )


@op(
    "agg_boolean_aggregates",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) FILTER (o_totalprice > 200000) AS BIGINT)
               AS n_big,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
           CAST(count(*) FILTER (o_orderpriority LIKE '%LOW')
                AS BIGINT) AS n_low
    FROM orders GROUP BY o_orderstatus
    """,
    category=CAT,
)
def agg_boolean_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The boolean-aggregate family — count_if / every / any (SQL
    standard BOOL_AND/BOOL_OR) — the predicate-summary layer of every
    audit query ("did ALL rows pass", "did ANY row trip the flag",
    "how many matched"), spelled with the dedicated aggregates
    instead of the sum(CASE…) workarounds migrating users bring.

    Semantics parity is the point: Spark's every/any vs DuckDB's
    bool_and/bool_or must agree on NULL handling (NULL predicate rows
    are ignored, not falsy) — the hash-match pins that. All
    map-combinable single-value states; count_if is exactly
    count FILTER.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.expr("count_if(o_totalprice > 200000)").alias("n_big"),
        F.expr("every(o_totalprice > 1000)").alias("all_over_1k"),
        F.expr("any(o_orderpriority = '1-URGENT')").alias("any_urgent"),
        F.expr("count_if(o_orderpriority LIKE '%LOW')").alias("n_low"),
    )


@op(
    "agg_rfm_segments",
    oracle="""
    WITH purchases AS (
        SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ), horizon AS (
        SELECT max(d) AS maxd FROM purchases
    ), rfm AS (
        SELECT user_id,
               CAST(date_diff('day', max(d), (SELECT maxd FROM horizon))
                    AS BIGINT) AS r_days,
               CAST(count(*) AS BIGINT) AS f_cnt,
               CAST(sum(cents) AS BIGINT) AS m_c
        FROM purchases GROUP BY user_id
    ), cuts AS (
        SELECT quantile_cont(r_days, 0.25) AS r1, quantile_cont(r_days, 0.50) AS r2,
               quantile_cont(r_days, 0.75) AS r3,
               quantile_cont(f_cnt, 0.25) AS f1, quantile_cont(f_cnt, 0.50) AS f2,
               quantile_cont(f_cnt, 0.75) AS f3,
               quantile_cont(m_c, 0.25) AS m1, quantile_cont(m_c, 0.50) AS m2,
               quantile_cont(m_c, 0.75) AS m3
        FROM rfm
    ), coded AS (
        SELECT user_id, m_c,
               (CASE WHEN r_days <= r1 THEN 4 WHEN r_days <= r2 THEN 3
                     WHEN r_days <= r3 THEN 2 ELSE 1 END) * 100
               + (CASE WHEN f_cnt <= f1 THEN 1 WHEN f_cnt <= f2 THEN 2
                       WHEN f_cnt <= f3 THEN 3 ELSE 4 END) * 10
               + (CASE WHEN m_c <= m1 THEN 1 WHEN m_c <= m2 THEN 2
                       WHEN m_c <= m3 THEN 3 ELSE 4 END) AS segment
        FROM rfm CROSS JOIN cuts
    )
    SELECT segment,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(m_c) AS BIGINT) AS total_cents,
           (segment = 444) AS is_champion
    FROM coded GROUP BY segment
    """,
    category=CAT,
)
def agg_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (Recency/Frequency/Monetary quartile codes,
    the direct-marketing classic): each purchasing user gets a 3-digit
    segment (recency inverted so 4 = most recent — '444' is the
    champion cell), then segments are profiled. The behavioral
    segmentation every CRM export runs, composing naturally with
    agg_cohort_ltv (segments explain WHO, LTV explains WORTH).

    Scale shape is win_quantile_bin_global's, tripled: nine exact
    quartile cuts over integer R/F/M values computed in ONE aggregate,
    broadcast as one row, banding by CASE in the projection — no
    ntile, no global sort anywhere (ntile over users is a single-task
    window at 100 TB; cut-based banding is the scale-safe equivalent
    up to cut-tie placement, which integer inputs pin exactly:
    percentile ≡ quantile_cont bit-for-bit on ints, §2.X rule 6).
    """
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.to_date("ts").alias("d"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    horizon = purchases.agg(F.max("d").alias("maxd"))
    rfm = (
        purchases.groupBy("user_id")
        .agg(
            F.max("d").alias("last_d"),
            F.count("*").alias("f_cnt"),
            F.sum("cents").alias("m_c"),
        )
        .crossJoin(F.broadcast(horizon))
        .select(
            "user_id",
            F.datediff("maxd", "last_d").cast("bigint").alias("r_days"),
            "f_cnt",
            "m_c",
        )
    )
    cuts = rfm.agg(
        *[
            F.expr(f"percentile({c}, {q})").alias(f"{c[0]}{i}")
            for c in ("r_days", "f_cnt", "m_c")
            for i, q in ((1, 0.25), (2, 0.50), (3, 0.75))
        ]
    )
    r_code = (
        F.when(F.col("r_days") <= F.col("r1"), 4)
        .when(F.col("r_days") <= F.col("r2"), 3)
        .when(F.col("r_days") <= F.col("r3"), 2)
        .otherwise(1)
    )
    f_code = (
        F.when(F.col("f_cnt") <= F.col("f1"), 1)
        .when(F.col("f_cnt") <= F.col("f2"), 2)
        .when(F.col("f_cnt") <= F.col("f3"), 3)
        .otherwise(4)
    )
    m_code = (
        F.when(F.col("m_c") <= F.col("m1"), 1)
        .when(F.col("m_c") <= F.col("m2"), 2)
        .when(F.col("m_c") <= F.col("m3"), 3)
        .otherwise(4)
    )
    coded = rfm.crossJoin(F.broadcast(cuts)).select(
        "m_c", (r_code * 100 + f_code * 10 + m_code).alias("segment")
    )
    return coded.groupBy("segment").agg(
        F.count("*").alias("n_users"),
        F.sum("m_c").alias("total_cents"),
        (F.col("segment") == 444).alias("is_champion"),
    )


@op(
    "agg_decimal_money",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2))) AS VARCHAR)
               AS gross,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2))
                    * CAST('0.93' AS DECIMAL(8, 4))) AS VARCHAR) AS gross_eur,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2))
                    * (CAST(1 AS DECIMAL(8, 4))
                       - CAST(l_discount AS DECIMAL(8, 4)))) AS VARCHAR)
               AS net
    FROM lineitem GROUP BY l_returnflag
    """,
    category=CAT,
)
def agg_decimal_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money arithmetic in DECIMAL — the type a warehouse actually
    stores currency in. Everywhere else this repo proves exactness by
    dropping to integer cents (§2.X); this op proves the ENGINE's
    decimal path directly: DECIMAL(18,2) sums, a decimal FX
    conversion, and a decimal net-of-discount product, all exact and
    all agreeing with DuckDB's independent decimal implementation
    digit-for-digit (results serialized to strings so the hash sees
    the full scale, not a double approximation).

    Why it matters at 100 TB: decimal aggregation runs in Tungsten on
    unscaled longs until precision 18, so the exactness is
    — like the cents protocol — free until values exceed 10¹⁶; the
    documented escalation is DECIMAL(38) (128-bit state, ~2× cost)
    exactly when Σ row count × max value demands it. Spark's
    precision-propagation rules (p1+p2+1 for ×) are part of what the
    hash-match pins.
    """
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    rate = F.lit("0.93").cast("decimal(8,4)")
    one = F.lit(1).cast("decimal(8,4)")
    disc = F.col("l_discount").cast("decimal(8,4)")
    return li.groupBy("l_returnflag").agg(
        F.sum(price).cast("string").alias("gross"),
        F.sum(price * rate).cast("string").alias("gross_eur"),
        F.sum(price * (one - disc)).cast("string").alias("net"),
    )


@op(
    "agg_new_returning_users",
    oracle="""
    WITH seen AS (
        SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
        FROM events GROUP BY user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE)
    ), first_seen AS (
        SELECT user_id, min(d) AS first_d FROM seen GROUP BY user_id
    )
    SELECT s.d,
           CAST(count(*) FILTER (s.d = f.first_d) AS BIGINT) AS new_users,
           CAST(count(*) FILTER (s.d > f.first_d) AS BIGINT)
               AS returning_users,
           round(CAST(count(*) FILTER (s.d > f.first_d) AS DOUBLE)
                 / count(*), 4) AS returning_share
    FROM seen s JOIN first_seen f ON s.user_id = f.user_id
    GROUP BY s.d
    """,
    category=CAT,
)
def agg_new_returning_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New vs returning daily actives — the growth-accounting split
    every product dashboard leads with (agg_retention_cohort tracks a
    cohort forward; this reads each DAY's composition). A user is
    "new" on their first-seen day, "returning" on any later active
    day.

    Shape: activity collapses to distinct (user, day) once; first-seen
    is one more agg over it; the classifying join keys on user_id and
    reuses the same partitioning (AQE exchange reuse — zero extra
    shuffles). Counts are exact FILTER aggregates; only the published
    share is a rounded double. At 100 TB first_seen is the
    incremental-merge candidate (agg_incremental_merge's pattern:
    min() is mergeable), so the daily job never rescans history.
    """
    ev = load_table(spark, sf_dir, "events")
    seen = ev.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    first_seen = seen.groupBy("user_id").agg(F.min("d").alias("first_d"))
    joined = seen.join(first_seen, "user_id")
    new_u = F.count(F.when(F.col("d") == F.col("first_d"), 1))
    ret_u = F.count(F.when(F.col("d") > F.col("first_d"), 1))
    return joined.groupBy("d").agg(
        new_u.alias("new_users"),
        ret_u.alias("returning_users"),
        F.round(ret_u.cast("double") / F.count("*"), 4).alias(
            "returning_share"
        ),
    )


@op(
    "agg_conversion_latency",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view'
                        THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS first_view,
               min(CASE WHEN event_type = 'purchase'
                        THEN epoch_us(CAST(ts AS TIMESTAMP)) END)
                   AS first_purchase
        FROM events GROUP BY user_id
    ), lat AS (
        SELECT user_id, first_purchase - first_view AS lat_us
        FROM firsts
        WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
          AND first_purchase >= first_view
    )
    SELECT CAST(lat_us // 3600000000 AS BIGINT) AS hours_bucket,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(min(lat_us) AS BIGINT) AS min_us,
           CAST(max(lat_us) AS BIGINT) AS max_us
    FROM lat GROUP BY 1
    """,
    category=CAT,
)
def agg_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: first view → first purchase per
    user, histogrammed by whole hours — the funnel-LATENCY metric
    (agg_funnel_conversion counts WHO converted; this measures HOW
    LONG conversion took, the number growth teams optimize).

    Both firsts come from ONE conditional-min aggregate over a single
    scan (no self-join of the events table against itself — the
    min(CASE) trick collapses the classic two-pass formulation);
    latency is exact integer µs and the histogram bucket is integer
    floor-division. Users who purchased before ever viewing (seeded
    accounts) are excluded explicitly rather than producing negative
    buckets. Map-combined, one shuffle on user_id, histogram ≤
    span-in-hours rows.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", us)).alias("first_view"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias(
            "first_purchase"
        ),
    )
    lat = firsts.filter(
        F.col("first_view").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") >= F.col("first_view"))
    ).select((F.col("first_purchase") - F.col("first_view")).alias("lat_us"))
    return lat.groupBy(
        F.expr("CAST(lat_us div 3600000000 AS BIGINT)").alias("hours_bucket")
    ).agg(
        F.count("*").alias("n_users"),
        F.min("lat_us").alias("min_us"),
        F.max("lat_us").alias("max_us"),
    )


@op(
    "agg_weighted_median",
    oracle="""
    WITH levels AS (
        SELECT l_returnflag,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS wt
        FROM lineitem GROUP BY 1, 2
    ), cum AS (
        SELECT l_returnflag, price_c, wt,
               CAST(sum(wt) OVER (PARTITION BY l_returnflag
                                  ORDER BY price_c) AS BIGINT) AS cw,
               CAST(sum(wt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tw
        FROM levels
    )
    SELECT l_returnflag,
           CAST(min(price_c) AS BIGINT) AS weighted_median_c,
           CAST(min(tw) AS BIGINT) AS total_weight
    FROM cum
    WHERE cw * 2 >= tw
    GROUP BY l_returnflag
    """,
    category=CAT,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per group — the robust price
    point ("half the UNITS moved at or below this price"), which the
    plain median (agg_median_exact) gets wrong whenever quantity and
    price correlate. The inventory/pricing staple no builtin covers
    in either engine.

    Exact lower-weighted-median: collapse to (group, price level,
    Σweight) first — bounded by distinct prices, the agg_pareto_cut
    move — then one cumulative window over the level relation and the
    crossing test cw·2 ≥ tw in integer cross-multiplication. min()
    over qualifying levels picks the crossing point without a second
    window pass. No float anywhere; weights are whole units, prices
    exact cents.
    """
    li = load_table(spark, sf_dir, "lineitem")
    levels = li.groupBy(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("price_c"),
    ).agg(F.sum(F.round(F.col("l_quantity")).cast("bigint")).alias("wt"))
    wc = Window.partitionBy("l_returnflag").orderBy("price_c")
    wt_all = Window.partitionBy("l_returnflag")
    cum = levels.select(
        "l_returnflag",
        "price_c",
        F.sum("wt").over(wc).alias("cw"),
        F.sum("wt").over(wt_all).alias("tw"),
    )
    return (
        cum.filter(F.col("cw") * 2 >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("price_c").alias("weighted_median_c"),
            F.min("tw").alias("total_weight"),
        )
    )


BASKET_MIN_CO = 3


@op(
    "agg_basket_lift",
    oracle=f"""
    WITH baskets AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), n_baskets AS (
        SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS nb FROM baskets
    ), item AS (
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_item
        FROM baskets GROUP BY l_partkey
    ), pair AS (
        SELECT a.l_partkey AS p1, b.l_partkey AS p2,
               CAST(count(*) AS BIGINT) AS n_pair
        FROM baskets a JOIN baskets b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= {BASKET_MIN_CO}
    )
    SELECT p1, p2, n_pair,
           round(CAST(n_pair AS DOUBLE) / nb, 6) AS support,
           round(CAST(n_pair AS DOUBLE) / i1.n_item, 6) AS confidence,
           round((CAST(n_pair AS DOUBLE) * nb)
                 / (CAST(i1.n_item AS DOUBLE) * i2.n_item), 4) AS lift
    FROM pair
    JOIN item i1 ON pair.p1 = i1.l_partkey
    JOIN item i2 ON pair.p2 = i2.l_partkey
    CROSS JOIN n_baskets
    """,
    category=CAT,
)
def agg_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule scoring — support / confidence / lift for
    co-purchased part pairs (the Apriori metric layer over
    join_copurchase_pairs' raw counts): lift > 1 marks genuinely
    associated items, confidence feeds "customers also bought".

    Exact counts everywhere (pair counts via the order-key self-join
    whose expansion is bounded by basket size, min-support prune
    BEFORE the metric joins); the three ratios are identical double
    expressions rounded in the final projection. Scale: the item
    table is ≪ pairs and broadcasts to the scoring joins; the basket
    count is a 1-row broadcast — the only wide ops are the two
    aggregations the raw counts already need.
    """
    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    nb = baskets.agg(
        F.countDistinct("l_orderkey").alias("nb")
    )
    item = baskets.groupBy("l_partkey").agg(F.count("*").alias("n_item"))
    a, b = baskets.alias("a"), baskets.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2")
        )
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= BASKET_MIN_CO)
    )
    i1 = item.select(F.col("l_partkey").alias("p1"), F.col("n_item").alias("n1"))
    i2 = item.select(F.col("l_partkey").alias("p2"), F.col("n_item").alias("n2"))
    return (
        pair.join(F.broadcast(i1), "p1")
        .join(F.broadcast(i2), "p2")
        .crossJoin(F.broadcast(nb))
        .select(
            "p1", "p2", "n_pair",
            F.round(F.col("n_pair").cast("double") / F.col("nb"), 6).alias(
                "support"
            ),
            F.round(F.col("n_pair").cast("double") / F.col("n1"), 6).alias(
                "confidence"
            ),
            F.round(
                (F.col("n_pair").cast("double") * F.col("nb"))
                / (F.col("n1").cast("double") * F.col("n2")),
                4,
            ).alias("lift"),
        )
    )


@op(
    "agg_weekend_lift",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ), split AS (
        SELECT event_type,
               CAST(sum(cnt) FILTER (isodow(d) >= 6) AS BIGINT) AS we_events,
               CAST(count(*) FILTER (isodow(d) >= 6) AS BIGINT) AS we_days,
               CAST(sum(cnt) FILTER (isodow(d) < 6) AS BIGINT) AS wd_events,
               CAST(count(*) FILTER (isodow(d) < 6) AS BIGINT) AS wd_days
        FROM daily GROUP BY event_type
    )
    SELECT event_type, we_events, we_days, wd_events, wd_days,
           round((CAST(we_events AS DOUBLE) * wd_days)
                 / (CAST(wd_events AS DOUBLE) * we_days), 4) AS weekend_lift,
           ((we_events * wd_days) * 10 > (wd_events * we_days) * 11)
               AS weekend_heavy
    FROM split
    """,
    category=CAT,
)
def agg_weekend_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekend lift: mean weekend-day volume over mean weekday volume
    per stream — the simplest calendar-effect read (is this stream
    consumer-shaped or office-shaped), feeding the same dashboards as
    ts_seasonality_profile's hourly shape but at the week grain.

    The lift ratio of two averages is computed CROSS-MULTIPLIED
    ((Σwe·Dwd)/(Σwd·Dwe)) so no intermediate fractional average
    exists, and the >10 % verdict is pure integer cross-multiplication
    (the agg_heavy_hitters rule). ISO weekday on DATE is
    zone-independent. One daily pre-agg + one FILTER-aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count("*").alias("cnt"))
    is_we = F.expr("((dayofweek(d) + 5) % 7) + 1 >= 6")
    split = daily.groupBy("event_type").agg(
        F.sum(F.when(is_we, F.col("cnt"))).alias("we_events"),
        F.count(F.when(is_we, 1)).alias("we_days"),
        F.sum(F.when(~is_we, F.col("cnt"))).alias("wd_events"),
        F.count(F.when(~is_we, 1)).alias("wd_days"),
    )
    return split.select(
        "event_type", "we_events", "we_days", "wd_events", "wd_days",
        F.round(
            (F.col("we_events").cast("double") * F.col("wd_days"))
            / (F.col("wd_events").cast("double") * F.col("we_days")),
            4,
        ).alias("weekend_lift"),
        (
            (F.col("we_events") * F.col("wd_days")) * 10
            > (F.col("wd_events") * F.col("we_days")) * 11
        ).alias("weekend_heavy"),
    )


@op(
    "agg_interarrival_percentiles",
    oracle="""
    WITH gaps AS (
        SELECT event_type,
               epoch_us(CAST(ts AS TIMESTAMP))
               - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                     PARTITION BY event_type
                     ORDER BY CAST(ts AS TIMESTAMP), event_id) AS gap_us
        FROM events
    )
    SELECT event_type,
           CAST(count(gap_us) AS BIGINT) AS n_gaps,
           round(quantile_cont(gap_us, 0.50), 1) AS p50_us,
           round(quantile_cont(gap_us, 0.95), 1) AS p95_us,
           round(quantile_cont(gap_us, 0.99), 1) AS p99_us,
           CAST(max(gap_us) AS BIGINT) AS max_us
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
    category=CAT,
)
def agg_interarrival_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival time tail percentiles per stream (p50/p95/p99 of
    the gap between consecutive events) — the burstiness profile that
    sizes streaming state stores and alert debounce windows (a stream
    with p50=1 s, p99=10 min needs very different watermarks than a
    metronome; mean gap alone hides exactly this).

    Gaps are exact integer µs from ONE (type-partitioned, (ts µs,
    event_id)-ordered) lag window; the exact percentiles follow the
    win_quantile_bin_global determinism argument — interpolation over
    INTEGER inputs lands on .0/.5 doubles where Spark `percentile` ≡
    DuckDB `quantile_cont` bit-for-bit (rounded at 1 as belt and
    braces). At 100 TB swap `percentile` for `approx_percentile`
    (tolerance-verified, not hash) — the agg_approx_quantile tier.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type", (us - F.lag(us).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count("gap_us").alias("n_gaps"),
        F.round(F.expr("percentile(gap_us, 0.50)"), 1).alias("p50_us"),
        F.round(F.expr("percentile(gap_us, 0.95)"), 1).alias("p95_us"),
        F.round(F.expr("percentile(gap_us, 0.99)"), 1).alias("p99_us"),
        F.max("gap_us").alias("max_us"),
    )


@op(
    "agg_peak_concurrency",
    oracle="""
    WITH spans AS (
        SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
               min(epoch_us(CAST(ts AS TIMESTAMP))) AS s_us,
               max(epoch_us(CAST(ts AS TIMESTAMP))) AS e_us
        FROM events
        GROUP BY user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE)
    ), bounds AS (
        SELECT d, s_us AS t, 1 AS delta, user_id FROM spans
        UNION ALL
        SELECT d, e_us + 1 AS t, -1 AS delta, user_id FROM spans
    ), swept AS (
        SELECT d,
               CAST(sum(delta) OVER (PARTITION BY d
                                     ORDER BY t, delta, user_id) AS BIGINT)
                   AS live
        FROM bounds
    )
    SELECT d,
           CAST(max(live) AS BIGINT) AS peak_concurrent,
           CAST(count(*) // 2 AS BIGINT) AS n_sessions
    FROM swept GROUP BY d
    """,
    category=CAT,
)
def agg_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day — the capacity number
    (licenses, connection pools, executor sizing) that NO aggregate
    of session counts gives you: computed with the classic +1/−1
    boundary sweep (each session span emits a start and an end event;
    the running sum of deltas IS the live-session curve; its max is
    the peak). The reference's domain is literally Tableau-server
    monitoring — this is ITS headline chart.

    Scale correctness of the sweep: the running sum is PARTITIONED BY
    DAY, so each ordered window handles one day's boundaries — never
    a global single-task sort (cross-midnight sessions would need
    day-spanning carry-in, deliberately out of scope for daily spans
    which end at the day's last event by construction). End
    boundaries sort at e+1 with (t, delta, user_id) total order so a
    session ending exactly when another starts counts both live at
    that instant and ties can't flap engines (§2.X rule 2). All
    exact integer µs.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    spans = ev.groupBy(
        "user_id", F.to_date("ts").alias("d")
    ).agg(F.min(us).alias("s_us"), F.max(us).alias("e_us"))
    starts = spans.select(
        "d", F.col("s_us").alias("t"), F.lit(1).alias("delta"), "user_id"
    )
    ends = spans.select(
        "d", (F.col("e_us") + 1).alias("t"), F.lit(-1).alias("delta"), "user_id"
    )
    bounds = starts.unionAll(ends)
    w = Window.partitionBy("d").orderBy("t", "delta", "user_id")
    swept = bounds.select("d", F.sum("delta").over(w).alias("live"))
    return swept.groupBy("d").agg(
        F.max("live").alias("peak_concurrent"),
        (F.count("*") / 2).cast("bigint").alias("n_sessions"),
    )


@op(
    "agg_survival_km",
    oracle="""
    WITH user_span AS (
        SELECT user_id,
               min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS first_d,
               max(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS last_d
        FROM events GROUP BY user_id
    ), horizon AS (
        SELECT max(last_d) AS hmax FROM user_span
    ), obs AS (
        SELECT user_id,
               CAST(date_diff('day', first_d, last_d) AS BIGINT) AS dur,
               (last_d < (SELECT hmax FROM horizon) - 3) AS churned
        FROM user_span
    ), at_age AS (
        SELECT dur AS age,
               CAST(count(*) FILTER (churned) AS BIGINT) AS d_events,
               CAST(count(*) AS BIGINT) AS leaving
        FROM obs GROUP BY dur
    ), risk AS (
        SELECT age, d_events,
               CAST(sum(leaving) OVER (ORDER BY age DESC) AS BIGINT) AS n_risk
        FROM at_age
    )
    SELECT age, d_events, n_risk,
           round(exp(sum(ln(1.0 - CAST(d_events AS DOUBLE) / n_risk))
                     OVER (ORDER BY age)), 4) AS survival
    FROM risk
    WHERE d_events < n_risk
    """,
    category=CAT,
)
def agg_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of user lifetime (Kaplan & Meier
    '58) WITH CENSORING: users still active near the horizon are
    censored, not counted as churned — the statistical correction
    naive retention curves omit (they systematically overstate churn
    for recent cohorts; agg_retention_cohort reads activity, this
    estimates the underlying survival function).

    Distributed formulation: per-user durations reduce to an
    AGE-LEVEL relation (the pareto/gini bounded trick), the at-risk
    count is a reverse cumulative sum over ages, and the KM product
    Π(1−dᵢ/nᵢ) becomes exp(Σ ln(...)) — a running LOG-sum window over
    the bounded age relation (a product window exists in neither
    engine; the log identity makes it window algebra). Counts exact;
    the log-sum is the only double chain, rounded at 4 over ≤
    span-in-days terms (ln bound of text_collocation_pmi, summed —
    magnitudes ≤ ln(1) keep absolute drift ~1e-15·terms).
    """
    ev = load_table(spark, sf_dir, "events")
    span = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_d"),
        F.max(F.to_date("ts")).alias("last_d"),
    )
    horizon = span.agg(F.max("last_d").alias("hmax"))
    obs = span.crossJoin(F.broadcast(horizon)).select(
        F.datediff("last_d", "first_d").cast("bigint").alias("dur"),
        (F.col("last_d") < F.date_sub(F.col("hmax"), 3)).alias("churned"),
    )
    at_age = obs.groupBy(F.col("dur").alias("age")).agg(
        F.count(F.when(F.col("churned"), 1)).alias("d_events"),
        F.count("*").alias("leaving"),
    )
    w_desc = Window.orderBy(F.desc("age")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = at_age.select(
        "age", "d_events", F.sum("leaving").over(w_desc).alias("n_risk")
    )
    w_asc = Window.orderBy("age").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    surv = F.round(
        F.exp(
            F.sum(
                F.log(1.0 - F.col("d_events").cast("double") / F.col("n_risk"))
            ).over(w_asc)
        ),
        4,
    )
    return risk.filter(F.col("d_events") < F.col("n_risk")).select(
        "age", "d_events", "n_risk", surv.alias("survival")
    )


@op(
    "agg_chi_square",
    oracle="""
    WITH obs AS (
        SELECT event_type,
               CAST(isodow(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT)
                   AS dow,
               CAST(count(*) AS BIGINT) AS o
        FROM events GROUP BY 1, 2
    ), margins AS (
        SELECT event_type, CAST(sum(o) AS BIGINT) AS row_n FROM obs GROUP BY 1
    ), cols AS (
        SELECT dow, CAST(sum(o) AS BIGINT) AS col_n FROM obs GROUP BY 1
    ), tot AS (
        SELECT CAST(sum(o) AS BIGINT) AS n FROM obs
    ), cells AS (
        SELECT o.event_type, o.dow, o.o,
               CAST(m.row_n AS DOUBLE) * c.col_n / t.n AS e
        FROM obs o
        JOIN margins m ON o.event_type = m.event_type
        JOIN cols c ON o.dow = c.dow
        CROSS JOIN tot t
    )
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           round(sum((o - e) * (o - e) / e), 4) AS chi2,
           (sum((o - e) * (o - e) / e)
            > 2.0 * count(*)) AS strongly_dependent
    FROM cells
    """,
    category=CAT,
)
def agg_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square statistic for (event_type × weekday)
    independence — "does the mix of events depend on the day of the
    week", the categorical-association test behind every contingency
    dashboard (dq_psi_drift compares ONE margin across time; chi²
    tests the full two-way table at once).

    Exact integer observed counts and margins; expected counts and
    the (O−E)²/E terms are the only doubles, computed with the
    identical expression on both engines and summed over a bounded
    |types|×7 cell relation (≤ 35 terms — no aggregation-order drift
    at 4 dp). The dependence verdict uses a χ²-per-cell heuristic
    threshold on the raw statistic — a df-indexed critical-value
    lookup is a broadcast join away, same plan shape.
    """
    ev = load_table(spark, sf_dir, "events")
    dow = F.expr("CAST(((dayofweek(CAST(ts AS DATE)) + 5) % 7) + 1 AS BIGINT)")
    obs = ev.groupBy("event_type", dow.alias("dow")).agg(
        F.count("*").alias("o")
    )
    margins = obs.groupBy("event_type").agg(F.sum("o").alias("row_n"))
    cols = obs.groupBy("dow").agg(F.sum("o").alias("col_n"))
    tot = obs.agg(F.sum("o").alias("n"))
    cells = (
        obs.join(F.broadcast(margins), "event_type")
        .join(F.broadcast(cols), "dow")
        .crossJoin(F.broadcast(tot))
        .select(
            "o",
            (
                F.col("row_n").cast("double") * F.col("col_n") / F.col("n")
            ).alias("e"),
        )
    )
    term = (F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")
    return cells.agg(
        F.count("*").alias("n_cells"),
        F.round(F.sum(term), 4).alias("chi2"),
        (F.sum(term) > 2.0 * F.count("*")).alias("strongly_dependent"),
    )


@op(
    "agg_geometric_mean",
    oracle="""
    WITH cents AS (
        SELECT l_returnflag,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS c
        FROM lineitem WHERE l_extendedprice > 0
    )
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           round(exp(avg(ln(CAST(c AS DOUBLE)))), 2) AS geo_mean_c,
           CAST(round(avg(CAST(c AS DOUBLE))) AS BIGINT) AS arith_mean_c
    FROM cents GROUP BY l_returnflag
    """,
    category=CAT,
)
def agg_geometric_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric mean of prices per group — the CORRECT average for
    multiplicative/ratio quantities (price indices, growth factors,
    lift): the arithmetic mean published next to it systematically
    overshoots on right-skewed money data (AM ≥ GM; the gap is itself
    a skew signal, cross-checkable against agg_skew_kurtosis).

    exp(avg(ln x)) over exact positive cents: the ln/exp pair is the
    only double path (text_collocation_pmi's single-transcendental
    bound, ±avg's engine-order drift below the 2nd decimal at these
    magnitudes — the same §2.X rule-1 slack every avg op here
    carries). Zero rows are excluded explicitly (ln domain), stated
    rather than silently NULLed. One map-combined aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cents = li.filter(F.col("l_extendedprice") > 0).select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("c"),
    )
    return cents.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.exp(F.avg(F.log(F.col("c").cast("double")))), 2).alias(
            "geo_mean_c"
        ),
        F.round(F.avg(F.col("c").cast("double"))).cast("bigint").alias(
            "arith_mean_c"
        ),
    )


PATH_LEN = 3
PATH_TOP_K = 25


@op(
    "agg_top_paths",
    oracle=f"""
    WITH ranked AS (
        SELECT user_id,
               CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
               event_type,
               row_number() OVER (
                   PARTITION BY user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE)
                   ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        FROM events
    ), paths AS (
        SELECT user_id, d,
               string_agg(event_type, '>' ORDER BY rn) AS path
        FROM ranked WHERE rn <= {PATH_LEN}
        GROUP BY user_id, d
    )
    SELECT path,
           CAST(count(*) AS BIGINT) AS n_sessions
    FROM paths
    GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT {PATH_TOP_K}
    """,
    category=CAT,
)
def agg_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top session-opening paths: the first {PATH_LEN} event types of
    each (user, day) session serialized as a path string, ranked by
    frequency — "how do sessions start", the navigation-flow report
    product analytics leads with (agg_markov_transitions models
    step-to-step flow; this reads whole openings).

    Shape: one (user, day)-partitioned rank window cut at
    {PATH_LEN} (WindowGroupLimit pushes the rn≤k filter into the
    sort at scale — the win_topn machinery), ordered string_agg
    serializes the path deterministically ((ts µs, event_id) total
    order), and the final top-{PATH_TOP_K} is TakeOrdered on
    (count DESC, path). Paths are tiny fixed-alphabet strings — the
    shuffle carries ≤ {PATH_LEN} short tokens per session.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", F.to_date("ts")).orderBy(
        "ts", "event_id"
    )
    ranked = ev.select(
        "user_id",
        F.to_date("ts").alias("d"),
        "event_type",
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("rn") <= PATH_LEN)
    paths = ranked.groupBy("user_id", "d").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("rn", "event_type"))
                ),
                lambda s: s.event_type,
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(PATH_TOP_K)
    )


ABC_BAND_C = 100000  # $1000 revenue bands


@op(
    "agg_abc_classes",
    oracle=f"""
    WITH part_rev AS (
        SELECT l_partkey,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_c
        FROM lineitem GROUP BY l_partkey
    ), bands AS (
        SELECT rev_c // {ABC_BAND_C} AS band,
               CAST(count(*) AS BIGINT) AS n_parts,
               CAST(sum(rev_c) AS BIGINT) AS band_rev_c
        FROM part_rev GROUP BY 1
    ), cum AS (
        SELECT band, n_parts, band_rev_c,
               CAST(sum(band_rev_c) OVER (ORDER BY band DESC) AS BIGINT)
                   AS rev_ge,
               CAST(sum(band_rev_c) OVER () AS BIGINT) AS total
        FROM bands
    )
    SELECT band, n_parts, band_rev_c,
           CASE WHEN (rev_ge - band_rev_c) * 5 < total * 4 THEN 'A'
                WHEN (rev_ge - band_rev_c) * 20 < total * 19 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM cum
    """,
    category=CAT,
)
def agg_abc_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification (A ≈ top 80 % of revenue, B next
    15 %, C the tail) — the stock-control 80/15/5 policy, assigned at
    REVENUE-BAND granularity: per-part revenues collapse into $1000
    bands first, the descending cumulative runs over the bounded band
    relation, and a band is class A while the revenue ABOVE it hasn't
    yet covered 80 % (integer cross-multiplication, agg_pareto_cut's
    crossing rule at two thresholds).

    The banding is the scale move: per-part cumulative shares would
    order a window over EVERY part (the Gini/Pareto lesson);
    band-granular ABC answers the same policy question over ≤
    max-rev/band rows at any corpus size — and band-boundary parts
    misclassifying by one band is exactly the tolerance the 80/15/5
    heuristic already implies. All exact integers.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part_rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("bigint")
        ).alias("rev_c")
    )
    bands = part_rev.groupBy(
        F.expr(f"rev_c div {ABC_BAND_C}").alias("band")
    ).agg(
        F.count("*").alias("n_parts"), F.sum("rev_c").alias("band_rev_c")
    )
    w_desc = Window.orderBy(F.desc("band")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    cum = bands.select(
        "band",
        "n_parts",
        "band_rev_c",
        F.sum("band_rev_c").over(w_desc).alias("rev_ge"),
        F.sum("band_rev_c").over(w_all).alias("total"),
    )
    above = F.col("rev_ge") - F.col("band_rev_c")
    return cum.select(
        "band",
        "n_parts",
        "band_rev_c",
        F.when(above * 5 < F.col("total") * 4, "A")
        .when(above * 20 < F.col("total") * 19, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


@op(
    "agg_price_index",
    oracle="""
    WITH stamped AS (
        SELECT l_partkey,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS rev_c,
               CAST(round(l_quantity) AS BIGINT) AS q,
               CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)
                   AS ed
        FROM lineitem
    ), bounds AS (
        SELECT min(ed) AS lo, max(ed) AS hi FROM stamped
    ), periods AS (
        SELECT l_partkey, rev_c, q,
               CASE WHEN ed * 2 < lo + hi THEN 0 ELSE 1 END AS period
        FROM stamped CROSS JOIN bounds
    ), unit AS (
        SELECT l_partkey, period,
               CAST(sum(rev_c) // sum(q) AS BIGINT) AS p_c,
               CAST(sum(q) AS BIGINT) AS q_tot
        FROM periods GROUP BY l_partkey, period
    ), both_p AS (
        SELECT b.l_partkey,
               b.p_c AS p0, b.q_tot AS q0, c.p_c AS p1
        FROM (SELECT * FROM unit WHERE period = 0) b
        JOIN (SELECT * FROM unit WHERE period = 1) c
          ON b.l_partkey = c.l_partkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(p1 * q0) AS BIGINT) AS cur_basket_c,
           CAST(sum(p0 * q0) AS BIGINT) AS base_basket_c,
           round(CAST(sum(p1 * q0) AS DOUBLE) / sum(p0 * q0), 6)
               AS laspeyres_index
    FROM both_p
    """,
    category=CAT,
)
def agg_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres price index between the first and second half of the
    shipping span — THE index-number formula (Σp₁q₀ / Σp₀q₀: what
    would the BASE period's basket cost at CURRENT prices) behind
    CPI-style reporting and internal price-drift monitors. Only parts
    traded in both periods enter (the matched-basket rule, stated
    rather than silently imputed).

    Exactness discipline: per-(part, period) unit prices are FLOOR
    cents (Σrev_c ÷ Σq integer division — deterministic, the
    agg_cohort_ltv rule; fractional unit prices would reopen float
    drift), the basket sums are then exact integer products, and the
    index is one rounded ratio. The period split is the dq_psi_drift
    exact-µs midpoint. Shape: two map-combined aggs + one part-keyed
    join — fully scalable, no window at all.
    """
    li = load_table(spark, sf_dir, "lineitem")
    ed = F.datediff(
        F.col("l_shipdate").cast("date"), F.lit("1970-01-01").cast("date")
    ).cast("bigint")
    stamped = li.select(
        "l_partkey",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("rev_c"),
        F.round(F.col("l_quantity")).cast("bigint").alias("q"),
        ed.alias("ed"),
    )
    bounds = stamped.agg(F.min("ed").alias("lo"), F.max("ed").alias("hi"))
    periods = stamped.crossJoin(F.broadcast(bounds)).withColumn(
        "period",
        F.when(F.col("ed") * 2 < F.col("lo") + F.col("hi"), 0).otherwise(1),
    )
    unit = periods.groupBy("l_partkey", "period").agg(
        F.expr("CAST(sum(rev_c) div sum(q) AS BIGINT)").alias("p_c"),
        F.sum("q").alias("q_tot"),
    )
    base = unit.filter(F.col("period") == 0).select(
        "l_partkey", F.col("p_c").alias("p0"), F.col("q_tot").alias("q0")
    )
    cur = unit.filter(F.col("period") == 1).select(
        "l_partkey", F.col("p_c").alias("p1")
    )
    both_p = base.join(cur, "l_partkey")
    return both_p.agg(
        F.count("*").alias("n_parts"),
        F.sum(F.col("p1") * F.col("q0")).alias("cur_basket_c"),
        F.sum(F.col("p0") * F.col("q0")).alias("base_basket_c"),
        F.round(
            F.sum(F.col("p1") * F.col("q0")).cast("double")
            / F.sum(F.col("p0") * F.col("q0")),
            6,
        ).alias("laspeyres_index"),
    )


@op(
    "agg_fulfillment_lag",
    oracle="""
    WITH lags AS (
        SELECT o_orderpriority,
               CAST(date_diff('day', CAST(o_orderdate AS DATE),
                              CAST(l_shipdate AS DATE)) AS BIGINT) AS lag_d
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(min(lag_d) AS BIGINT) AS min_lag,
           CAST(max(lag_d) AS BIGINT) AS max_lag,
           round(CAST(sum(lag_d) AS DOUBLE) / count(*), 4) AS avg_lag,
           round(CAST(sum(CASE WHEN lag_d <= 30 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS share_30d
    FROM lags
    GROUP BY o_orderpriority
    """,
    category=CAT,
)
def agg_fulfillment_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfillment lag per order priority: order-date → ship-date day
    gaps with the 30-day SLA attainment share — the supply-chain
    cycle-time report (agg_conversion_latency times the CLICKSTREAM
    funnel; this times the physical pipeline, keyed by the priority
    the warehouse actually staffs by).

    One orderkey-shuffle join (bucketed away at 100 TB) into one
    map-combined aggregate over 5 integers of state per priority;
    day lags are exact integers on zone-independent DATE casts, the
    avg/share doubles derive from integer sums in the final |prios|-row
    projection (§2.X rule 1).
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lag_d = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    ).cast("bigint")
    return (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .select("o_orderpriority", lag_d.alias("lag_d"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.min("lag_d").alias("min_lag"),
            F.max("lag_d").alias("max_lag"),
            F.round(F.sum("lag_d").cast("double") / F.count("*"), 4).alias(
                "avg_lag"
            ),
            F.round(
                F.sum(F.when(F.col("lag_d") <= 30, 1).otherwise(0)).cast(
                    "double"
                )
                / F.count("*"),
                6,
            ).alias("share_30d"),
        )
    )


@op(
    "agg_hhi_concentration",
    oracle="""
    WITH per_supp AS (
        SELECT r_name, s_suppkey,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount))
                             AS BIGINT)) AS BIGINT) AS rev_d
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, s_suppkey
    )
    SELECT r_name,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(sum(rev_d) AS BIGINT) AS total_rev_d,
           round(CAST(sum(rev_d * rev_d) AS DOUBLE)
                 / (CAST(sum(rev_d) AS DOUBLE) * sum(rev_d)), 6) AS hhi
    FROM per_supp
    GROUP BY r_name
    """,
    category=CAT,
)
def agg_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman market concentration per region: Σᵢ shareᵢ²
    of supplier revenue — the antitrust/marketplace-health metric
    (agg_gini_activity ranks inequality of USERS; HHI is the
    regulator's concentration index over FIRMS, and the two are not
    derivable from each other).

    Two-level rollup: supplier partials first (map-combined, the only
    fact shuffle), then a |regions|-row combine. HHI = Σrev²/(Σrev)²
    — derived from INTEGER whole-dollar sums (cents would square past
    BIGINT; dollars keep Σrev² ≤ ~4·10¹⁴/supplier, exact to ~10⁴
    suppliers/region — DECIMAL(38) states beyond, per the
    agg_skew_kurtosis contract), ratio rounded at 6 in the final
    projection.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev_d = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "bigint"
    )
    per_supp = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "s_suppkey")
        .agg(F.sum(rev_d).alias("rev_d"))
    )
    return per_supp.groupBy("r_name").agg(
        F.count("*").alias("n_suppliers"),
        F.sum("rev_d").alias("total_rev_d"),
        F.round(
            F.sum(F.col("rev_d") * F.col("rev_d")).cast("double")
            / (F.sum("rev_d").cast("double") * F.sum("rev_d")),
            6,
        ).alias("hhi"),
    )


@op(
    "agg_xyz_variability",
    oracle="""
    WITH monthly AS (
        SELECT l_partkey, strftime(l_shipdate, '%Y-%m') AS m,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
        FROM lineitem GROUP BY 1, 2
    ), moments AS (
        SELECT l_partkey,
               CAST(count(*) AS BIGINT) AS n_months,
               CAST(sum(q) AS BIGINT) AS s1,
               CAST(sum(q * q) AS BIGINT) AS s2
        FROM monthly GROUP BY l_partkey
    ), scored AS (
        SELECT l_partkey, n_months,
               round(sqrt(CAST(n_months AS DOUBLE) * s2
                          - CAST(s1 AS DOUBLE) * s1) / s1, 4) AS cv
        FROM moments
    )
    SELECT CASE WHEN cv < 0.5 THEN 'X' WHEN cv < 1.0 THEN 'Y'
                ELSE 'Z' END AS xyz_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           round(min(cv), 4) AS min_cv,
           round(max(cv), 4) AS max_cv
    FROM scored GROUP BY 1
    """,
    category=CAT,
)
def agg_xyz_variability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XYZ demand-variability classification — the planning twin of
    agg_abc_classes (ABC ranks parts by revenue MASS; XYZ bands them
    by demand STABILITY, and inventory policy is set on the ABC×XYZ
    cross). Per-part monthly demand → coefficient of variation →
    X (steady, cv<0.5) / Y (fluctuating, <1) / Z (erratic).

    The win_group_standardize integer-moment protocol one level up:
    monthly quantity sums are exact integers, per-part (n, Σq, Σq²)
    is a second map-combined aggregate, and the ONLY double is the
    final cv = √(n·Σq²−(Σq)²)/Σq, formed identically both engines and
    rounded at 4 BEFORE the class CASE reads it (§2.X: flags compare
    rounded values — a class boundary on the raw double would be a
    coin flip at cv≈0.5). Class summary output keeps the hashed
    relation at 3 rows; the 20k-part scored relation never leaves
    the engine.
    """
    li = load_table(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        "l_partkey", F.date_format("l_shipdate", "yyyy-MM").alias("m")
    ).agg(F.sum(F.round("l_quantity").cast("bigint")).alias("q"))
    moments = monthly.groupBy("l_partkey").agg(
        F.count("*").alias("n_months"),
        F.sum("q").alias("s1"),
        F.sum(F.col("q") * F.col("q")).alias("s2"),
    )
    cv = F.round(
        F.sqrt(
            F.col("n_months").cast("double") * F.col("s2")
            - F.col("s1").cast("double") * F.col("s1")
        )
        / F.col("s1"),
        4,
    )
    scored = moments.select("l_partkey", "n_months", cv.alias("cv"))
    return scored.groupBy(
        F.when(F.col("cv") < 0.5, "X")
        .when(F.col("cv") < 1.0, "Y")
        .otherwise("Z")
        .alias("xyz_class")
    ).agg(
        F.count("*").alias("n_parts"),
        F.round(F.min("cv"), 4).alias("min_cv"),
        F.round(F.max("cv"), 4).alias("max_cv"),
    )


@op(
    "agg_contribution_waterfall",
    oracle="""
    WITH stamped AS (
        SELECT o_custkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS rev_c,
               CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
                   AS ed
        FROM orders
    ), bounds AS (
        SELECT min(ed) AS lo, max(ed) AS hi FROM stamped
    ), seg AS (
        SELECT c_mktsegment,
               CAST(sum(CASE WHEN ed * 2 < lo + hi THEN rev_c ELSE 0 END)
                    AS BIGINT) AS rev0_c,
               CAST(sum(CASE WHEN ed * 2 < lo + hi THEN 0 ELSE rev_c END)
                    AS BIGINT) AS rev1_c
        FROM stamped CROSS JOIN bounds
        JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    ), steps AS (
        SELECT 0 AS step_id, 'P0_TOTAL' AS label,
               CAST(sum(rev0_c) AS BIGINT) AS delta_c
        FROM seg
        UNION ALL
        SELECT CAST(row_number() OVER (ORDER BY c_mktsegment) AS INTEGER),
               c_mktsegment, rev1_c - rev0_c
        FROM seg
        UNION ALL
        SELECT (SELECT count(*) FROM seg) + 1, 'P1_TOTAL',
               CAST(sum(rev1_c) AS BIGINT)
        FROM seg
    )
    SELECT CAST(step_id AS BIGINT) AS step_id, label,
           CAST(delta_c AS BIGINT) AS delta_c,
           CAST(CASE WHEN label = 'P1_TOTAL' THEN delta_c
                     ELSE sum(delta_c) OVER (ORDER BY step_id) END
                AS BIGINT) AS running_c
    FROM steps
    """,
    category=CAT,
)
def agg_contribution_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contribution WATERFALL (the CFO bridge chart): total revenue of
    the first half-period, one signed delta step per market segment,
    landing exactly on the second half's total — "which segments
    drove the change", with the invariant P0 + Σdeltas = P1 holding
    in EXACT integer cents (a float waterfall never reconciles and
    finance rejects it). agg_new_returning_users decomposes growth by
    user status; this decomposes it by dimension attribute, the other
    axis every QBR deck shows.

    Epoch-day midpoint split (agg_price_index rule), one fact shuffle
    into the segment rollup (customer dim broadcast), then the bridge
    assembles over the |segments|+2-row relation — the running
    cumulative window is aggregated-relation-sized (ts_yoy_growth
    rule). P1_TOTAL's running value restates the END total rather
    than doubling it (waterfall convention: the last bar is absolute).
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    stamped = o.select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("rev_c"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("ed"),
    )
    bounds = stamped.agg(
        F.min("ed").alias("lo"), F.max("ed").alias("hi")
    )
    seg = (
        stamped.crossJoin(F.broadcast(bounds))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.sum(
                F.when(
                    F.col("ed") * 2 < F.col("lo") + F.col("hi"), F.col("rev_c")
                ).otherwise(0)
            ).alias("rev0_c"),
            F.sum(
                F.when(
                    F.col("ed") * 2 < F.col("lo") + F.col("hi"), 0
                ).otherwise(F.col("rev_c"))
            ).alias("rev1_c"),
        )
    )
    w_seg = Window.orderBy("c_mktsegment")
    n_seg = seg.agg(F.count("*").alias("n")).select("n")
    p0 = seg.agg(
        F.lit(0).alias("step_id"),
        F.lit("P0_TOTAL").alias("label"),
        F.sum("rev0_c").alias("delta_c"),
    )
    mids = seg.select(
        F.row_number().over(w_seg).alias("step_id"),
        F.col("c_mktsegment").alias("label"),
        (F.col("rev1_c") - F.col("rev0_c")).alias("delta_c"),
    )
    p1 = seg.crossJoin(F.broadcast(n_seg)).groupBy("n").agg(
        F.sum("rev1_c").alias("delta_c")
    ).select(
        (F.col("n") + 1).cast("int").alias("step_id"),
        F.lit("P1_TOTAL").alias("label"),
        "delta_c",
    )
    steps = p0.unionByName(mids).unionByName(p1)
    w_run = Window.orderBy("step_id")
    return steps.select(
        F.col("step_id").cast("bigint").alias("step_id"),
        "label",
        F.col("delta_c").cast("bigint").alias("delta_c"),
        F.when(F.col("label") == "P1_TOTAL", F.col("delta_c"))
        .otherwise(F.sum("delta_c").over(w_run))
        .cast("bigint")
        .alias("running_c"),
    )


FUNNEL_STEP_H = 72


@op(
    "agg_window_funnel_strict",
    oracle=f"""
    WITH t1 AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup' THEN ts END) AS ts1
        FROM events GROUP BY user_id
    ), t2 AS (
        SELECT e.user_id, min(e.ts) AS ts2
        FROM events e JOIN t1 USING (user_id)
        WHERE e.event_type = 'view' AND t1.ts1 IS NOT NULL
          AND e.ts > t1.ts1
          AND e.ts <= t1.ts1 + INTERVAL {FUNNEL_STEP_H} HOURS
        GROUP BY e.user_id
    ), t3 AS (
        SELECT e.user_id, min(e.ts) AS ts3
        FROM events e JOIN t2 USING (user_id)
        WHERE e.event_type = 'purchase'
          AND e.ts > t2.ts2
          AND e.ts <= t2.ts2 + INTERVAL {FUNNEL_STEP_H} HOURS
        GROUP BY e.user_id
    )
    SELECT CAST((SELECT count(ts1) FROM t1) AS BIGINT) AS n_signup,
           CAST((SELECT count(*) FROM t2) AS BIGINT) AS n_view_w,
           CAST((SELECT count(*) FROM t3) AS BIGINT) AS n_purchase_w,
           round(CAST((SELECT count(*) FROM t2) AS DOUBLE)
                 / (SELECT count(ts1) FROM t1), 6) AS rate_12,
           round(CAST((SELECT count(*) FROM t3) AS DOUBLE)
                 / nullif((SELECT count(*) FROM t2), 0), 6) AS rate_23
    """,
    category=CAT,
)
def agg_window_funnel_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRICT windowed funnel (ClickHouse windowFunnel semantics):
    signup → first view STRICTLY AFTER it within {FUNNEL_STEP_H} h →
    first purchase strictly after THAT view within {FUNNEL_STEP_H} h.
    agg_funnel_conversion's loose funnel only requires "later"; the
    strict per-step deadline chain is what product analytics actually
    ships, and the two differ exactly on slow converters.

    Each stage anchors on the PREVIOUS stage's earliest qualifying
    timestamp, so the dependency is sequential — expressed as a
    3-stage agg→join chain, every stage shuffling only (user_id, one
    timestamp) on the same key (at 100 TB the three exchanges
    coalesce onto one bucketed layout; state per user is ONE µs
    value per stage, the streaming-state bound). Exact µs window
    arithmetic via unix_micros; rates derive from the three counts
    in a 1-row projection.
    """
    ev = load_table(spark, sf_dir, "events")
    step_us = FUNNEL_STEP_H * 3600 * 1_000_000
    t1 = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "ts1"
        )
    )
    t2 = (
        ev.join(t1.filter(F.col("ts1").isNotNull()), "user_id")
        .filter(
            (F.col("event_type") == "view")
            & (F.unix_micros("ts") > F.unix_micros("ts1"))
            & (F.unix_micros("ts") <= F.unix_micros("ts1") + step_us)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts2"))
    )
    t3 = (
        ev.join(t2, "user_id")
        .filter(
            (F.col("event_type") == "purchase")
            & (F.unix_micros("ts") > F.unix_micros("ts2"))
            & (F.unix_micros("ts") <= F.unix_micros("ts2") + step_us)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts3"))
    )
    counts = (
        t1.agg(F.count("ts1").alias("n_signup"))
        .crossJoin(t2.agg(F.count("*").alias("n_view_w")))
        .crossJoin(t3.agg(F.count("*").alias("n_purchase_w")))
    )
    return counts.select(
        "n_signup",
        "n_view_w",
        "n_purchase_w",
        F.round(
            F.col("n_view_w").cast("double") / F.col("n_signup"), 6
        ).alias("rate_12"),
        F.round(
            F.col("n_purchase_w").cast("double")
            / F.nullif(F.col("n_view_w"), F.lit(0)),
            6,
        ).alias("rate_23"),
    )


@op(
    "agg_semi_additive_eom",
    oracle="""
    WITH readings AS (
        SELECT user_id,
               CAST((CAST(CAST(ts AS TIMESTAMP) AS DATE)
                     - DATE '1970-01-01') // 7 AS BIGINT) AS wk,
               ts, event_id,
               CAST(round(value * 100) AS BIGINT) AS bal_c
        FROM events
    ), last_per AS (
        SELECT user_id, wk, bal_c
        FROM (
            SELECT user_id, wk, bal_c,
                   row_number() OVER (PARTITION BY user_id, wk
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM readings
        ) WHERE rn = 1
    )
    SELECT wk,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(bal_c) AS BIGINT) AS eow_total_c,
           CAST(sum(bal_c) // count(*) AS BIGINT) AS eow_avg_c
    FROM last_per GROUP BY wk
    """,
    category=CAT,
)
def agg_semi_additive_eom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMI-ADDITIVE measure handling: treating each user's event value
    as a balance READING, the end-of-week total is the sum of each
    user's LAST reading that week — never the sum of all readings
    (balances add across ACCOUNTS but not across TIME; naive SUM
    overstates by the reading frequency, the classic snapshot-fact
    mistake every finance warehouse guards against; win_first_last
    exercises the window primitive, this is the business semantics
    that needs it). Periods are ABSOLUTE epoch weeks (epoch-day //
    7, the agg_retention_cohort rule) — locale week-of-year
    conventions are §2.X dialect bait.

    One (user, week) window picking the latest reading (DESC with
    event_id tie-break, WindowGroupLimit prunes below the exchange),
    then a |months|-row rollup. Exact cents; the per-user average is
    INTEGER floor division — both engines' `//`-div on BIGINT, no
    double anywhere.
    """
    ev = load_table(spark, sf_dir, "events")
    readings = ev.select(
        "user_id",
        F.expr("datediff(cast(ts as date), date'1970-01-01') div 7")
        .cast("bigint")
        .alias("wk"),
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("bal_c"),
    )
    w = Window.partitionBy("user_id", "wk").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    last_per = (
        readings.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "wk", "bal_c")
    )
    return last_per.groupBy("wk").agg(
        F.count("*").alias("n_users"),
        F.sum("bal_c").alias("eow_total_c"),
        F.expr("sum(bal_c) div count(*)").alias("eow_avg_c"),
    )


@op(
    "agg_receivables_aging",
    oracle="""
    WITH horizon AS (
        SELECT max(CAST(o_orderdate AS DATE)) AS maxd FROM orders
    ), open_orders AS (
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS amt_c,
               CAST(date_diff('day', CAST(o_orderdate AS DATE),
                              (SELECT maxd FROM horizon)) AS BIGINT) AS age_d
        FROM orders WHERE o_orderstatus = 'O'
    )
    SELECT CASE WHEN age_d <= 30 THEN 'current'
                WHEN age_d <= 60 THEN '31-60'
                WHEN age_d <= 90 THEN '61-90'
                ELSE '90+' END AS age_bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(amt_c) AS BIGINT) AS amt_c,
           CAST(min(age_d) AS BIGINT) AS min_age,
           CAST(max(age_d) AS BIGINT) AS max_age
    FROM open_orders GROUP BY 1
    """,
    category=CAT,
)
def agg_receivables_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Receivables AGING report: open ('O') orders bucketed by days
    outstanding relative to the book's latest date (current / 31-60 /
    61-90 / 90+), with count and exact cent exposure per bucket — the
    collections report every AR close produces, and the complement of
    dq_freshness (that measures the FEED's staleness; this measures
    the BUSINESS's). Anchoring on max(o_orderdate) keeps the op
    deterministic — a wall-clock anchor would violate §2.X rule 5.

    1-row horizon broadcast (same shape as agg_rfm_segments'
    recency), status filter pushed into the scan, exact integer day
    ages and cents, bucket CASE on integers only — no double exists
    anywhere in this op.
    """
    o = load_table(spark, sf_dir, "orders")
    horizon = o.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("maxd")
    )
    open_orders = (
        o.filter(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(horizon))
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100)
            .cast("bigint")
            .alias("amt_c"),
            F.datediff("maxd", F.col("o_orderdate").cast("date"))
            .cast("bigint")
            .alias("age_d"),
        )
    )
    bucket = (
        F.when(F.col("age_d") <= 30, "current")
        .when(F.col("age_d") <= 60, "31-60")
        .when(F.col("age_d") <= 90, "61-90")
        .otherwise("90+")
    )
    return open_orders.groupBy(bucket.alias("age_bucket")).agg(
        F.count("*").alias("n_orders"),
        F.sum("amt_c").alias("amt_c"),
        F.min("age_d").alias("min_age"),
        F.max("age_d").alias("max_age"),
    )


@op(
    "agg_price_volume_mix",
    oracle="""
    WITH stamped AS (
        SELECT l_partkey,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS rev_c,
               CAST(round(l_quantity) AS BIGINT) AS q,
               CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)
                   AS ed
        FROM lineitem
    ), bounds AS (
        SELECT min(ed) AS lo, max(ed) AS hi FROM stamped
    ), unit AS (
        SELECT l_partkey,
               CASE WHEN ed * 2 < lo + hi THEN 0 ELSE 1 END AS period,
               CAST(sum(rev_c) // sum(q) AS BIGINT) AS p_c,
               CAST(sum(q) AS BIGINT) AS q_tot
        FROM stamped CROSS JOIN bounds
        GROUP BY l_partkey, period
    ), matched AS (
        SELECT b.l_partkey, b.p_c AS p0, b.q_tot AS q0,
               c.p_c AS p1, c.q_tot AS q1
        FROM (SELECT * FROM unit WHERE period = 0) b
        JOIN (SELECT * FROM unit WHERE period = 1) c USING (l_partkey)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum((q1 - q0) * p0) AS BIGINT) AS volume_effect_c,
           CAST(sum(q0 * (p1 - p0)) AS BIGINT) AS price_effect_c,
           CAST(sum((q1 - q0) * (p1 - p0)) AS BIGINT) AS cross_effect_c,
           CAST(sum(q1 * p1 - q0 * p0) AS BIGINT) AS delta_c
    FROM matched
    """,
    category=CAT,
)
def agg_price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRICE-VOLUME-MIX decomposition (the other CFO bridge): the
    revenue change between the shipping-span halves split into volume
    effect (Δq·p₀), price effect (q₀·Δp) and cross term (Δq·Δp) over
    the matched part basket — with the algebraic identity
    volume + price + cross = Δrev holding EXACTLY in integer cents
    (q₁p₁−q₀p₀ ≡ Δq·p₀ + q₀·Δp + Δq·Δp — a float decomposition never
    reconciles and gets hand-waved in review;
    agg_contribution_waterfall splits Δ by DIMENSION, this splits it
    by CAUSE, and agg_price_index is the ratio form of the same
    basket).

    Same exact floor-cent unit prices and epoch-day midpoint split as
    agg_price_index (revenue here is the derived q·p on the matched
    basket — stated, not hidden); one fact shuffle to per-(part,
    period) partials, one partkey join, a 1-row projection of exact
    BIGINTs — no double exists in this op at all.
    """
    li = load_table(spark, sf_dir, "lineitem")
    stamped = li.select(
        "l_partkey",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("rev_c"),
        F.round(F.col("l_quantity")).cast("bigint").alias("q"),
        F.datediff(F.col("l_shipdate").cast("date"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("ed"),
    )
    bounds = stamped.agg(F.min("ed").alias("lo"), F.max("ed").alias("hi"))
    unit = (
        stamped.crossJoin(F.broadcast(bounds))
        .groupBy(
            "l_partkey",
            F.when(F.col("ed") * 2 < F.col("lo") + F.col("hi"), 0)
            .otherwise(1)
            .alias("period"),
        )
        .agg(
            F.expr("sum(rev_c) div sum(q)").alias("p_c"),
            F.sum("q").alias("q_tot"),
        )
    )
    b = unit.filter(F.col("period") == 0).select(
        "l_partkey", F.col("p_c").alias("p0"), F.col("q_tot").alias("q0")
    )
    c = unit.filter(F.col("period") == 1).select(
        "l_partkey", F.col("p_c").alias("p1"), F.col("q_tot").alias("q1")
    )
    matched = b.join(c, "l_partkey")
    dq = F.col("q1") - F.col("q0")
    dp = F.col("p1") - F.col("p0")
    return matched.groupBy().agg(
        F.count("*").alias("n_parts"),
        F.sum(dq * F.col("p0")).alias("volume_effect_c"),
        F.sum(F.col("q0") * dp).alias("price_effect_c"),
        F.sum(dq * dp).alias("cross_effect_c"),
        F.sum(
            F.col("q1") * F.col("p1") - F.col("q0") * F.col("p0")
        ).alias("delta_c"),
    )


@op(
    "agg_runs_test",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    ), signs AS (
        SELECT d, cnt,
               CASE WHEN cnt - lag(cnt) OVER (ORDER BY d) > 0
                    THEN 1 ELSE 0 END AS up,
               lag(cnt) OVER (ORDER BY d) AS prev
        FROM daily
    ), marked AS (
        SELECT up,
               CASE WHEN lag(up) OVER (ORDER BY d) IS NULL
                         OR up <> lag(up) OVER (ORDER BY d)
                    THEN 1 ELSE 0 END AS new_run
        FROM signs WHERE prev IS NOT NULL
    )
    SELECT CAST(sum(new_run) AS BIGINT) AS n_runs,
           CAST(sum(up) AS BIGINT) AS n_up,
           CAST(count(*) - sum(up) AS BIGINT) AS n_down,
           round(1 + 2.0 * sum(up) * (count(*) - sum(up)) / count(*), 4)
               AS expected_runs,
           (CAST(sum(new_run) AS DOUBLE)
            < 1 + 2.0 * sum(up) * (count(*) - sum(up)) / count(*) / 2)
               AS trending_flag
    FROM marked
    """,
    category=CAT,
)
def agg_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz RUNS TEST on the daily volume direction sequence:
    observed up/down runs vs the expected count 1 + 2·n₁·n₀/n under
    randomness — far fewer runs than expected = trending/autocorrelated
    load, far more = oscillating (dq_anomaly_zscore judges LEVELS;
    the runs test judges the ORDERING, which level statistics cannot
    see: the same histogram of days can be random or a perfect trend).

    Two ordered windows (lag for direction, lag for run boundary)
    over the ≤|days| daily aggregate (ts_yoy_growth rule); runs are
    counted as boundary markers summed — no iterative scan. Ties
    (Δ=0) fold into 'down' by stated convention. Integer counts; the
    expected-runs double derives in the 1-row projection, and the
    trend flag compares against HALF the expectation — a crude but
    stated decision rule (the z-variance form is a documented
    refinement, not needed for the parity contract).
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").alias("cnt")
    )
    w = Window.orderBy("d")
    signs = daily.select(
        "d",
        F.when(F.col("cnt") - F.lag("cnt").over(w) > 0, 1)
        .otherwise(0)
        .alias("up"),
        F.lag("cnt").over(w).alias("prev"),
    )
    marked = signs.filter(F.col("prev").isNotNull()).select(
        "up",
        F.when(
            F.lag("up").over(w).isNull()
            | (F.col("up") != F.lag("up").over(w)),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    n = F.count("*")
    n_up = F.sum("up")
    expected = 1 + 2.0 * n_up * (n - n_up) / n
    return marked.groupBy().agg(
        F.sum("new_run").alias("n_runs"),
        n_up.alias("n_up"),
        (n - n_up).alias("n_down"),
        F.round(expected, 4).alias("expected_runs"),
        (F.sum("new_run").cast("double") < expected / 2).alias(
            "trending_flag"
        ),
    )


@op(
    "agg_ab_test_lift",
    oracle="""
    WITH assigned AS (
        SELECT user_id, user_id % 2 AS arm,
               CASE WHEN sum(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) >= 15
                    THEN 1 ELSE 0 END AS converted
        FROM events GROUP BY user_id
    ), arms AS (
        SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n0,
               CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END)
                    AS BIGINT) AS c0,
               CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1,
               CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END)
                    AS BIGINT) AS c1
        FROM assigned
    )
    SELECT n0, c0, n1, c1,
           round(CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0, 6)
               AS abs_lift,
           round((CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
                 / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                        * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                        * (1.0 / n0 + 1.0 / n1)), 4) AS z_score
    FROM arms
    """,
    category=CAT,
)
def agg_ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users hash-split into two arms
    (user_id parity — the deterministic assignment every experiment
    platform uses), per-arm conversion to HEAVY BUYER (≥15 purchases
    in the window — a near-universal event converts at ~1.0 and
    degenerates the pooled z to 0/0, found live by ANSI mode's
    divide-by-zero; interior rates are a metric-design requirement,
    not a nicety), absolute lift,
    and the pooled two-proportion z-score — the experimentation
    staple (agg_chi_square tests INDEPENDENCE on a contingency table;
    the two-proportion z is the directional arm-vs-arm readout with
    effect size, which is what a launch review actually reads).

    Per-user conversion collapses first (one user_id shuffle — a user
    converts once no matter how many purchases, the unit-of-analysis
    rule that naive event-counting gets wrong), then a 1-row arm
    rollup; lift and z derive from 4 integers with the identical
    double expression (§2.X rule 1). The z is reported as a statistic
    — significance thresholds are the reader's policy, not the
    engine's.
    """
    ev = load_table(spark, sf_dir, "events")
    assigned = ev.groupBy("user_id").agg(
        F.when(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            >= 15,
            1,
        )
        .otherwise(0)
        .alias("converted")
    ).select((F.col("user_id") % 2).alias("arm"), "converted")
    arms = assigned.groupBy().agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0))
        .alias("c0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0))
        .alias("c1"),
    )
    p0 = F.col("c0").cast("double") / F.col("n0")
    p1 = F.col("c1").cast("double") / F.col("n1")
    pp = (F.col("c0") + F.col("c1")).cast("double") / (
        F.col("n0") + F.col("n1")
    )
    return arms.select(
        "n0",
        "c0",
        "n1",
        "c1",
        F.round(p1 - p0, 6).alias("abs_lift"),
        F.round(
            (p1 - p0)
            / F.sqrt(
                pp * (1 - pp) * (1.0 / F.col("n0") + 1.0 / F.col("n1"))
            ),
            4,
        ).alias("z_score"),
    )


def _exact_global_ntile(
    df: DataFrame,
    k: int,
    val_col: str,
    tie_col: str,
    out_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """EXACT ntile(k) over ORDER BY (val_col, tie_col) with NO global
    window (r8 verdict item 4) — the scale-safe replacement for
    ``F.ntile(k).over(Window.orderBy(...))``, which moves the whole
    relation into one task.

    Mechanics: bucket rows by deterministic value ranges of val_col
    (n_buckets over the broadcast [min, max] — no sampling, unlike
    repartitionByRange, whose RangePartitioner draws bounds
    per-materialization so two references to the same exchange could
    disagree), count each bucket once, turn the tiny count table into
    cumulative offsets, broadcast them back, add a per-BUCKET
    row_number: offset + local rank is the exact global rank, computed
    entirely partition-parallel. The bin is then pure ntile ARITHMETIC
    on the exact rank (the first n%k bins take ⌈n/k⌉ rows — the T-SQL
    /Spark/DuckDB ntile contract), so results are bit-identical to the
    window form, tie-break included (tie_col must make the composite
    key unique). Worst-case value skew (every row the same val_col)
    degrades to one populated bucket — still correct, just serial for
    the local sort, and the only unpartitioned window runs over the
    BOUNDED n_buckets-row count table.
    """
    ranked = _exact_global_rank(
        df, val_col, tie_col, "_egn_rnk", n_buckets=n_buckets,
        keep_total=True,
    )
    banded = ranked.withColumn(
        out_col,
        F.expr(
            f"CASE WHEN _egn_rnk <= (_egn_n div {k} + 1) * (_egn_n % {k}) "
            f"THEN 1 + (_egn_rnk - 1) div (_egn_n div {k} + 1) "
            f"ELSE _egn_n % {k} + 1 + (_egn_rnk - (_egn_n div {k} + 1) "
            f"* (_egn_n % {k}) - 1) div greatest(_egn_n div {k}, 1) END"
        ),
    )
    return banded.drop("_egn_n", "_egn_rnk")


def _exact_global_rank(
    df: DataFrame,
    val_col: str,
    tie_col: str,
    out_col: str,
    n_buckets: int = 64,
    keep_total: bool = False,
    order_cols: list | None = None,
) -> DataFrame:
    """EXACT dense 1-based global rank over ORDER BY (val_col ASC,
    tie_col ASC) with NO global window — the shared rank kernel under
    ``_exact_global_ntile`` and the full-output ranking ops (r8):
    deterministic value-range buckets over the broadcast [min, max],
    one count per bucket, broadcast cumulative offsets, per-bucket
    row_number; offset + local rank == the exact global rank. For a
    DESCENDING rank, pass the NEGATED (pre-quantized BIGINT) value —
    rank over (v DESC, tie ASC) == rank over (-v ASC, tie ASC).
    val_col must be integral (the bucket arithmetic uses div).
    ``keep_total`` retains the ``_egn_n`` row-count column for callers
    that need it (the ntile arithmetic). ``order_cols`` overrides the
    in-bucket ordering when the true sort key is not simply
    (val_col, tie_col) — val_col must then be a NUMERIC MONOTONE
    NON-DECREASING function of that order's leading columns (e.g. an
    order-preserving fixed-width byte-prefix pack of a string key),
    so equal-order rows land in one bucket and bucket boundaries
    respect the order; coarseness/collisions only affect balance,
    never correctness.

    Overflow guard (r8 ADVICE): the integer bucket expression
    ``((val - lo) * n_buckets) div (hi - lo + 1)`` overflows BIGINT
    once the value range exceeds ~2^63/n_buckets, which would silently
    misbucket (and so misrank) wide-range keys. The kernel therefore
    branches on the range itself: integer arithmetic when provably
    safe, else monotone double scaling with a least/greatest clamp.
    The double branch stays CORRECT because bucketing only needs
    bucket(val) non-decreasing in val — int64→double conversion is
    weakly order-preserving (IEEE round-to-nearest), as are the
    positive-constant multiply and floor — so at worst precision loss
    merges neighboring values into one bucket (balance, not
    correctness; the in-bucket sort still orders them exactly)."""
    rng = df.agg(F.min(val_col).alias("_egn_lo"), F.max(val_col).alias("_egn_hi"))
    # Conservative integer-path gate: range strictly below 2^62/n_buckets
    # (the compare itself is double-side, so it never overflows either).
    int_safe_range = (1 << 62) // n_buckets
    bucketed = df.crossJoin(F.broadcast(rng)).withColumn(
        "_egn_bkt",
        F.expr(
            f"CASE WHEN CAST(_egn_hi AS DOUBLE) - CAST(_egn_lo AS DOUBLE)"
            f" < {int_safe_range} THEN"
            f" least({n_buckets - 1}, (({val_col} - _egn_lo) * {n_buckets})"
            " div (_egn_hi - _egn_lo + 1))"
            f" ELSE least({n_buckets - 1}, greatest(0, CAST(floor("
            f"(CAST({val_col} AS DOUBLE) - CAST(_egn_lo AS DOUBLE))"
            f" / (CAST(_egn_hi AS DOUBLE) - CAST(_egn_lo AS DOUBLE) + 1.0D)"
            f" * {n_buckets}) AS BIGINT))) END"
        ),
    )
    counts = bucketed.groupBy("_egn_bkt").agg(F.count("*").alias("_egn_cnt"))
    w_off = Window.orderBy("_egn_bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "_egn_bkt",
        F.coalesce(F.sum("_egn_cnt").over(w_off), F.lit(0)).alias("_egn_off"),
        F.sum("_egn_cnt").over(Window.partitionBy()).alias("_egn_n"),
    )
    w_local = Window.partitionBy("_egn_bkt").orderBy(
        *(order_cols if order_cols is not None else [val_col, tie_col])
    )
    ranked = bucketed.join(F.broadcast(offsets), "_egn_bkt").withColumn(
        out_col, F.col("_egn_off") + F.row_number().over(w_local)
    )
    dropped = ["_egn_lo", "_egn_hi", "_egn_bkt", "_egn_cnt", "_egn_off"]
    if not keep_total:
        dropped.append("_egn_n")
    return ranked.drop(*dropped)


@op(
    "agg_lorenz_deciles",
    oracle="""
    WITH per_cust AS (
        SELECT o_custkey,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_c
        FROM orders GROUP BY o_custkey
    ), binned AS (
        SELECT o_custkey, rev_c,
               ntile(10) OVER (ORDER BY rev_c, o_custkey) AS decile
        FROM per_cust
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(rev_c) AS BIGINT) AS rev_c,
           round(CAST(sum(sum(rev_c)) OVER (ORDER BY decile) AS DOUBLE)
                 / sum(sum(rev_c)) OVER (), 6) AS cum_share
    FROM binned GROUP BY decile
    """,
    category=CAT,
)
def agg_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LORENZ CURVE deciles: customers ranked by revenue, split into
    10 equal-count bins, with each bin's exact cent mass and the
    cumulative share — the chart BEHIND agg_gini_activity's single
    number (the Gini is twice the area above this curve; an account
    review reads the curve: "bottom 50% of customers carry 11% of
    revenue" is decile 5's cum_share).

    Customer rollup first (the only fact shuffle), then EXACT
    equal-count deciles WITHOUT a global window via
    ``_exact_global_ntile`` (r8 verdict item 4 -- the docstring used
    to promise this path beyond 10^7 customers; now it IS the path at
    every scale): bucketed exact global ranks + ntile arithmetic,
    bit-identical to the oracle's ntile with the (rev, custkey)
    tie-break preserved. The only unpartitioned windows left run over
    BOUNDED relations: the 64-row bucket-count table inside the
    helper and the 10-row decile rollup here. Cumulative share is a
    nested window over the latter -- free.
    """
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("bigint")
        ).alias("rev_c")
    )
    binned = _exact_global_ntile(
        per_cust, 10, "rev_c", "o_custkey", "decile"
    ).select("rev_c", F.col("decile").cast("int").alias("decile"))
    rolled = binned.groupBy("decile").agg(
        F.count("*").alias("n_customers"),
        F.sum("rev_c").alias("rev_c"),
    )
    w_cum = Window.orderBy("decile")
    w_all = Window.partitionBy()
    return rolled.select(
        F.col("decile").cast("bigint").alias("decile"),
        "n_customers",
        "rev_c",
        F.round(
            F.sum("rev_c").over(w_cum).cast("double")
            / F.sum("rev_c").over(w_all),
            6,
        ).alias("cum_share"),
    )


TE_SMOOTHING_M = 100


@op(
    "agg_target_encoding",
    oracle=f"""
    WITH base AS (
        SELECT o_orderpriority,
               CAST(round(o_totalprice * 100) AS BIGINT) AS y_c
        FROM orders
    ), g AS (
        SELECT CAST(sum(y_c) AS BIGINT) AS gs,
               CAST(count(*) AS BIGINT) AS gn
        FROM base
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(y_c) AS DOUBLE) / count(*) / 100, 4) AS raw_mean,
           round((sum(y_c) + {TE_SMOOTHING_M} * (CAST(gs AS DOUBLE) / gn))
                 / (count(*) + {TE_SMOOTHING_M}) / 100, 4) AS smoothed_enc
    FROM base CROSS JOIN g
    GROUP BY o_orderpriority, gs, gn
    """,
    category=CAT,
)
def agg_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """m-estimate TARGET ENCODING: each category (order priority)
    encoded as the smoothed target mean
    (Σy + m·global_mean)/(n + m), m={TE_SMOOTHING_M} — the
    feature-engineering classic for high-cardinality categoricals,
    where the smoothing shrinks rare categories toward the prior so
    a 3-row category can't memorize its targets (the leakage that
    sinks naive mean encoding; a production pipeline adds
    out-of-fold splitting on top — corpus_split_hash's folds are
    exactly the splitter this composes with).

    One map-combined category rollup + a 1-row global-prior
    broadcast; the encoding derives from integer sums with the
    identical double expression per §2.X rule 1. At 10⁶ categories
    this is still two aggregates — the whole point of mean encoding
    over one-hot at scale.
    """
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("y_c"),
    )
    g = base.agg(
        F.sum("y_c").alias("gs"), F.count("*").alias("gn")
    )
    gm = F.col("gs").cast("double") / F.col("gn")
    return (
        base.crossJoin(F.broadcast(g))
        .groupBy("o_orderpriority", "gs", "gn")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum("y_c").cast("double") / F.count("*") / 100, 4
            ).alias("raw_mean"),
            F.round(
                (F.sum("y_c") + TE_SMOOTHING_M * gm)
                / (F.count("*") + TE_SMOOTHING_M)
                / 100,
                4,
            ).alias("smoothed_enc"),
        )
        .select("o_orderpriority", "n", "raw_mean", "smoothed_enc")
    )


CR_K = 10


@op(
    "agg_concentration_ratio",
    oracle=f"""
    WITH per_cust AS (
        SELECT o_custkey,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_c
        FROM orders GROUP BY o_custkey
    ), ranked AS (
        SELECT rev_c,
               row_number() OVER (ORDER BY rev_c DESC, o_custkey) AS rk
        FROM per_cust
    )
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CASE WHEN rk <= {CR_K} THEN rev_c ELSE 0 END)
                AS BIGINT) AS topk_rev_c,
           CAST(sum(rev_c) AS BIGINT) AS total_rev_c,
           round(CAST(sum(CASE WHEN rk <= {CR_K} THEN rev_c ELSE 0 END)
                      AS DOUBLE) / sum(rev_c), 6) AS cr{CR_K}
    FROM ranked
    """,
    category=CAT,
)
def agg_concentration_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONCENTRATION RATIO CR{CR_K}: the top-{CR_K} customers' share of
    total revenue — the OTHER regulator/board number beside
    agg_hhi_concentration (HHI weights every firm quadratically; CRk
    answers "how exposed are we to our biggest {CR_K} accounts", the
    key-account-risk question a sales org actually asks).

    Customer rollup (one fact shuffle), then the TakeOrdered-top-K +
    1-row-total formulation the old docstring merely PROMISED at
    extreme cardinality (r8: it is now the only path): orderBy+limit
    plans as TakeOrderedAndProject — a per-partition K-row heap merged
    on the driver, never a global sort — and the totals are one
    map-combined aggregate; the two 1-row relations cross-join
    broadcast. No ranking window over the |customers| relation at any
    scale; tie-break (rev desc, custkey) preserved by the heap's sort
    key. One rounded double from exact cent sums.
    """
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("bigint")
        ).alias("rev_c")
    )
    topk = (
        per_cust.orderBy(F.desc("rev_c"), "o_custkey")
        .limit(CR_K)
        .agg(F.sum("rev_c").alias("topk_rev_c"))
    )
    totals = per_cust.agg(
        F.count("*").alias("n_customers"),
        F.sum("rev_c").alias("total_rev_c"),
    )
    return totals.crossJoin(F.broadcast(topk)).select(
        "n_customers",
        "topk_rev_c",
        "total_rev_c",
        F.round(
            F.col("topk_rev_c").cast("double") / F.col("total_rev_c"), 6
        ).alias(f"cr{CR_K}"),
    )


MAD_K = 5  # outlier rule: |v - median| > MAD_K * MAD (stated convention)


@op(
    "agg_mad_robust",
    oracle=f"""
    WITH vals AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
        FROM events
    ), hist1 AS (
        SELECT event_type, v, CAST(count(*) AS BIGINT) AS n_at
        FROM vals GROUP BY event_type, v
    ), med1 AS (
        SELECT event_type, min(v) AS med_c
        FROM (SELECT event_type, v,
                     sum(n_at) OVER (PARTITION BY event_type ORDER BY v)
                         AS cum,
                     sum(n_at) OVER (PARTITION BY event_type) AS n
              FROM hist1) c
        WHERE cum >= (n + 1) // 2
        GROUP BY event_type
    ), devs AS (
        SELECT vals.event_type, abs(v - med_c) AS d
        FROM vals JOIN med1 USING (event_type)
    ), hist2 AS (
        SELECT event_type, d, CAST(count(*) AS BIGINT) AS n_at
        FROM devs GROUP BY event_type, d
    ), mad AS (
        SELECT event_type, min(d) AS mad_c
        FROM (SELECT event_type, d,
                     sum(n_at) OVER (PARTITION BY event_type ORDER BY d)
                         AS cum,
                     sum(n_at) OVER (PARTITION BY event_type) AS n
              FROM hist2) c
        WHERE cum >= (n + 1) // 2
        GROUP BY event_type
    )
    SELECT d.event_type, CAST(med_c AS BIGINT) AS med_c,
           CAST(mad_c AS BIGINT) AS mad_c,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN d.d > {MAD_K} * mad_c THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM devs d JOIN med1 USING (event_type) JOIN mad USING (event_type)
    GROUP BY d.event_type, med_c, mad_c
    """,
    category=CAT,
)
def agg_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROBUST outlier detection via Median Absolute Deviation: per
    stream, the exact median, the exact MAD, and the count of points
    beyond {MAD_K}·MAD — the robust twin of dq_anomaly_zscore (mean
    and σ are themselves dragged by the outliers they're meant to
    find; median/MAD have a 50% breakdown point, which is why
    monitoring literature prefers them on dirty feeds).

    ENTIRELY integer: both medians come from the dq_join_key_skew
    count-histogram trick (counts → cumulative over the bounded
    distinct-value relation → smallest value with cum ≥ ⌈n/2⌉, lower
    median stated) — two histogram rollups and one deviation pass,
    never a sort of the data; the outlier rule compares integer cents
    to integer MAD-multiples, so no double exists in the whole op.
    """
    ev = load_table(spark, sf_dir, "events")
    vals = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("v"),
    )

    def _hist_median(df, col, out):
        hist = df.groupBy("event_type", col).agg(
            F.count("*").alias("n_at")
        )
        w_cum = Window.partitionBy("event_type").orderBy(col)
        w_all = Window.partitionBy("event_type")
        cum = hist.select(
            "event_type",
            col,
            F.sum("n_at").over(w_cum).alias("cum"),
            F.sum("n_at").over(w_all).alias("n"),
        )
        return (
            cum.filter(F.col("cum") >= F.expr("(n + 1) div 2"))
            .groupBy("event_type")
            .agg(F.min(col).alias(out))
        )

    med1 = _hist_median(vals, "v", "med_c")
    devs = vals.join(F.broadcast(med1), "event_type").select(
        "event_type", F.abs(F.col("v") - F.col("med_c")).alias("d")
    )
    mad = _hist_median(devs, "d", "mad_c")
    return (
        devs.join(F.broadcast(med1), "event_type")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med_c", "mad_c")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(F.col("d") > MAD_K * F.col("mad_c"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
        .select("event_type", "med_c", "mad_c", "n", "n_outliers")
    )


@op(
    "agg_engagement_histogram",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS np
        FROM events GROUP BY user_id
    )
    SELECT CASE WHEN np = 0 THEN '0'
                WHEN np <= 2 THEN '1-2'
                WHEN np <= 5 THEN '3-5'
                WHEN np <= 10 THEN '6-10'
                ELSE '11+' END AS band,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(np) AS BIGINT) AS n_purchases,
           CAST(min(user_id) AS BIGINT) AS min_user
    FROM per_user GROUP BY 1
    """,
    category=CAT,
)
def agg_engagement_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENGAGEMENT distribution: users banded by purchase count (0 /
    1-2 / 3-5 / 6-10 / 11+) with users and purchases per band — the
    "how concentrated is usage" product report (a power-user band
    holding most purchases and a fat zero band is the classic
    freemium shape; agg_gini_activity compresses this to one number,
    agg_lorenz_deciles to equal-COUNT bins — fixed SEMANTIC bands are
    what PMs actually name in reviews, and the three agree or you
    have a data bug).

    Count-of-counts two-level aggregate (both map-combined, the
    second over |users| rows); integer bands on integer counts, no
    double anywhere. The explicit '0' band documents that users with
    zero purchases are IN the population (they have other events) —
    the silent-exclusion trap of starting from the purchases table.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("np")
    )
    band = (
        F.when(F.col("np") == 0, "0")
        .when(F.col("np") <= 2, "1-2")
        .when(F.col("np") <= 5, "3-5")
        .when(F.col("np") <= 10, "6-10")
        .otherwise("11+")
    )
    return per_user.groupBy(band.alias("band")).agg(
        F.count("*").alias("n_users"),
        F.sum("np").alias("n_purchases"),
        F.min("user_id").alias("min_user"),
    )


@op(
    "agg_customer_migration_matrix",
    oracle="""
    WITH stamped AS (
        SELECT o_custkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS rev_c,
               CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
                   AS ed
        FROM orders
    ), bounds AS (
        SELECT min(ed) AS lo, max(ed) AS hi FROM stamped
    ), halves AS (
        SELECT o_custkey,
               CAST(sum(CASE WHEN ed * 2 < lo + hi THEN rev_c ELSE 0 END)
                    AS BIGINT) AS rev0_c,
               CAST(sum(CASE WHEN ed * 2 < lo + hi THEN 0 ELSE rev_c END)
                    AS BIGINT) AS rev1_c
        FROM stamped CROSS JOIN bounds
        GROUP BY o_custkey
    ), banded AS (
        SELECT o_custkey,
               CASE WHEN rev0_c = 0 THEN 0
                    ELSE ntile(4) OVER (PARTITION BY rev0_c > 0
                                        ORDER BY rev0_c, o_custkey) END
                   AS band0,
               CASE WHEN rev1_c = 0 THEN 0
                    ELSE ntile(4) OVER (PARTITION BY rev1_c > 0
                                        ORDER BY rev1_c, o_custkey) END
                   AS band1
        FROM halves
    )
    SELECT CAST(band0 AS BIGINT) AS band0, CAST(band1 AS BIGINT) AS band1,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM banded GROUP BY band0, band1
    """,
    category=CAT,
)
def agg_customer_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer VALUE-MIGRATION matrix: each customer's revenue
    quartile in the first half-period × their quartile in the second
    (band 0 = inactive that half) — the upgrade/downgrade/churn
    transition matrix every CRM review reads (agg_markov_transitions
    walks event types; this walks VALUE BANDS, and the off-diagonal
    mass IS the churn story; agg_new_returning_users is its 2×2
    shadow).

    One fact shuffle to per-customer half-revenues, then two EXACT
    equal-count quartile assignments over the ACTIVE subsets via
    ``_exact_global_ntile`` (both carry the (rev, custkey) tie-break;
    quartiles of actives only — a ntile over the mixed population
    would let zeros dilute the quartile boundaries; inactives are
    band 0 via the left-join coalesce), then a ≤25-cell rollup. No
    global or boolean-partition window anywhere — the rank path is
    bucketed and partition-parallel.
    """
    o = load_table(spark, sf_dir, "orders")
    stamped = o.select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("rev_c"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("ed"),
    )
    bounds = stamped.agg(F.min("ed").alias("lo"), F.max("ed").alias("hi"))
    in_h0 = F.col("ed") * 2 < F.col("lo") + F.col("hi")
    halves = (
        stamped.crossJoin(F.broadcast(bounds))
        .groupBy("o_custkey")
        .agg(
            F.sum(F.when(in_h0, F.col("rev_c")).otherwise(0)).alias("rev0_c"),
            F.sum(F.when(in_h0, 0).otherwise(F.col("rev_c"))).alias("rev1_c"),
        )
    )
    # The oracle's `ntile(4) OVER (PARTITION BY rev>0 ...)` guarded by
    # `CASE WHEN rev=0` is exactly "quartiles of the ACTIVE subset":
    # only the actives' partition ever reaches the output, so
    # filter-then-exact-global-ntile reproduces it bit-for-bit — and
    # replaces what was a boolean-partition window (one near-global
    # task holding every active customer) with the bucketed
    # partition-parallel rank path (r8 verdict item 4, shared with
    # agg_lorenz_deciles via _exact_global_ntile).
    b0 = _exact_global_ntile(
        halves.filter(F.col("rev0_c") > 0).select("o_custkey", "rev0_c"),
        4, "rev0_c", "o_custkey", "band0",
    ).select("o_custkey", "band0")
    b1 = _exact_global_ntile(
        halves.filter(F.col("rev1_c") > 0).select("o_custkey", "rev1_c"),
        4, "rev1_c", "o_custkey", "band1",
    ).select("o_custkey", "band1")
    banded = (
        halves.join(b0, "o_custkey", "left")
        .join(b1, "o_custkey", "left")
        .select(
            F.coalesce("band0", F.lit(0)).cast("bigint").alias("band0"),
            F.coalesce("band1", F.lit(0)).cast("bigint").alias("band1"),
        )
    )
    return banded.groupBy("band0", "band1").agg(
        F.count("*").alias("n_customers")
    )


AB_DELTAS_PP = ["0.01", "0.02", "0.05", "0.10"]  # detectable lifts
AB_Z_ALPHA = "1.959964"  # two-sided alpha = 0.05
AB_Z_POWER = "0.841621"  # power = 0.80


@op(
    "agg_ab_sample_size",
    oracle=f"""
    WITH rate AS (
        SELECT CAST(count(*) AS BIGINT) AS n_users,
               round(CAST(sum(conv) AS DOUBLE) / count(*), 6) AS p
        FROM (
            SELECT user_id,
                   CASE WHEN sum(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) >= 15
                        THEN 1 ELSE 0 END AS conv
            FROM events GROUP BY user_id
        )
    )
    SELECT CAST(d AS DOUBLE) AS delta_pp, n_users, p,
           CAST(ceil(2 * (({AB_Z_ALPHA} + {AB_Z_POWER})
                          * ({AB_Z_ALPHA} + {AB_Z_POWER}))
                     * p * (1 - p) / (CAST(d AS DOUBLE) * d) )
                AS BIGINT) AS n_per_arm,
           (CAST(ceil(2 * (({AB_Z_ALPHA} + {AB_Z_POWER})
                           * ({AB_Z_ALPHA} + {AB_Z_POWER}))
                      * p * (1 - p) / (CAST(d AS DOUBLE) * d))
                 AS BIGINT) * 2 <= n_users) AS feasible_now
    FROM rate
    CROSS JOIN (SELECT unnest(ARRAY[{", ".join(AB_DELTAS_PP)}]) AS d)
    """,
    category=CAT,
)
def agg_ab_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B SAMPLE-SIZE table anchored to the OBSERVED baseline: for
    each detectable lift δ, the required users per arm
    n = 2(z_α+z_β)²p(1−p)/δ² at α=0.05 / power 0.8 — the
    design-before-run companion of agg_ab_test_lift (the tuning-table
    pattern of corpus_lsh_tuning_table applied to experimentation:
    the p in the formula comes from THIS corpus's heavy-buyer rate,
    not a guess, and feasible_now says whether the current user base
    could even run the test).

    The baseline rate is the same per-user conversion rollup as the
    lift op (unit-of-analysis consistency — sizing and readout MUST
    share the metric); the δ grid is a literal cross join; z values
    are stated literals (no inverse-normal function exists portably).
    Closed-form doubles from one observed rate, rounded before use.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.when(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            >= 15,
            1,
        )
        .otherwise(0)
        .alias("conv")
    )
    rate = per_user.agg(
        F.count("*").alias("n_users"),
        F.round(F.sum("conv").cast("double") / F.count("*"), 6).alias("p"),
    )
    deltas = spark.createDataFrame(
        [(float(d),) for d in AB_DELTAS_PP], "delta_pp double"
    )
    z = float(AB_Z_ALPHA) + float(AB_Z_POWER)
    n_per_arm = F.ceil(
        2 * (z * z) * F.col("p") * (1 - F.col("p"))
        / (F.col("delta_pp") * F.col("delta_pp"))
    ).cast("bigint")
    return rate.crossJoin(deltas).select(
        "delta_pp",
        "n_users",
        "p",
        n_per_arm.alias("n_per_arm"),
        (n_per_arm * 2 <= F.col("n_users")).alias("feasible_now"),
    )


@op(
    "agg_return_rate_brand",
    oracle="""
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_returned,
           CAST(sum(CASE WHEN l_returnflag = 'R'
                         THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS returned_value_c,
           round(CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS return_rate
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    category=CAT,
)
def agg_return_rate_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETURN RATE by brand: returned-item share and returned value
    per brand — the merchandising quality signal (a brand whose
    return rate sits 2× the fleet points at a supplier or listing
    problem; pipeline_dq_quarantine catches rows WE reject, this
    measures what CUSTOMERS reject, and the two reports bracket the
    quality funnel).

    One broadcast dim join (part is small relative to the fact —
    at 100 TB the brand column would be denormalized into the fact
    at load, per the star-schema write path), one map-combined
    rollup; exact counts and cents, one derived rate (§2.X rule 1).
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    ret = F.col("l_returnflag") == "R"
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.when(ret, 1).otherwise(0)).alias("n_returned"),
            F.sum(
                F.when(
                    ret,
                    F.round(F.col("l_extendedprice") * 100).cast("bigint"),
                ).otherwise(0)
            ).alias("returned_value_c"),
            F.round(
                F.sum(F.when(ret, 1).otherwise(0)).cast("double")
                / F.count("*"),
                6,
            ).alias("return_rate"),
        )
    )


@op(
    "agg_spearman_corr",
    oracle="""
    WITH spend AS (
        SELECT c.c_mktsegment AS seg, c.c_custkey AS ck,
               CAST(round(c.c_acctbal * 100) AS BIGINT) AS bal_c,
               CAST(sum(round(o.o_totalprice * 100)) AS BIGINT) AS spend_c
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2, 3
    ), ranked AS (
        SELECT seg,
               CAST(row_number() OVER (PARTITION BY seg
                                       ORDER BY bal_c, ck) AS BIGINT) AS rb,
               CAST(row_number() OVER (PARTITION BY seg
                                       ORDER BY spend_c, ck) AS BIGINT) AS rs
        FROM spend
    )
    SELECT seg, CAST(count(*) AS BIGINT) AS n,
           CAST(sum((rb - rs) * (rb - rs)) AS BIGINT) AS sum_d2,
           round(1 - 6.0 * sum((rb - rs) * (rb - rs))
                     / (count(*) * (count(*) * count(*) - 1.0)), 9) AS rho
    FROM ranked GROUP BY seg ORDER BY seg
    """,
    category=CAT,
)
def agg_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between account balance and realized
    spend, per market segment — the MONOTONe-association answer to
    agg_regression's linear one (Pearson on heavy-tailed spend is
    dragged by whales; rank correlation is outlier-immune, and
    near-zero rho here is the 'balance is not a spend proxy' finding
    segmentation teams need stated, not assumed).

    Ranks are row_number over (value, custkey) — a deterministic
    total order (§2.X: rank() average-tie variants reappear as .5s;
    the key tie-break keeps every rank an integer and the permutation
    identity exact), so rho = 1 − 6Σd²/(n(n²−1)) is one integer
    aggregate with a single rounded division at the end. Σd² ≤ n³/3
    keeps BIGINT safe to n ~ 2×10⁶ per segment; beyond that, band
    the ranks (the formula only needs Σd², which sums per-band).
    Two per-segment windows + one rollup — no global sort.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    spend = (
        c.join(o, o.o_custkey == c.c_custkey)
        .groupBy(
            c.c_mktsegment.alias("seg"),
            c.c_custkey.alias("ck"),
            F.round(c.c_acctbal * 100).cast("bigint").alias("bal_c"),
        )
        .agg(
            F.sum(F.round(o.o_totalprice * 100)).cast("bigint").alias("spend_c")
        )
    )
    rb = F.row_number().over(
        Window.partitionBy("seg").orderBy("bal_c", "ck")
    )
    rs = F.row_number().over(
        Window.partitionBy("seg").orderBy("spend_c", "ck")
    )
    ranked = spend.select(
        "seg", rb.cast("bigint").alias("rb"), rs.cast("bigint").alias("rs")
    )
    d = F.col("rb") - F.col("rs")
    n = F.count("*")
    return (
        ranked.groupBy("seg")
        .agg(
            n.cast("bigint").alias("n"),
            F.sum(d * d).cast("bigint").alias("sum_d2"),
            F.round(
                1 - 6.0 * F.sum(d * d) / (n * (n * n - 1.0)), 9
            ).alias("rho"),
        )
        .orderBy("seg")
    )


MWU_SEG_A = "BUILDING"
MWU_SEG_B = "MACHINERY"


@op(
    "agg_mann_whitney_u",
    oracle=f"""
    WITH samp AS (
        SELECT c.c_mktsegment AS seg,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS v
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment IN ('{MWU_SEG_A}', '{MWU_SEG_B}')
    ), hist AS (
        SELECT v,
               CAST(sum(CASE WHEN seg = '{MWU_SEG_A}' THEN 1 ELSE 0 END)
                    AS BIGINT) AS c1,
               CAST(count(*) AS BIGINT) AS tc
        FROM samp GROUP BY v
    ), cum AS (
        SELECT c1, tc,
               CAST(sum(tc) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cumtc
        FROM hist
    ), sums AS (
        SELECT CAST(sum(c1) AS BIGINT) AS n1,
               CAST(sum(tc - c1) AS BIGINT) AS n2,
               CAST(sum(c1 * (2 * (cumtc - tc + 1) + tc - 1)) AS BIGINT) AS r1d,
               CAST(sum(tc * tc * tc - tc) AS BIGINT) AS t3t
        FROM cum
    )
    SELECT n1, n2, r1d,
           CAST(r1d - n1 * (n1 + 1) AS BIGINT) AS u1_doubled,
           round((r1d - n1 * (n1 + 1)) / (2.0 * n1 * n2), 9) AS auc,
           round((0.5 * (r1d - n1 * (n1 + 1)) - 0.5 * n1 * n2)
                 / sqrt(n1 * n2 * (n1 + n2 + 1.0) / 12.0
                        - n1 * n2 * t3t
                          / (12.0 * (n1 + n2) * (n1 + n2 - 1.0))), 9) AS z
    FROM sums
    """,
    category=CAT,
)
def agg_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U test: do {MWU_SEG_A} and {MWU_SEG_B} customers
    draw order values from the same distribution? The nonparametric
    two-sample location test (agg_ab_test_lift's z-test compares
    binomial RATES; dq_ks_drift compares whole SHAPES; U tests
    stochastic dominance of a continuous metric without normality —
    the right test for revenue-per-order, which is nothing like
    normal). Reports the doubled-U integer, AUC = U/(n1·n2) (the
    probability a random A order exceeds a random B order — the
    common-language effect size), and the tie-corrected z.

    Scale shape: ranks are NEVER assigned per row — the sample
    collapses to a value HISTOGRAM (group by cents), one ordered
    window over DISTINCT values computes min-ranks from cumulative
    counts, and rank sums come from c1·(2·rmin+tc−1) (doubled
    average-rank trick: ties contribute .5s, doubling keeps every
    term BIGINT). The only sort is over the ≤|distinct cents| table,
    range-partitionable at scale — not the 100 TB row set. All
    moments integer; the two final divisions + sqrt are the only
    float ops, mirrored token-for-token and rounded at 9.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    samp = (
        c.join(o, o.o_custkey == c.c_custkey)
        .filter(c.c_mktsegment.isin(MWU_SEG_A, MWU_SEG_B))
        .select(
            c.c_mktsegment.alias("seg"),
            F.round(o.o_totalprice * 100).cast("bigint").alias("v"),
        )
    )
    hist = samp.groupBy("v").agg(
        F.sum(F.when(F.col("seg") == MWU_SEG_A, 1).otherwise(0))
        .cast("bigint")
        .alias("c1"),
        F.count("*").cast("bigint").alias("tc"),
    )
    cum = hist.select(
        "c1",
        "tc",
        F.sum("tc")
        .over(Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("cumtc"),
    )
    rmin = F.col("cumtc") - F.col("tc") + 1
    sums = cum.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum(F.col("tc") - F.col("c1")).cast("bigint").alias("n2"),
        F.sum(F.col("c1") * (2 * rmin + F.col("tc") - 1))
        .cast("bigint")
        .alias("r1d"),
        F.sum(F.col("tc") * F.col("tc") * F.col("tc") - F.col("tc"))
        .cast("bigint")
        .alias("t3t"),
    )
    n1, n2, r1d, t3t = (F.col(x) for x in ("n1", "n2", "r1d", "t3t"))
    return sums.select(
        "n1",
        "n2",
        "r1d",
        (r1d - n1 * (n1 + 1)).cast("bigint").alias("u1_doubled"),
        F.round((r1d - n1 * (n1 + 1)) / (2.0 * n1 * n2), 9).alias("auc"),
        F.round(
            (0.5 * (r1d - n1 * (n1 + 1)) - 0.5 * n1 * n2)
            / F.sqrt(
                n1 * n2 * (n1 + n2 + 1.0) / 12.0
                - n1 * n2 * t3t / (12.0 * (n1 + n2) * (n1 + n2 - 1.0))
            ),
            9,
        ).alias("z"),
    )


EB_PRIOR_M = 100


@op(
    "agg_eb_shrunk_rates",
    oracle=f"""
    WITH per_supp AS (
        SELECT l_suppkey AS sk,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x
        FROM lineitem GROUP BY 1
    ), gstats AS (
        SELECT CAST(sum(n) AS BIGINT) AS tn, CAST(sum(x) AS BIGINT) AS tx
        FROM per_supp
    ), rates AS (
        SELECT sk, n, x,
               round(x * 1.0 / n, 9) AS raw_rate,
               round((x + {EB_PRIOR_M} * (tx * 1.0 / tn))
                     / (n + {EB_PRIOR_M}), 9) AS shrunk_rate
        FROM per_supp, gstats
    )
    SELECT sk, n, x, raw_rate, shrunk_rate,
           CAST(row_number() OVER (ORDER BY raw_rate DESC, sk) AS BIGINT)
               AS rank_raw,
           CAST(row_number() OVER (ORDER BY shrunk_rate DESC, sk) AS BIGINT)
               AS rank_shrunk
    FROM rates
    ORDER BY sk
    """,
    category=CAT,
)
def agg_eb_shrunk_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrunk per-supplier return rates: rate estimate
    (x + m·p̂)/(n + m), m={EB_PRIOR_M} pseudo-observations of the
    global rate — THE fix for small-sample league tables (raw-rate
    ranking crowns whichever low-volume supplier got unlucky twice;
    shrinkage pulls thin evidence toward the prior so rank is earned
    by volume-backed deviation, the same Beta(α,β) smoothing every
    CTR/quality-score pipeline ships). Both rankings are emitted so
    the rank displacement — which suppliers the raw table slanders —
    is the visible deliverable.

    Integer (n, x) state per supplier, one broadcastable global-rate
    row crossed in, two float divisions mirrored token-for-token and
    ROUNDED AT 9 BEFORE the ranks (§2.X flag rule: ranking an
    unrounded double turns a last-ulp wobble into an off-by-one rank
    everywhere downstream); supplier-key tie-break keeps both ranks
    total. Both ranks are computed by ``_exact_global_rank`` (r8) on
    the NEGATED nano-quantized rate — rank over (rate DESC, sk ASC)
    == rank over (-rate9 ASC, sk ASC) — so there is no unpartitioned
    ranking window even as the supplier dimension grows; the rate was
    already rounded at 9, so the 1e9 quantization is lossless.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_supp = li.groupBy(F.col("l_suppkey").alias("sk")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
    )
    glob = per_supp.agg(
        F.sum("n").cast("bigint").alias("tn"),
        F.sum("x").cast("bigint").alias("tx"),
    )
    rates = per_supp.crossJoin(F.broadcast(glob)).select(
        "sk",
        "n",
        "x",
        F.round(F.col("x") * 1.0 / F.col("n"), 9).alias("raw_rate"),
        F.round(
            (F.col("x") + EB_PRIOR_M * (F.col("tx") * 1.0 / F.col("tn")))
            / (F.col("n") + EB_PRIOR_M),
            9,
        ).alias("shrunk_rate"),
    )
    staged = rates.withColumn(
        "_neg_raw9",
        -F.expr("cast(floor(raw_rate * 1000000000 + 0.5D) as bigint)"),
    ).withColumn(
        "_neg_shr9",
        -F.expr("cast(floor(shrunk_rate * 1000000000 + 0.5D) as bigint)"),
    )
    ranked = _exact_global_rank(
        _exact_global_rank(staged, "_neg_raw9", "sk", "rank_raw"),
        "_neg_shr9",
        "sk",
        "rank_shrunk",
    )
    return ranked.select(
        "sk",
        "n",
        "x",
        "raw_rate",
        "shrunk_rate",
        F.col("rank_raw").cast("bigint").alias("rank_raw"),
        F.col("rank_shrunk").cast("bigint").alias("rank_shrunk"),
    ).orderBy("sk")


LFL_Y1, LFL_Y2 = 1999, 2000


@op(
    "agg_like_for_like_growth",
    oracle=f"""
    WITH yr AS (
        SELECT c.c_mktsegment AS seg, o.o_custkey AS ck,
               CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS y,
               CAST(sum(round(o.o_totalprice * 100)) AS BIGINT) AS rev_c
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE EXTRACT(year FROM o.o_orderdate) IN ({LFL_Y1}, {LFL_Y2})
        GROUP BY 1, 2, 3
    ), both_years AS (
        SELECT seg, ck,
               CAST(sum(CASE WHEN y = {LFL_Y1} THEN rev_c ELSE 0 END)
                    AS BIGINT) AS r1,
               CAST(sum(CASE WHEN y = {LFL_Y2} THEN rev_c ELSE 0 END)
                    AS BIGINT) AS r2
        FROM yr GROUP BY 1, 2
        HAVING count(DISTINCT y) = 2
    )
    SELECT seg, CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(r1) AS BIGINT) AS rev_{LFL_Y1}_c,
           CAST(sum(r2) AS BIGINT) AS rev_{LFL_Y2}_c,
           round((sum(r2) - sum(r1)) * 1.0 / sum(r1), 9) AS lfl_growth
    FROM both_years GROUP BY seg ORDER BY seg
    """,
    category=CAT,
)
def agg_like_for_like_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Like-for-like (same-customer) YoY growth per segment: revenue
    change {LFL_Y1}→{LFL_Y2} counting ONLY customers active in BOTH
    years — the comparable-basis growth retailers call same-store
    sales (raw YoY conflates three stories: acquisition, churn, and
    behavior change of the retained base; agg_new_returning_users
    splits the first two, this isolates the third, and a healthy
    headline number with negative LFL is the classic leaky-bucket
    finding).

    The both-years cut is HAVING count(DISTINCT y)=2 on the per
    (customer, year) cents rollup — one aggregate, no self-join (the
    naive INTERSECT of two yearly customer lists scans twice and
    shuffles twice); year predicate pushes to the scan. Exact cents
    BIGINTs end to end; growth is the single rounded division.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    yr = (
        o.join(c, c.c_custkey == o.o_custkey)
        .filter(F.year("o_orderdate").isin(LFL_Y1, LFL_Y2))
        .groupBy(
            c.c_mktsegment.alias("seg"),
            o.o_custkey.alias("ck"),
            F.year("o_orderdate").alias("y"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100)).cast("bigint").alias("rev_c")
        )
    )
    both = (
        yr.groupBy("seg", "ck")
        .agg(
            F.sum(F.when(F.col("y") == LFL_Y1, F.col("rev_c")).otherwise(0))
            .cast("bigint")
            .alias("r1"),
            F.sum(F.when(F.col("y") == LFL_Y2, F.col("rev_c")).otherwise(0))
            .cast("bigint")
            .alias("r2"),
            F.countDistinct("y").alias("ny"),
        )
        .filter(F.col("ny") == 2)
    )
    return (
        both.groupBy("seg")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.sum("r1").cast("bigint").alias(f"rev_{LFL_Y1}_c"),
            F.sum("r2").cast("bigint").alias(f"rev_{LFL_Y2}_c"),
            F.round(
                (F.sum("r2") - F.sum("r1")) * 1.0 / F.sum("r1"), 9
            ).alias("lfl_growth"),
        )
        .orderBy("seg")
    )


@op(
    "agg_mrr_bridge",
    oracle="""
    WITH per_cm AS (
        SELECT o_custkey AS ck,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
               CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS rev
        FROM orders GROUP BY 1, 2
    ), seq AS (
        SELECT ck, m, rev,
               lag(m) OVER w AS pm, lag(rev) OVER w AS prev,
               lead(m) OVER w AS nm
        FROM per_cm WINDOW w AS (PARTITION BY ck ORDER BY m)
    ), moves AS (
        SELECT m,
           CAST(sum(CASE WHEN pm IS NULL THEN rev ELSE 0 END) AS BIGINT)
               AS new_c,
           CAST(sum(CASE WHEN pm IS NOT NULL
                          AND date_diff('month', pm, m) > 1
                         THEN rev ELSE 0 END) AS BIGINT) AS resurrected_c,
           CAST(sum(CASE WHEN pm IS NOT NULL
                          AND date_diff('month', pm, m) = 1 AND rev > prev
                         THEN rev - prev ELSE 0 END) AS BIGINT) AS expansion_c,
           CAST(sum(CASE WHEN pm IS NOT NULL
                          AND date_diff('month', pm, m) = 1 AND rev < prev
                         THEN rev - prev ELSE 0 END) AS BIGINT)
               AS contraction_c
        FROM seq GROUP BY m
    ), churn AS (
        SELECT CAST(m + INTERVAL 1 MONTH AS DATE) AS m,
               CAST(sum(rev) AS BIGINT) AS churn_c
        FROM seq WHERE nm IS NULL OR date_diff('month', m, nm) > 1
        GROUP BY 1
    ), ending AS (
        SELECT m, CAST(sum(rev) AS BIGINT) AS ending_c FROM per_cm GROUP BY m
    )
    SELECT e.m,
           coalesce(lag(e.ending_c) OVER (ORDER BY e.m), 0) AS starting_c,
           coalesce(mv.new_c, 0) AS new_c,
           coalesce(mv.resurrected_c, 0) AS resurrected_c,
           coalesce(mv.expansion_c, 0) AS expansion_c,
           coalesce(mv.contraction_c, 0) AS contraction_c,
           coalesce(ch.churn_c, 0) AS churn_c,
           e.ending_c,
           (coalesce(lag(e.ending_c) OVER (ORDER BY e.m), 0)
            + coalesce(mv.new_c, 0) + coalesce(mv.resurrected_c, 0)
            + coalesce(mv.expansion_c, 0) + coalesce(mv.contraction_c, 0)
            - coalesce(ch.churn_c, 0)) = e.ending_c AS bridge_ok
    FROM ending e
    LEFT JOIN moves mv ON mv.m = e.m
    LEFT JOIN churn ch ON ch.m = e.m
    ORDER BY e.m
    """,
    category=CAT,
)
def agg_mrr_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly recurring-revenue bridge: every month's ending revenue
    decomposed into starting + new + resurrected + expansion +
    contraction − churn — the SaaS revenue waterfall
    (agg_customer_migration_matrix shows WHO moved between value
    bands; agg_contribution_waterfall bridges two snapshots by
    segment; this is the customer-level ADDITIVE decomposition whose
    components must reconcile to the period totals — `bridge_ok`
    carries that reconciliation per row, the column a finance
    reviewer checks first).

    No dense customer×month spine is materialized (the naive join
    explodes to |customers|·|months| rows at 100 TB): transition
    class comes from lag/lead over each customer's OBSERVED months —
    a gap > 1 month means churn at m+1 (a generated row, not a
    scanned one) and resurrection on return. Exact cents BIGINTs end
    to end; the only windows are per-customer (partitioned) plus one
    ordered pass over the ≤|months| bridge table.
    """
    o = load_table(spark, sf_dir, "orders")
    per_cm = o.groupBy(
        F.col("o_custkey").alias("ck"),
        F.trunc("o_orderdate", "month").alias("m"),
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100)).cast("bigint").alias("rev"))
    w = Window.partitionBy("ck").orderBy("m")
    seq = per_cm.select(
        "ck",
        "m",
        "rev",
        F.lag("m").over(w).alias("pm"),
        F.lag("rev").over(w).alias("prev"),
        F.lead("m").over(w).alias("nm"),
    )
    mdiff = F.months_between(F.col("m"), F.col("pm")).cast("int")
    moves = seq.groupBy("m").agg(
        F.sum(F.when(F.col("pm").isNull(), F.col("rev")).otherwise(0))
        .cast("bigint")
        .alias("new_c"),
        F.sum(
            F.when(F.col("pm").isNotNull() & (mdiff > 1), F.col("rev")).otherwise(0)
        )
        .cast("bigint")
        .alias("resurrected_c"),
        F.sum(
            F.when(
                F.col("pm").isNotNull()
                & (mdiff == 1)
                & (F.col("rev") > F.col("prev")),
                F.col("rev") - F.col("prev"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("expansion_c"),
        F.sum(
            F.when(
                F.col("pm").isNotNull()
                & (mdiff == 1)
                & (F.col("rev") < F.col("prev")),
                F.col("rev") - F.col("prev"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("contraction_c"),
    )
    ndiff = F.months_between(F.col("nm"), F.col("m")).cast("int")
    churn = (
        seq.filter(F.col("nm").isNull() | (ndiff > 1))
        .groupBy(F.add_months(F.col("m"), 1).alias("m"))
        .agg(F.sum("rev").cast("bigint").alias("churn_c"))
    )
    ending = per_cm.groupBy("m").agg(
        F.sum("rev").cast("bigint").alias("ending_c")
    )
    wm = Window.orderBy("m")
    bridge = (
        ending.join(moves, "m", "left")
        .join(churn, "m", "left")
        .select(
            "m",
            F.coalesce(F.lag("ending_c").over(wm), F.lit(0)).alias("starting_c"),
            F.coalesce("new_c", F.lit(0)).alias("new_c"),
            F.coalesce("resurrected_c", F.lit(0)).alias("resurrected_c"),
            F.coalesce("expansion_c", F.lit(0)).alias("expansion_c"),
            F.coalesce("contraction_c", F.lit(0)).alias("contraction_c"),
            F.coalesce("churn_c", F.lit(0)).alias("churn_c"),
            "ending_c",
        )
    )
    return bridge.select(
        "*",
        (
            F.col("starting_c")
            + F.col("new_c")
            + F.col("resurrected_c")
            + F.col("expansion_c")
            + F.col("contraction_c")
            - F.col("churn_c")
            == F.col("ending_c")
        ).alias("bridge_ok"),
    ).orderBy("m")


@op(
    "agg_price_endings",
    oracle="""
    WITH cents AS (
        SELECT CAST(round(p_retailprice * 100) AS BIGINT) % 100 AS ending
        FROM part
    ), tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM cents)
    SELECT ending,
           CASE WHEN ending = 99 THEN 'charm_99'
                WHEN ending = 0 THEN 'round_00'
                WHEN ending = 95 THEN 'charm_95'
                WHEN ending % 10 = 9 THEN 'other_9'
                ELSE 'plain' END AS price_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST((1000000 * count(*)) // (SELECT n FROM tot) AS BIGINT)
               AS share_ppm
    FROM cents
    GROUP BY ending
    ORDER BY ending
    """,
    category=CAT,
)
def agg_price_endings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Psychological price-point audit: the cents-ending distribution
    of the catalog (99-ending 'charm' prices, round .00, .95, other
    9s) — the merchandising-hygiene report (dq_benford_check audits
    the LEADING digit for fabrication; this audits the TRAILING
    digits for pricing-policy drift — a catalog drifting from .99 to
    uniform endings means imports are bypassing the pricing rules).

    Endings are exact integer residues of the cents cast — mod on
    money avoids every float-representation trap (15.99·100 is
    1598.9999… as a raw double; round-then-mod is the stated
    contract, same cents discipline as agg_decimal_money); shares
    are integer ppm via div against the one-row total, so no float
    exists anywhere. One map-side-combined ≤100-group rollup.
    """
    p = load_table(spark, sf_dir, "part")
    cents = p.select(
        (F.round(F.col("p_retailprice") * 100).cast("bigint") % 100).alias(
            "ending"
        )
    )
    tot = cents.agg(F.count("*").cast("bigint").alias("n"))
    e = F.col("ending")
    return (
        cents.groupBy("ending")
        .agg(F.count("*").cast("bigint").alias("n_parts"))
        .crossJoin(F.broadcast(tot))
        .select(
            "ending",
            F.when(e == 99, "charm_99")
            .when(e == 0, "round_00")
            .when(e == 95, "charm_95")
            .when(e % 10 == 9, "other_9")
            .otherwise("plain")
            .alias("price_class"),
            "n_parts",
            F.floor((1000000 * F.col("n_parts")) / F.col("n"))
            .cast("bigint")
            .alias("share_ppm"),
        )
        .orderBy("ending")
    )


@op(
    "agg_runrate_backtest",
    oracle="""
    WITH daily AS (
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS y,
               CAST(EXTRACT(doy FROM o_orderdate) AS BIGINT) AS doy,
               CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS rev_c
        FROM orders
        WHERE EXTRACT(year FROM o_orderdate) IN (1999, 2000)
        GROUP BY 1, 2
    ), actual AS (
        SELECT y, CAST(sum(rev_c) AS BIGINT) AS actual_c FROM daily GROUP BY y
    ), marks AS (
        SELECT * FROM (VALUES (1), (2), (3)) v(q)
    ), ytd_marks AS (
        SELECT d.y, m.q,
               CASE WHEN d.y = 2000 THEN 366 ELSE 365 END AS yd,
               CASE m.q WHEN 1 THEN (CASE WHEN d.y = 2000 THEN 91 ELSE 90 END)
                        WHEN 2 THEN (CASE WHEN d.y = 2000 THEN 182 ELSE 181 END)
                        ELSE (CASE WHEN d.y = 2000 THEN 274 ELSE 273 END)
               END AS cutoff_doy,
               CAST(sum(CASE WHEN d.doy <= CASE m.q
                        WHEN 1 THEN (CASE WHEN d.y = 2000 THEN 91 ELSE 90 END)
                        WHEN 2 THEN (CASE WHEN d.y = 2000 THEN 182 ELSE 181 END)
                        ELSE (CASE WHEN d.y = 2000 THEN 274 ELSE 273 END) END
                        THEN d.rev_c ELSE 0 END) AS BIGINT) AS ytd_c
        FROM daily d CROSS JOIN marks m
        GROUP BY 1, 2, 3, 4
    )
    SELECT a.y, a.q, a.ytd_c,
           CAST((a.ytd_c * a.yd) // a.cutoff_doy AS BIGINT) AS runrate_c,
           ac.actual_c,
           CAST((((a.ytd_c * a.yd) // a.cutoff_doy) - ac.actual_c) * 1000000
                // ac.actual_c AS BIGINT) AS err_ppm
    FROM ytd_marks a JOIN actual ac ON ac.y = a.y
    ORDER BY a.y, a.q
    """,
    category=CAT,
)
def agg_runrate_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-rate forecast backtest: the annualized projection a finance
    team would have published at the end of Q1/Q2/Q3 (ytd·year_days
    div elapsed_days) against the year's ACTUAL, for 1999 and 2000,
    error in signed ppm — forecast governance as a query
    (ts_seasonal_naive_forecast predicts forward; this scores the
    simplest projection method retroactively, and its systematic
    sign — run-rate UNDERSHOOTS in back-loaded years — is the
    seasonality-blindness finding that justifies the seasonal index).

    Whole op is integer: cents YTD sums, literal quarter-end
    day-of-year cutoffs (leap-aware: 91/182/274 in 2000 vs
    90/181/273), projection and error via BIGINT div — no float
    anywhere, so the 6-row report is bit-stable by construction.
    One daily rollup (the fact dies there) crossed with a 3-row
    literal mark table, then a ≤ |years|·3 aggregate.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.filter(F.year("o_orderdate").isin(1999, 2000))
        .groupBy(
            F.year("o_orderdate").alias("y"),
            F.dayofyear("o_orderdate").cast("bigint").alias("doy"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100)).cast("bigint").alias("rev_c")
        )
    )
    actual = daily.groupBy("y").agg(
        F.sum("rev_c").cast("bigint").alias("actual_c")
    )
    marks = spark.range(1, 4).select(F.col("id").cast("int").alias("q"))
    yd = F.when(F.col("y") == 2000, 366).otherwise(365)
    cutoff = (
        F.when(F.col("q") == 1, F.when(F.col("y") == 2000, 91).otherwise(90))
        .when(F.col("q") == 2, F.when(F.col("y") == 2000, 182).otherwise(181))
        .otherwise(F.when(F.col("y") == 2000, 274).otherwise(273))
    )
    asof = (
        daily.crossJoin(F.broadcast(marks))
        .select("y", "q", "doy", "rev_c", yd.alias("yd"), cutoff.alias("cutoff_doy"))
        .groupBy("y", "q", "yd", "cutoff_doy")
        .agg(
            F.sum(F.when(F.col("doy") <= F.col("cutoff_doy"), F.col("rev_c")).otherwise(0))
            .cast("bigint")
            .alias("ytd_c")
        )
    )
    # `div` (truncate toward zero) matches DuckDB's `//` on NEGATIVE
    # numerators; F.floor(a/b) floors toward -inf and is off by one
    # on every undershooting quarter.
    runrate = F.expr("(ytd_c * yd) div cutoff_doy").cast("bigint")
    return (
        asof.join(actual, "y")
        .select(
            "y",
            "q",
            "ytd_c",
            runrate.alias("runrate_c"),
            "actual_c",
            ((runrate - F.col("actual_c")) * 1000000).alias("err_num"),
        )
        .select(
            "y",
            "q",
            "ytd_c",
            "runrate_c",
            "actual_c",
            F.expr("err_num div actual_c").cast("bigint").alias("err_ppm"),
        )
        .orderBy("y", "q")
    )


@op(
    "agg_new_product_adoption",
    oracle="""
    WITH first_ship AS (
        SELECT p.p_brand AS brand, l.l_partkey AS pk,
               min(CAST(date_trunc('quarter', l.l_shipdate) AS DATE)) AS q0
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1, 2
    ), newq AS (
        SELECT brand, q0 AS qtr, CAST(count(*) AS BIGINT) AS new_parts
        FROM first_ship GROUP BY 1, 2
    ), catalog AS (
        SELECT brand, CAST(count(*) AS BIGINT) AS catalog_parts
        FROM first_ship GROUP BY brand
    )
    SELECT n.brand, n.qtr, n.new_parts,
           CAST(sum(n.new_parts) OVER (PARTITION BY n.brand ORDER BY n.qtr
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_parts,
           c.catalog_parts,
           CAST((sum(n.new_parts) OVER (PARTITION BY n.brand ORDER BY n.qtr
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1000000)
               // c.catalog_parts AS BIGINT) AS cum_share_ppm
    FROM newq n JOIN catalog c ON c.brand = n.brand
    ORDER BY n.brand, n.qtr
    """,
    category=CAT,
)
def agg_new_product_adoption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog adoption curve: per brand, parts shipping for the
    FIRST time each quarter, cumulative, and cumulative share of the
    brand's eventually-shipped catalog in ppm — the assortment-
    rollout S-curve (merchandising reads where it flattens: a brand
    whose cum-share plateaus at 60 % after year one has dead SKUs;
    agg_retention_cohort tracks CUSTOMERS' first order, this tracks
    PRODUCTS' first shipment — same debut-anchor idea on the other
    dimension of the fact).

    min-shipdate-per-part is one map-combined aggregate (the 100 TB
    fact dies there: |parts| rows out); the running sum is a window
    over ≤|brand×quarters| rows partitioned by brand; ppm share is
    integer div against the brand catalog count. No float anywhere.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    first_ship = (
        li.join(p, p.p_partkey == li.l_partkey)
        .groupBy(F.col("p_brand").alias("brand"), F.col("l_partkey").alias("pk"))
        .agg(F.min(F.trunc("l_shipdate", "quarter")).alias("q0"))
    )
    newq = first_ship.groupBy("brand", F.col("q0").alias("qtr")).agg(
        F.count("*").cast("bigint").alias("new_parts")
    )
    catalog = first_ship.groupBy("brand").agg(
        F.count("*").cast("bigint").alias("catalog_parts")
    )
    w = (
        Window.partitionBy("brand")
        .orderBy("qtr")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum("new_parts").over(w).cast("bigint")
    return (
        newq.join(F.broadcast(catalog), "brand")
        .select(
            "brand",
            "qtr",
            "new_parts",
            cum.alias("cum_parts"),
            "catalog_parts",
            (cum * 1000000).alias("cum_num"),
        )
        .select(
            "brand",
            "qtr",
            "new_parts",
            "cum_parts",
            "catalog_parts",
            F.expr("cum_num div catalog_parts").cast("bigint").alias("cum_share_ppm"),
        )
        .orderBy("brand", "qtr")
    )


SESS_GAP_US = 1800 * 1000000  # 30-minute session gap


@op(
    "agg_sessions_to_convert",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, ts, event_type, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                        > {SESS_GAP_US}
                    THEN 1 ELSE 0 END AS new_sess
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, event_type,
               CAST(sum(new_sess) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS sess_no
        FROM seq
    ), conv AS (
        SELECT user_id,
               coalesce(CAST(min(CASE WHEN event_type = 'purchase'
                                      THEN sess_no END) AS BIGINT),
                        -1) AS s2c
        FROM sess GROUP BY user_id
    ), tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM conv)
    SELECT s2c AS sessions_to_convert,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST((count(*) * 1000000) // (SELECT n FROM tot) AS BIGINT)
               AS share_ppm
    FROM conv GROUP BY s2c ORDER BY s2c
    """,
    category=CAT,
)
def agg_sessions_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessions-to-convert distribution: for every user, the ordinal
    of the 30-minute-gap session containing their FIRST purchase
    (−1 = never), histogrammed with ppm shares — the activation-
    funnel depth metric growth teams set onboarding budgets by
    (agg_funnel_conversion counts step completion WITHIN a window;
    this counts how many VISITS the funnel takes, which is the
    difference between a UX problem and an intent problem).

    Sessionization is the sessionize_gap recipe inline (lag + gap
    flag + running sum, both windows per-user on ONE shuffle);
    first-converting session is a conditional min per user; the
    histogram is a ≤|max sessions| rollup with integer ppm shares.
    Integer microsecond gap arithmetic end to end — no interval
    float, no timezone dependence.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_us = F.unix_micros(F.lag("ts").over(w))
    new_sess = F.when(
        prev_us.isNull() | (F.unix_micros(F.col("ts")) - prev_us > SESS_GAP_US),
        1,
    ).otherwise(0)
    seq = ev.select("user_id", "ts", "event_type", "event_id", new_sess.alias("new_sess"))
    sess = seq.select(
        "user_id",
        "event_type",
        F.sum("new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("sess_no"),
    )
    conv = sess.groupBy("user_id").agg(
        F.coalesce(
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("sess_no"))
            ).cast("bigint"),
            F.lit(-1).cast("bigint"),
        ).alias("s2c")
    )
    tot = conv.agg(F.count("*").cast("bigint").alias("n"))
    return (
        conv.groupBy(F.col("s2c").alias("sessions_to_convert"))
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .crossJoin(F.broadcast(tot))
        .select(
            "sessions_to_convert",
            "n_users",
            F.expr("(n_users * 1000000) div n").cast("bigint").alias("share_ppm"),
        )
        .orderBy("sessions_to_convert")
    )


LIFECYCLE_W = 3  # retained if repurchasing within W days; churn lands at d+W+1


@op(
    "agg_user_lifecycle_daily",
    oracle=f"""
    WITH act AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        WHERE event_type = 'purchase'
    ), rng AS (SELECT max(d) AS max_d FROM act),
    seq AS (
        SELECT user_id, d,
               lag(d) OVER w AS pd, lead(d) OVER w AS nd
        FROM act WINDOW w AS (PARTITION BY user_id ORDER BY d)
    ), staged AS (
        SELECT d, CASE WHEN pd IS NULL THEN 'new'
                       WHEN date_diff('day', pd, d) <= {LIFECYCLE_W}
                            THEN 'retained'
                       ELSE 'resurrected' END AS stage
        FROM seq
        UNION ALL
        SELECT CAST(d + INTERVAL {LIFECYCLE_W + 1} DAY AS DATE), 'churned'
        FROM seq, rng
        WHERE (nd IS NULL OR date_diff('day', d, nd) > {LIFECYCLE_W})
          AND CAST(d + INTERVAL {LIFECYCLE_W + 1} DAY AS DATE) <= rng.max_d
    )
    SELECT d,
           CAST(sum(CASE WHEN stage = 'new' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new,
           CAST(sum(CASE WHEN stage = 'retained' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_retained,
           CAST(sum(CASE WHEN stage = 'resurrected' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_resurrected,
           CAST(sum(CASE WHEN stage = 'churned' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_churned,
           CASE WHEN sum(CASE WHEN stage = 'churned' THEN 1 ELSE 0 END) = 0
                THEN CAST(-1 AS BIGINT)
                ELSE CAST((sum(CASE WHEN stage IN ('new', 'resurrected')
                                    THEN 1 ELSE 0 END) * 1000000)
                          // sum(CASE WHEN stage = 'churned' THEN 1 ELSE 0
                                 END) AS BIGINT) END AS quick_ratio_ppm
    FROM staged GROUP BY d ORDER BY d
    """,
    category=CAT,
)
def agg_user_lifecycle_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting, daily: every purchase-active user classified
    new / retained / resurrected (by gap to their PREVIOUS purchase
    day, window {LIFECYCLE_W}d) and churn counted on the day a user
    FALLS OUT of the window — with the growth quick ratio
    (new+resurrected)/churned in ppm per day. This is the
    Social-Capital growth-accounting identity on users
    (agg_mrr_bridge is the same identity on revenue, monthly;
    agg_new_returning_users splits arrivals only — none of the
    three substitutes for another, which is why growth teams run
    all three).

    Churn needs ABSENCE, which no scanned row carries: churn rows
    are GENERATED at d+{LIFECYCLE_W + 1} from each activity day
    whose lead-gap exceeds the window (the MRR-bridge trick),
    clipped at the corpus horizon so end-of-data never fabricates a
    churn wave. One per-user ordered window (lag+lead share it),
    one ≤|days| rollup, integer ppm; −1 flags zero-churn days
    instead of a 0-division.
    """
    ev = load_table(spark, sf_dir, "events")
    act = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    rng = act.agg(F.max("d").alias("max_d"))
    w = Window.partitionBy("user_id").orderBy("d")
    seq = act.select(
        "user_id",
        "d",
        F.lag("d").over(w).alias("pd"),
        F.lead("d").over(w).alias("nd"),
    )
    staged_act = seq.select(
        "d",
        F.when(F.col("pd").isNull(), "new")
        .when(F.datediff(F.col("d"), F.col("pd")) <= LIFECYCLE_W, "retained")
        .otherwise("resurrected")
        .alias("stage"),
    )
    churn = (
        seq.filter(
            F.col("nd").isNull()
            | (F.datediff(F.col("nd"), F.col("d")) > LIFECYCLE_W)
        )
        .crossJoin(F.broadcast(rng))
        .select(
            F.date_add(F.col("d"), LIFECYCLE_W + 1).alias("d"),
            F.lit("churned").alias("stage"),
            "max_d",
        )
        .filter(F.col("d") <= F.col("max_d"))
        .select("d", "stage")
    )
    staged = staged_act.unionAll(churn)
    n_new = F.sum(F.when(F.col("stage") == "new", 1).otherwise(0)).cast("bigint")
    n_ret = F.sum(F.when(F.col("stage") == "retained", 1).otherwise(0)).cast(
        "bigint"
    )
    n_res = F.sum(F.when(F.col("stage") == "resurrected", 1).otherwise(0)).cast(
        "bigint"
    )
    n_ch = F.sum(F.when(F.col("stage") == "churned", 1).otherwise(0)).cast(
        "bigint"
    )
    return (
        staged.groupBy("d")
        .agg(
            n_new.alias("n_new"),
            n_ret.alias("n_retained"),
            n_res.alias("n_resurrected"),
            n_ch.alias("n_churned"),
        )
        .select(
            "d",
            "n_new",
            "n_retained",
            "n_resurrected",
            "n_churned",
            F.when(F.col("n_churned") == 0, F.lit(-1).cast("bigint"))
            .otherwise(
                F.expr(
                    "((n_new + n_resurrected) * 1000000) div n_churned"
                ).cast("bigint")
            )
            .alias("quick_ratio_ppm"),
        )
        .orderBy("d")
    )


@op(
    "agg_anova_dow",
    oracle="""
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS dd, CAST(count(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY 1
    ), g AS (
        SELECT dayofweek(dd) AS dow,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cnt) AS BIGINT) AS s,
               CAST(sum(cnt * cnt) AS BIGINT) AS q
        FROM daily GROUP BY 1
    ), piv AS (
        SELECT
          max(CASE WHEN dow = 0 THEN n END) AS n0, max(CASE WHEN dow = 0 THEN s END) AS s0,
          max(CASE WHEN dow = 1 THEN n END) AS n1, max(CASE WHEN dow = 1 THEN s END) AS s1,
          max(CASE WHEN dow = 2 THEN n END) AS n2, max(CASE WHEN dow = 2 THEN s END) AS s2,
          max(CASE WHEN dow = 3 THEN n END) AS n3, max(CASE WHEN dow = 3 THEN s END) AS s3,
          max(CASE WHEN dow = 4 THEN n END) AS n4, max(CASE WHEN dow = 4 THEN s END) AS s4,
          max(CASE WHEN dow = 5 THEN n END) AS n5, max(CASE WHEN dow = 5 THEN s END) AS s5,
          max(CASE WHEN dow = 6 THEN n END) AS n6, max(CASE WHEN dow = 6 THEN s END) AS s6,
          CAST(sum(n) AS BIGINT) AS nn, CAST(sum(s) AS BIGINT) AS ts,
          CAST(sum(q) AS BIGINT) AS tq
        FROM g
    ), calc AS (
        SELECT nn, ts, tq,
               ((s0 * s0 * 1.0 / n0 + s1 * s1 * 1.0 / n1)
                + (s2 * s2 * 1.0 / n2 + s3 * s3 * 1.0 / n3)
                + (s4 * s4 * 1.0 / n4 + s5 * s5 * 1.0 / n5)
                + s6 * s6 * 1.0 / n6) AS sum_t
        FROM piv
    )
    SELECT nn AS n_days, ts AS total_cnt, tq AS total_sq,
           round(((sum_t - ts * ts * 1.0 / nn) / 6.0)
                 / ((tq - sum_t) / (nn - 7.0)), 9) AS f_stat,
           round((sum_t - ts * ts * 1.0 / nn)
                 / ((sum_t - ts * ts * 1.0 / nn) + (tq - sum_t)), 9)
               AS eta_squared
    FROM calc
    """,
    category=CAT,
)
def agg_anova_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA across day-of-week groups on daily shipment
    volume: F-statistic + η² effect size — IS there a weekday
    effect, tested properly (agg_weekend_lift reports the lift
    point-estimate; ANOVA asks whether BETWEEN-day variance exceeds
    within-day noise at all, completing the test battery: χ²
    (categorical), KS (shape), Mann-Whitney (two-sample location),
    runs (independence), ANOVA (k-sample means)).

    Determinism device worth naming: SSW/SSB need Σ_g S_g²/n_g — a
    FLOAT sum across groups, order-dependent if aggregated. The
    seven groups are instead PIVOTED INTO ONE ROW (conditional max
    on integer moments) and the seven-term sum written out in one
    fixed textual order, identical in both engines — the float fold
    becomes a scalar expression, not a reduction. Group moments are
    integer; dow uses the duck-0-based convention (Spark
    dayofweek−1, the documented off-by-one). The daily rollup kills
    the fact volume; everything after is one row.
    """
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.to_date("l_shipdate").alias("dd")).agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    g = daily.groupBy((F.dayofweek("dd") - 1).alias("dow")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("cnt").cast("bigint").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("q"),
    )
    aggs = []
    for i in range(7):
        aggs.append(
            F.max(F.when(F.col("dow") == i, F.col("n"))).alias(f"n{i}")
        )
        aggs.append(
            F.max(F.when(F.col("dow") == i, F.col("s"))).alias(f"s{i}")
        )
    aggs += [
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("s").cast("bigint").alias("ts"),
        F.sum("q").cast("bigint").alias("tq"),
    ]
    piv = g.agg(*aggs)
    sum_t = F.expr(
        "((s0 * s0 * 1.0 / n0 + s1 * s1 * 1.0 / n1)"
        " + (s2 * s2 * 1.0 / n2 + s3 * s3 * 1.0 / n3)"
        " + (s4 * s4 * 1.0 / n4 + s5 * s5 * 1.0 / n5)"
        " + s6 * s6 * 1.0 / n6)"
    )
    calc = piv.select("nn", "ts", "tq", sum_t.alias("sum_t"))
    ssb = F.col("sum_t") - F.col("ts") * F.col("ts") * 1.0 / F.col("nn")
    ssw = F.col("tq") - F.col("sum_t")
    return calc.select(
        F.col("nn").alias("n_days"),
        F.col("ts").alias("total_cnt"),
        F.col("tq").alias("total_sq"),
        F.round((ssb / 6.0) / (ssw / (F.col("nn") - 7.0)), 9).alias("f_stat"),
        F.round(ssb / (ssb + ssw), 9).alias("eta_squared"),
    )


ATP_CAPACITY_PCT = 80  # per-part capacity = 80 % of total demand


@op(
    "agg_atp_allocation",
    oracle=f"""
    WITH demand AS (
        SELECT l.l_partkey AS pk, o.o_orderpriority AS prio,
               o.o_orderdate AS od, l.l_orderkey AS ok, l.l_linenumber AS ln,
               CAST(round(l.l_quantity) AS BIGINT) AS qty
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ), cap AS (
        SELECT pk,
               CAST((sum(qty) * {ATP_CAPACITY_PCT}) // 100 AS BIGINT) AS cap
        FROM demand GROUP BY pk
    ), ranked AS (
        SELECT d.pk, d.prio, d.qty, c.cap,
               CAST(coalesce(sum(d.qty) OVER (PARTITION BY d.pk
                   ORDER BY d.prio, d.od, d.ok, d.ln
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS used_before
        FROM demand d JOIN cap c ON c.pk = d.pk
    )
    SELECT prio,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(qty) AS BIGINT) AS requested,
           CAST(sum(greatest(0, least(qty, cap - used_before))) AS BIGINT)
               AS allocated,
           CAST((sum(greatest(0, least(qty, cap - used_before))) * 1000000)
                // sum(qty) AS BIGINT) AS fill_ppm
    FROM ranked GROUP BY prio ORDER BY prio
    """,
    category=CAT,
)
def agg_atp_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Available-to-promise allocation: each part's constrained supply
    ({ATP_CAPACITY_PCT} % of demand) handed out in strict
    priority-then-date order, fill rate reported per priority class
    — the scarce-supply waterfall every OMS runs at cutoff (the
    deliverable is WHO absorbs the shortage: under priority
    allocation the 5-LOW class eats nearly all of it, which is the
    policy made visible — a pro-rata policy would spread it evenly,
    and the delta between those two tables is the business
    decision).

    Greedy sequential allocation is a PREFIX SUM in disguise:
    allocated = clamp(qty, cap − Σ earlier qty) needs only the
    running demand BEFORE each line (window, 1 PRECEDING), so the
    whole 'loop' is one per-part ordered window — no iteration, no
    state machine, and it parallelizes per part at 100 TB. Total
    (prio, date, key) ordering makes the allocation deterministic;
    all integers, fill rate in BIGINT-ppm.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    demand = li.join(o, o.o_orderkey == li.l_orderkey).select(
        F.col("l_partkey").alias("pk"),
        F.col("o_orderpriority").alias("prio"),
        F.col("o_orderdate").alias("od"),
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
        F.round("l_quantity").cast("bigint").alias("qty"),
    )
    cap = demand.groupBy("pk").agg(
        F.expr(f"(sum(qty) * {ATP_CAPACITY_PCT}) div 100")
        .cast("bigint")
        .alias("cap")
    )
    w = (
        Window.partitionBy("pk")
        .orderBy("prio", "od", "ok", "ln")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = demand.join(cap, "pk").select(
        "pk",
        "prio",
        "qty",
        "cap",
        F.coalesce(F.sum("qty").over(w), F.lit(0))
        .cast("bigint")
        .alias("used_before"),
    )
    alloc = F.greatest(
        F.lit(0), F.least(F.col("qty"), F.col("cap") - F.col("used_before"))
    )
    return (
        ranked.groupBy("prio")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum("qty").cast("bigint").alias("requested"),
            F.sum(alloc).cast("bigint").alias("allocated"),
        )
        .select(
            "prio",
            "n_lines",
            "requested",
            "allocated",
            F.expr("(allocated * 1000000) div requested")
            .cast("bigint")
            .alias("fill_ppm"),
        )
        .orderBy("prio")
    )


HOLIDAYS_MD = ((12, 25), (1, 1), (7, 4))  # Christmas, New Year, Jul 4
HOLIDAY_WINDOW_DAYS = 3


@op(
    "agg_holiday_proximity_lift",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(sum(round(o_totalprice)) AS BIGINT) AS rev_d
        FROM orders GROUP BY 1
    ), hol AS (
        SELECT CAST(make_date(y.y, md.m, md.dd) AS DATE) AS hd,
               md.nm AS holiday
        FROM (SELECT unnest(range(1995, 2002)) AS y) y
        CROSS JOIN (VALUES (12, 25, 'christmas'), (1, 1, 'new_year'),
                           (7, 4, 'july4')) md(m, dd, nm)
    ), tagged AS (
        SELECT h.holiday, d.rev_d
        FROM daily d JOIN hol h
          ON abs(date_diff('day', h.hd, d.d)) <= {HOLIDAY_WINDOW_DAYS}
    ), base AS (
        SELECT CAST(sum(rev_d) AS BIGINT) AS tot_d,
               CAST(count(*) AS BIGINT) AS tot_days
        FROM daily
    )
    SELECT t.holiday,
           CAST(count(*) AS BIGINT) AS window_days,
           CAST(sum(t.rev_d) AS BIGINT) AS window_rev_d,
           CAST((sum(t.rev_d) * b.tot_days * 1000000)
                // (count(*) * b.tot_d) AS BIGINT) AS lift_ppm
    FROM tagged t CROSS JOIN base b
    GROUP BY t.holiday, b.tot_days, b.tot_d
    ORDER BY t.holiday
    """,
    category=CAT,
)
def agg_holiday_proximity_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holiday proximity lift: revenue-per-day inside ±{HOLIDAY_WINDOW_DAYS}
    days of each holiday vs the all-days baseline, as a ppm ratio
    (10⁶ = no effect) — the calendar-event twin of agg_weekend_lift
    (weekly rhythm) and the WITHIN-year cousin of the monthly
    seasonal index: a promotion planner reads this per event, not
    per month. The holiday DIM is generated (years × (month, day)
    literals — the join_calendar_dim_rollup pattern), so no external
    table is needed and the op stays self-contained; a real
    deployment swaps in its holiday table with the same plan.

    Lift is a ratio of ratios — (window_rev/window_days) /
    (total_rev/total_days) — computed as ONE exact BIGINT
    cross-multiplication in ppm (rev·total_days·10⁶ div
    (days·total_rev)): no float division ever happens. Revenue is in
    integer DOLLARS here, not cents — the triple product
    rev·days·10⁶ must clear 2⁶³ and cents headroom does NOT
    (caught by ANSI overflow at the gate, the failure mode this
    comment records); dollars keep 10⁴× margin at any plausible SF. The ±window join is a broadcast of the
    ~21-row holiday dim against the ≤|days| daily rollup.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice"))).cast("bigint").alias("rev_d")
    )
    hol_rows = [
        (y, m, dd, nm)
        for y in range(1995, 2002)
        for (m, dd), nm in zip(HOLIDAYS_MD, ("christmas", "new_year", "july4"))
    ]
    hol = spark.createDataFrame(
        hol_rows, "y int, m int, dd int, nm string"
    ).select(
        F.make_date("y", "m", "dd").alias("hd"), F.col("nm").alias("holiday")
    )
    tagged = daily.join(
        F.broadcast(hol),
        F.abs(F.datediff(F.col("d"), F.col("hd"))) <= HOLIDAY_WINDOW_DAYS,
    )
    base = daily.agg(
        F.sum("rev_d").cast("bigint").alias("tot_d"),
        F.count("*").cast("bigint").alias("tot_days"),
    )
    return (
        tagged.groupBy("holiday")
        .agg(
            F.count("*").cast("bigint").alias("window_days"),
            F.sum("rev_d").cast("bigint").alias("window_rev_d"),
        )
        .crossJoin(F.broadcast(base))
        .select(
            "holiday",
            "window_days",
            "window_rev_d",
            F.expr(
                "(window_rev_d * tot_days * 1000000)"
                " div (window_days * tot_d)"
            )
            .cast("bigint")
            .alias("lift_ppm"),
        )
        .orderBy("holiday")
    )


HILL_K = 100
LOG_SCALE = 1000000  # micro-log quantization


@op(
    "agg_hill_tail_index",
    oracle=f"""
    WITH spend AS (
        SELECT o_custkey AS ck,
               CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS spend_c
        FROM orders GROUP BY 1
    ), ranked AS (
        SELECT spend_c,
               CAST(row_number() OVER (ORDER BY spend_c DESC, ck)
                    AS BIGINT) AS rk
        FROM spend
    ), thresh AS (
        SELECT CAST(round(ln(spend_c) * {LOG_SCALE}) AS BIGINT) AS l_min,
               spend_c AS x_threshold_c
        FROM ranked WHERE rk = {HILL_K} + 1
    ), top AS (
        SELECT CAST(round(ln(r.spend_c) * {LOG_SCALE}) AS BIGINT)
                   - t.l_min AS dl
        FROM ranked r CROSS JOIN thresh t
        WHERE r.rk <= {HILL_K}
    )
    SELECT CAST({HILL_K} AS BIGINT) AS k,
           t.x_threshold_c,
           CAST(sum(top.dl) AS BIGINT) AS sum_excess_microlog,
           CAST((CAST({HILL_K} AS BIGINT) * {LOG_SCALE} * 1000000)
                // sum(top.dl) AS BIGINT) AS alpha_ppm
    FROM top CROSS JOIN thresh t
    GROUP BY t.x_threshold_c
    """,
    category=CAT,
)
def agg_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail-index estimator over customer spend: α̂ = k / Σ
    ln(xᵢ/x₍ₖ₊₁₎) on the top-{HILL_K} order statistics — extreme
    value theory's standard heavy-tail measurement (α < 2 means
    infinite variance: mean-based planning fails and whale risk
    dominates; agg_pareto_cut shows the 80/20 share and
    agg_lorenz_deciles the whole curve — Hill puts a NUMBER with an
    asymptotic theory on the tail those describe, which is what a
    capacity planner extrapolating beyond observed data needs).

    Logs are per-row, immediately quantized to integer micro-logs
    (round(ln·10⁶) — the periodogram/α-sampling device: the
    quantization step dwarfs libm's last ulp) so the Hill sum is an
    exact BIGINT of log-excesses over the rank-(k+1) threshold, and
    α̂ lands as one integer ppm division. Only the top k+1 order
    statistics matter, so the plan takes them with orderBy+limit —
    TakeOrderedAndProject, a per-partition (k+1)-row heap, never a
    global sort — and the rank window that assigns rk runs over that
    BOUNDED (k+1)-row result, not the |customers| rollup (r8: the old
    global rank window is gone; the fact still dies in the first
    groupBy).
    """
    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100)).cast("bigint").alias("spend_c")
    )
    ranked = (
        spend.orderBy(F.desc("spend_c"), "ck")
        .limit(HILL_K + 1)
        .select(
            "spend_c",
            F.row_number()
            .over(Window.orderBy(F.desc("spend_c"), "ck"))
            .cast("bigint")
            .alias("rk"),
        )
    )
    microlog = F.round(F.log(F.col("spend_c")) * LOG_SCALE).cast("bigint")
    thresh = ranked.filter(F.col("rk") == HILL_K + 1).select(
        microlog.alias("l_min"), F.col("spend_c").alias("x_threshold_c")
    )
    top = (
        ranked.filter(F.col("rk") <= HILL_K)
        .crossJoin(F.broadcast(thresh))
        .select((microlog - F.col("l_min")).alias("dl"), "x_threshold_c")
    )
    return top.groupBy("x_threshold_c").agg(
        F.lit(HILL_K).cast("bigint").alias("k"),
        F.sum("dl").cast("bigint").alias("sum_excess_microlog"),
        F.expr(f"(CAST({HILL_K} AS BIGINT) * {LOG_SCALE} * 1000000) div sum(dl)")
        .cast("bigint")
        .alias("alpha_ppm"),
    ).select("k", "x_threshold_c", "sum_excess_microlog", "alpha_ppm")


ENTROPY_LOG_SCALE = 1000000


@op(
    "agg_markov_entropy_rate",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ), trans AS (
        SELECT event_type AS src, nxt AS dst, CAST(count(*) AS BIGINT) AS c
        FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
    ), rowtot AS (
        SELECT src, CAST(sum(c) AS BIGINT) AS ci FROM trans GROUP BY src
    ), cells AS (
        SELECT t.c,
               CAST(round(ln(r.ci * 1.0 / t.c) * {ENTROPY_LOG_SCALE})
                    AS BIGINT) AS microlog
        FROM trans t JOIN rowtot r ON r.src = t.src
    ), tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells)
    SELECT (SELECT n FROM tot) AS n_transitions,
           CAST(sum(c * microlog) AS BIGINT) AS entropy_num_micro,
           CAST(sum(c * microlog) // (SELECT n FROM tot) AS BIGINT)
               AS entropy_rate_micronats
    FROM cells
    """,
    category=CAT,
)
def agg_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the user-behavior Markov chain: H = Σᵢⱼ
    (cᵢⱼ/N)·ln(cᵢ/cᵢⱼ) in micro-nats — the PREDICTABILITY number on
    top of agg_markov_transitions' matrix (the matrix says WHERE
    users go next; the entropy rate says how much there is to know
    at all: ~0 = deterministic flows worth modeling, ~ln(k) =
    uniform noise where a next-event model cannot beat the
    marginal — the one-number go/no-go for sequence-model
    investment, Shannon's rate applied to clickstreams).

    Per-cell ln(cᵢ/cᵢⱼ) is one IEEE division + log, immediately
    quantized to integer micro-nats (the periodogram/Hill device),
    so the weighted sum Σ c·microlog is an exact commutative BIGINT
    — the float-fold ban holds even over the k² transition cells.
    The transition matrix is k²-sized (k = event types, dim-scale);
    the sequence pass is the same per-user lead window every path op
    uses.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    trans = seq.groupBy(
        F.col("event_type").alias("src"), F.col("nxt").alias("dst")
    ).agg(F.count("*").cast("bigint").alias("c"))
    rowtot = trans.groupBy("src").agg(F.sum("c").cast("bigint").alias("ci"))
    cells = trans.join(rowtot, "src").select(
        "c",
        F.round(
            F.log(F.col("ci") * 1.0 / F.col("c")) * ENTROPY_LOG_SCALE
        )
        .cast("bigint")
        .alias("microlog"),
    )
    tot = cells.agg(F.sum("c").cast("bigint").alias("n"))
    return (
        cells.agg(
            F.sum(F.col("c") * F.col("microlog"))
            .cast("bigint")
            .alias("entropy_num_micro")
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("n").alias("n_transitions"),
            "entropy_num_micro",
            F.expr("entropy_num_micro div n")
            .cast("bigint")
            .alias("entropy_rate_micronats"),
        )
    )


WELCH_SEG_A, WELCH_SEG_B = "BUILDING", "MACHINERY"


@op(
    "agg_welch_t_test",
    oracle=f"""
    WITH samp AS (
        SELECT c.c_mktsegment AS seg,
               CAST(round(o.o_totalprice) AS BIGINT) AS v
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment IN ('{WELCH_SEG_A}', '{WELCH_SEG_B}')
    ), piv AS (
        SELECT
          CAST(sum(CASE WHEN seg = '{WELCH_SEG_A}' THEN 1 ELSE 0 END)
               AS BIGINT) AS n1,
          CAST(sum(CASE WHEN seg = '{WELCH_SEG_A}' THEN v ELSE 0 END)
               AS BIGINT) AS s1,
          CAST(sum(CASE WHEN seg = '{WELCH_SEG_A}' THEN v * v ELSE 0 END)
               AS BIGINT) AS q1,
          CAST(sum(CASE WHEN seg = '{WELCH_SEG_B}' THEN 1 ELSE 0 END)
               AS BIGINT) AS n2,
          CAST(sum(CASE WHEN seg = '{WELCH_SEG_B}' THEN v ELSE 0 END)
               AS BIGINT) AS s2,
          CAST(sum(CASE WHEN seg = '{WELCH_SEG_B}' THEN v * v ELSE 0 END)
               AS BIGINT) AS q2
        FROM samp
    ), calc AS (
        SELECT n1, n2,
               ((q1 - s1 * (s1 * 1.0 / n1)) / (n1 - 1.0)) / n1 AS a,
               ((q2 - s2 * (s2 * 1.0 / n2)) / (n2 - 1.0)) / n2 AS b,
               s1 * 1.0 / n1 - s2 * 1.0 / n2 AS dmean
        FROM piv
    )
    SELECT n1, n2,
           round(dmean / sqrt(a + b), 9) AS t_stat,
           round((a + b) * (a + b)
                 / (a * a / (n1 - 1.0) + b * b / (n2 - 1.0)), 9) AS df_ws
    FROM calc
    """,
    category=CAT,
)
def agg_welch_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test on the SAME question
    agg_mann_whitney_u asks ({WELCH_SEG_A} vs {WELCH_SEG_B} order
    values) — deliberately paired: Welch assumes normal-ish means
    (fast, parametric, the default of every stats library since the
    Behrens–Fisher resolution), MWU assumes nothing; when the two
    disagree the distribution is telling you it's heavy-tailed, and
    running both IS the robustness check. Welch–Satterthwaite df
    reported alongside t (pooled-variance Student's t is WRONG here
    — group sizes and variances differ, the exact case Welch fixes).

    All six moments are one conditional-pivot row of BIGINTs (the
    ANOVA device) over integer DOLLARS — Σv² at cents scale
    overflows 2⁶³ on the larger corpus (ANSI overflow caught at the
    gate, like agg_holiday_proximity_lift); the variance expressions
    parenthesize as q − s·(s/n) so no integer product exceeds the
    moment scale, and t / df are mirrored token-for-token with
    DOUBLE literals (1.0D — Spark parses bare 1.0 as DECIMAL, the
    second gate catch in this op) and rounded at 9.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    samp = (
        c.join(o, o.o_custkey == c.c_custkey)
        .filter(c.c_mktsegment.isin(WELCH_SEG_A, WELCH_SEG_B))
        .select(
            c.c_mktsegment.alias("seg"),
            F.round(o.o_totalprice).cast("bigint").alias("v"),
        )
    )
    isa = F.col("seg") == WELCH_SEG_A
    isb = F.col("seg") == WELCH_SEG_B
    piv = samp.agg(
        F.sum(F.when(isa, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(isa, F.col("v")).otherwise(0)).cast("bigint").alias("s1"),
        F.sum(F.when(isa, F.col("v") * F.col("v")).otherwise(0))
        .cast("bigint")
        .alias("q1"),
        F.sum(F.when(isb, 1).otherwise(0)).cast("bigint").alias("n2"),
        F.sum(F.when(isb, F.col("v")).otherwise(0)).cast("bigint").alias("s2"),
        F.sum(F.when(isb, F.col("v") * F.col("v")).otherwise(0))
        .cast("bigint")
        .alias("q2"),
    )
    calc = piv.select(
        "n1",
        "n2",
        F.expr("((q1 - s1 * (s1 * 1.0D / n1)) / (n1 - 1.0D)) / n1").alias("a"),
        F.expr("((q2 - s2 * (s2 * 1.0D / n2)) / (n2 - 1.0D)) / n2").alias("b"),
        F.expr("s1 * 1.0D / n1 - s2 * 1.0D / n2").alias("dmean"),
    )
    return calc.select(
        "n1",
        "n2",
        F.round(F.expr("dmean / sqrt(a + b)"), 9).alias("t_stat"),
        F.round(
            F.expr(
                "(a + b) * (a + b)"
                " / (a * a / (n1 - 1.0D) + b * b / (n2 - 1.0D))"
            ),
            9,
        ).alias("df_ws"),
    )


DID_TREAT_REGION = "AMERICA"
DID_CUTOFF_Y = 2000
DID_PLACEBO_Y = 1998


@op(
    "agg_did_estimate",
    oracle=f"""
    WITH tagged AS (
        SELECT CASE WHEN r.r_name = '{DID_TREAT_REGION}' THEN 1 ELSE 0 END
                   AS treated,
               CASE WHEN EXTRACT(year FROM o.o_orderdate) >= {DID_CUTOFF_Y}
                    THEN 1 ELSE 0 END AS post,
               CASE WHEN EXTRACT(year FROM o.o_orderdate) >= {DID_PLACEBO_Y}
                    THEN 1 ELSE 0 END AS placebo_post,
               CAST(round(o.o_totalprice) AS BIGINT) AS v
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
    ), piv AS (
        SELECT
          CAST(sum(CASE WHEN treated = 1 AND post = 1 THEN v ELSE 0 END) AS BIGINT) AS s_tp,
          CAST(sum(CASE WHEN treated = 1 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_tp,
          CAST(sum(CASE WHEN treated = 1 AND post = 0 THEN v ELSE 0 END) AS BIGINT) AS s_t0,
          CAST(sum(CASE WHEN treated = 1 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_t0,
          CAST(sum(CASE WHEN treated = 0 AND post = 1 THEN v ELSE 0 END) AS BIGINT) AS s_cp,
          CAST(sum(CASE WHEN treated = 0 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cp,
          CAST(sum(CASE WHEN treated = 0 AND post = 0 THEN v ELSE 0 END) AS BIGINT) AS s_c0,
          CAST(sum(CASE WHEN treated = 0 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c0,
          CAST(sum(CASE WHEN treated = 1 AND post = 0 AND placebo_post = 1 THEN v ELSE 0 END) AS BIGINT) AS s_tq,
          CAST(sum(CASE WHEN treated = 1 AND post = 0 AND placebo_post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_tq,
          CAST(sum(CASE WHEN treated = 1 AND post = 0 AND placebo_post = 0 THEN v ELSE 0 END) AS BIGINT) AS s_tr,
          CAST(sum(CASE WHEN treated = 1 AND post = 0 AND placebo_post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tr,
          CAST(sum(CASE WHEN treated = 0 AND post = 0 AND placebo_post = 1 THEN v ELSE 0 END) AS BIGINT) AS s_cq,
          CAST(sum(CASE WHEN treated = 0 AND post = 0 AND placebo_post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cq,
          CAST(sum(CASE WHEN treated = 0 AND post = 0 AND placebo_post = 0 THEN v ELSE 0 END) AS BIGINT) AS s_cr,
          CAST(sum(CASE WHEN treated = 0 AND post = 0 AND placebo_post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_cr
        FROM tagged
    )
    SELECT n_tp, n_t0, n_cp, n_c0,
           round((s_tp * 1.0 / n_tp - s_t0 * 1.0 / n_t0)
                 - (s_cp * 1.0 / n_cp - s_c0 * 1.0 / n_c0), 9) AS did_usd,
           round((s_tq * 1.0 / n_tq - s_tr * 1.0 / n_tr)
                 - (s_cq * 1.0 / n_cq - s_cr * 1.0 / n_cr), 9)
               AS placebo_did_usd
    FROM piv
    """,
    category=CAT,
)
def agg_did_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: the change in {DID_TREAT_REGION}'s
    average order value after {DID_CUTOFF_Y} minus the same change
    in the rest of the world — causal inference's workhorse
    identification (the second difference nets out the global trend
    a naive before/after attributes to the 'treatment'), WITH the
    placebo estimate every referee demands: the identical estimator
    at a fake {DID_PLACEBO_Y} cutoff entirely inside the
    pre-period — a placebo far from zero falsifies the parallel-
    trends assumption and with it the headline number (the op ships
    its own refutation test; agg_ab_test_lift randomizes so it
    doesn't need one — DiD doesn't randomize, so it does).

    Both estimates come from ONE pivoted row of 16 BIGINT cell
    moments (the ANOVA device doubled); the four-mean expressions
    are mirrored token-for-token and rounded at 9. Dollars, not
    cents — consistent with the Welch/holiday overflow rule. One
    pass over the fact, dims broadcast.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    tagged = (
        o.join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .select(
            F.when(F.col("r_name") == DID_TREAT_REGION, 1).otherwise(0).alias("treated"),
            F.when(F.year("o_orderdate") >= DID_CUTOFF_Y, 1).otherwise(0).alias("post"),
            F.when(F.year("o_orderdate") >= DID_PLACEBO_Y, 1).otherwise(0).alias("placebo_post"),
            F.round("o_totalprice").cast("bigint").alias("v"),
        )
    )
    def cell(t, p, q=None):
        cond = (F.col("treated") == t) & (F.col("post") == p)
        if q is not None:
            cond = cond & (F.col("placebo_post") == q)
        return (
            F.sum(F.when(cond, F.col("v")).otherwise(0)).cast("bigint"),
            F.sum(F.when(cond, 1).otherwise(0)).cast("bigint"),
        )
    aggs = []
    for nm, (t, p, q) in {
        "tp": (1, 1, None), "t0": (1, 0, None),
        "cp": (0, 1, None), "c0": (0, 0, None),
        "tq": (1, 0, 1), "tr": (1, 0, 0),
        "cq": (0, 0, 1), "cr": (0, 0, 0),
    }.items():
        sm, ct = cell(t, p, q)
        aggs += [sm.alias(f"s_{nm}"), ct.alias(f"n_{nm}")]
    piv = tagged.agg(*aggs)
    return piv.select(
        "n_tp",
        "n_t0",
        "n_cp",
        "n_c0",
        F.round(
            F.expr(
                "(s_tp * 1.0D / n_tp - s_t0 * 1.0D / n_t0)"
                " - (s_cp * 1.0D / n_cp - s_c0 * 1.0D / n_c0)"
            ),
            9,
        ).alias("did_usd"),
        F.round(
            F.expr(
                "(s_tq * 1.0D / n_tq - s_tr * 1.0D / n_tr)"
                " - (s_cq * 1.0D / n_cq - s_cr * 1.0D / n_cr)"
            ),
            9,
        ).alias("placebo_did_usd"),
    )


DISPERSION_TOP_K = 20


@op(
    "agg_unit_price_dispersion",
    oracle=f"""
    WITH up AS (
        SELECT l_partkey AS pk,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS e_c,
               CAST(round(l_quantity) AS BIGINT) AS q,
               l_orderkey AS ok, l_linenumber AS ln
        FROM lineitem
    ), ranked AS (
        SELECT pk, e_c, q,
               row_number() OVER (PARTITION BY pk
                   ORDER BY e_c * 1.0 / q, ok, ln) AS r_lo,
               row_number() OVER (PARTITION BY pk
                   ORDER BY e_c * 1.0 / q DESC, ok, ln) AS r_hi,
               CAST(count(*) OVER (PARTITION BY pk) AS BIGINT) AS n_lines
        FROM up
    ), lo AS (
        SELECT pk, e_c AS lo_e, q AS lo_q, n_lines FROM ranked WHERE r_lo = 1
    ), hi AS (
        SELECT pk, e_c AS hi_e, q AS hi_q FROM ranked WHERE r_hi = 1
    )
    SELECT l.pk, l.n_lines, l.lo_e, l.lo_q, h.hi_e, h.hi_q,
           CAST((h.hi_e * l.lo_q * 1000000) // (l.lo_e * h.hi_q) AS BIGINT)
               AS dispersion_ppm
    FROM lo l JOIN hi h ON h.pk = l.pk
    WHERE l.n_lines >= 3
    ORDER BY dispersion_ppm DESC, l.pk
    LIMIT {DISPERSION_TOP_K}
    """,
    category=CAT,
)
def agg_unit_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit-price dispersion: per part, the realized max/min
    unit-price ratio (top-{DISPERSION_TOP_K} offenders, ≥3 lines) —
    the pricing-consistency audit (the same SKU selling at 3× its
    own floor inside one book is either uncontrolled discounting or
    a data defect; either way it's the first table a pricing team
    pulls, and agg_price_endings audits the LIST price shape while
    this audits the TRANSACTED spread).

    Unit price e/q is never materialized as a comparison key
    hazard: the min/max LINES are picked by row_number ordered on
    the e/q DOUBLE (one int/int IEEE division — bit-identical both
    engines) with (order, line) tie-breaks, and the published ratio
    is then computed from the winners' INTEGER components by exact
    cross-multiplication in ppm (hi_e·lo_q·10⁶ div (lo_e·hi_q)) —
    so the headline number is float-free even though the argmax
    ordering used floats. Per-part windows; ≥3-line support cut
    stops two-line noise from topping the table.
    """
    li = load_table(spark, sf_dir, "lineitem")
    up = li.select(
        F.col("l_partkey").alias("pk"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("e_c"),
        F.round("l_quantity").cast("bigint").alias("q"),
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
    )
    key = F.col("e_c") * 1.0 / F.col("q")
    wp = Window.partitionBy("pk")
    ranked = up.select(
        "pk",
        "e_c",
        "q",
        F.row_number().over(wp.orderBy(key, "ok", "ln")).alias("r_lo"),
        F.row_number().over(wp.orderBy(key.desc(), "ok", "ln")).alias("r_hi"),
        F.count("*").over(wp).cast("bigint").alias("n_lines"),
    )
    lo = ranked.filter(F.col("r_lo") == 1).select(
        "pk",
        F.col("e_c").alias("lo_e"),
        F.col("q").alias("lo_q"),
        "n_lines",
    )
    hi = ranked.filter(F.col("r_hi") == 1).select(
        "pk", F.col("e_c").alias("hi_e"), F.col("q").alias("hi_q")
    )
    return (
        lo.join(hi, "pk")
        .filter(F.col("n_lines") >= 3)
        .select(
            "pk",
            "n_lines",
            "lo_e",
            "lo_q",
            "hi_e",
            "hi_q",
            F.expr("(hi_e * lo_q * 1000000) div (lo_e * hi_q)")
            .cast("bigint")
            .alias("dispersion_ppm"),
        )
        .orderBy(F.desc("dispersion_ppm"), "pk")
        .limit(DISPERSION_TOP_K)
    )


WILSON_Z_MILLI = 1960  # z_{.975} = 1.96 as an exact milli literal


@op(
    "agg_wilson_interval",
    oracle=f"""
    WITH cells AS (
        SELECT c.c_mktsegment AS seg,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN o.o_orderpriority = '1-URGENT'
                             THEN 1 ELSE 0 END) AS BIGINT) AS k
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1
    )
    SELECT seg, n, k,
           round(k * 1.0 / n, 9) AS share,
           round((k + 1.9208) / (n + 3.8416)
                 - (1.96 * sqrt((k * (n - k)) * 1.0 / n + 0.9604))
                   / (n + 3.8416), 9) AS wilson_lo,
           round((k + 1.9208) / (n + 3.8416)
                 + (1.96 * sqrt((k * (n - k)) * 1.0 / n + 0.9604))
                   / (n + 3.8416), 9) AS wilson_hi
    FROM cells ORDER BY seg
    """,
    category=CAT,
)
def agg_wilson_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score intervals for the urgent-order share per segment —
    the proportion CI that behaves at the edges (the naive Wald
    interval p ± z√(p(1−p)/n) collapses to zero width at p∈{0,1}
    and goes negative near them — the two failure modes that make
    small-cell dashboards lie confidently; Wilson inverts the score
    test instead and stays inside [0,1], which is why every
    competent reporting layer replaced Wald decades ago —
    agg_ab_sample_size plans the n, THIS reports honestly at
    whatever n arrived).

    The z² terms are written as exact decimal literals (1.9208 =
    z²/2, 3.8416 = z², 0.9604 = z²/4 with z = 1.96 — stated so the
    magic numbers audit), the sqrt argument is assembled from
    integer k(n−k) with one division, and both bounds are mirrored
    token-for-token and rounded at 9. One conditional-count rollup
    per segment; everything after is a ≤|segments| projection.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cells = (
        o.join(c, c.c_custkey == o.o_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("k"),
        )
    )
    center = "(k + 1.9208D) / (n + 3.8416D)"
    half = "(1.96D * sqrt((k * (n - k)) * 1.0D / n + 0.9604D)) / (n + 3.8416D)"
    return cells.select(
        "seg",
        "n",
        "k",
        F.round(F.expr("k * 1.0D / n"), 9).alias("share"),
        F.round(F.expr(f"{center} - {half}"), 9).alias("wilson_lo"),
        F.round(F.expr(f"{center} + {half}"), 9).alias("wilson_hi"),
    ).orderBy("seg")


@op(
    "agg_simpsons_paradox_check",
    oracle="""
    WITH pts AS (
        SELECT p.p_brand AS brand,
               CAST(round(l.l_discount * 100) AS BIGINT) AS x,
               CAST(round(l.l_quantity) AS BIGINT) AS y
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ), grp AS (
        SELECT brand,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy
        FROM pts GROUP BY brand
    ), overall AS (
        SELECT CASE WHEN sum(sxy) * sum(n) > sum(sx) * 1.0 * sum(sy) THEN 1
                    WHEN sum(sxy) * sum(n) < sum(sx) * 1.0 * sum(sy) THEN -1
                    ELSE 0 END AS overall_sign
        FROM grp
    )
    SELECT g.brand, g.n,
           CASE WHEN g.n * g.sxy > g.sx * g.sy THEN 1
                WHEN g.n * g.sxy < g.sx * g.sy THEN -1
                ELSE 0 END AS group_sign,
           o.overall_sign,
           (CASE WHEN g.n * g.sxy > g.sx * g.sy THEN 1
                 WHEN g.n * g.sxy < g.sx * g.sy THEN -1
                 ELSE 0 END) * o.overall_sign = -1 AS sign_flipped
    FROM grp g CROSS JOIN overall o
    ORDER BY g.brand
    """,
    category=CAT,
)
def agg_simpsons_paradox_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's paradox detector: the SIGN of the discount↔quantity
    covariance overall vs within every brand — the aggregation trap
    as a query (a positive pooled trend made of negative
    within-group trends is THE textbook way a dashboard recommends
    exactly the wrong action; any analysis that groups less finely
    than the decision is exposed, so the engine ships the check,
    not just the warning — brands whose sign opposes the pooled
    sign are listed with `sign_flipped`).

    Covariance SIGN needs no division and no float: sign(cov) =
    sign(n·Σxy − Σx·Σy), pure BIGINT per group; the pooled sign
    reuses the group moments (Σn, Σsx … — one extra rollup, no
    second scan). The only 1.0 factor sits in the pooled comparison
    to keep the Σsx·Σsy product out of BIGINT overflow (values
    ≤ ~2⁶² as doubles with exact 53-bit mantissas at these moment
    scales — audited; beyond that, compare via per-group centered
    sums). Discount in integer cents-of-rate, quantity integer.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    pts = li.join(p, p.p_partkey == li.l_partkey).select(
        F.col("p_brand").alias("brand"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("x"),
        F.round("l_quantity").cast("bigint").alias("y"),
    )
    grp = pts.groupBy("brand").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    overall = grp.agg(
        F.when(
            F.sum("sxy") * F.sum("n") > F.sum("sx") * 1.0 * F.sum("sy"), 1
        )
        .when(F.sum("sxy") * F.sum("n") < F.sum("sx") * 1.0 * F.sum("sy"), -1)
        .otherwise(0)
        .alias("overall_sign")
    )
    gsign = (
        F.when(F.col("n") * F.col("sxy") > F.col("sx") * F.col("sy"), 1)
        .when(F.col("n") * F.col("sxy") < F.col("sx") * F.col("sy"), -1)
        .otherwise(0)
    )
    return (
        grp.crossJoin(F.broadcast(overall))
        .select(
            "brand",
            "n",
            gsign.alias("group_sign"),
            "overall_sign",
            (gsign * F.col("overall_sign") == -1).alias("sign_flipped"),
        )
        .orderBy("brand")
    )


TIER_HOT_D, TIER_WARM_D, TIER_COLD_D = 180, 540, 1080


@op(
    "agg_storage_tiering_policy",
    oracle=f"""
    WITH part_access AS (
        SELECT l_partkey AS pk,
               CAST(count(*) AS BIGINT) AS n_lines,
               max(CAST(l_shipdate AS DATE)) AS last_d
        FROM lineitem GROUP BY 1
    ), horizon AS (SELECT max(last_d) AS h FROM part_access),
    tiered AS (
        SELECT p.pk, p.n_lines,
               CASE WHEN date_diff('day', p.last_d, x.h) <= {TIER_HOT_D}
                    THEN 'hot'
                    WHEN date_diff('day', p.last_d, x.h) <= {TIER_WARM_D}
                    THEN 'warm'
                    WHEN date_diff('day', p.last_d, x.h) <= {TIER_COLD_D}
                    THEN 'cold'
                    ELSE 'frozen' END AS tier
        FROM part_access p CROSS JOIN horizon x
    ), tot AS (SELECT CAST(sum(n_lines) AS BIGINT) AS t FROM tiered)
    SELECT tier,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(n_lines) AS BIGINT) AS n_lines,
           CAST((sum(n_lines) * 1000000) // (SELECT t FROM tot) AS BIGINT)
               AS line_share_ppm
    FROM tiered GROUP BY tier ORDER BY tier
    """,
    category=CAT,
)
def agg_storage_tiering_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-tiering (ILM) simulation: every part assigned
    hot/warm/cold/frozen by recency of its LAST activity against
    the corpus horizon, with each tier's share of data volume — the
    lifecycle-policy sizing table run BEFORE committing to a tiering
    config (the decision input is exactly this: if 'frozen' holds
    60 % of lines, aggressive archival pays; if 10 %, the policy
    machinery costs more than it saves — and anchoring recency to
    the CORPUS horizon, not wall-clock, keeps the simulation
    reproducible and honest on historical data, stated because
    now()-anchored simulations are the classic nondeterminism bug
    this engine bans anyway).

    One map-combined per-part aggregate (the fact dies there), a
    broadcast one-row horizon, integer day arithmetic with literal
    band edges, and a ≤4-row rollup with exact ppm shares. The
    line count stands in for bytes (stated; swap in a size column
    at deployment, same plan).
    """
    li = load_table(spark, sf_dir, "lineitem")
    part_access = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.max(F.to_date("l_shipdate")).alias("last_d"),
    )
    horizon = part_access.agg(F.max("last_d").alias("h"))
    age = F.datediff(F.col("h"), F.col("last_d"))
    tiered = part_access.crossJoin(F.broadcast(horizon)).select(
        "pk",
        "n_lines",
        F.when(age <= TIER_HOT_D, "hot")
        .when(age <= TIER_WARM_D, "warm")
        .when(age <= TIER_COLD_D, "cold")
        .otherwise("frozen")
        .alias("tier"),
    )
    tot = tiered.agg(F.sum("n_lines").cast("bigint").alias("t"))
    return (
        tiered.groupBy("tier")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.sum("n_lines").cast("bigint").alias("n_lines"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "tier",
            "n_parts",
            "n_lines",
            F.expr("(n_lines * 1000000) div t")
            .cast("bigint")
            .alias("line_share_ppm"),
        )
        .orderBy("tier")
    )


@op(
    "agg_rounding_drift_audit",
    oracle="""
    WITH monthly AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
               CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT)
                   AS sum_of_rounded_d,
               CAST(round(sum(o_totalprice)) AS BIGINT) AS rounded_sum_d,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT m, n_orders, sum_of_rounded_d, rounded_sum_d,
           CAST(sum_of_rounded_d - rounded_sum_d AS BIGINT) AS drift_d,
           abs(sum_of_rounded_d - rounded_sum_d) * 2 <= n_orders
               AS within_half_ulp_bound
    FROM monthly ORDER BY m
    """,
    category=CAT,
)
def agg_rounding_drift_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The penny problem, measured: per month, Σround(price) vs
    round(Σprice) in whole dollars — the reconciliation gap that
    appears whenever line-level and total-level rounding meet (every
    invoice/GL close fights it; it is WHY this engine's money ops
    round once into cents and then stay integer — and this op turns
    that design argument into a measured table: the drift column is
    the error a round-each-line pipeline would book per month,
    bounded in expectation by ±n/2 half-ulps, which the audit flag
    checks exactly).

    Both aggregations come from one monthly rollup; the drift is an
    exact BIGINT difference, and the probabilistic bound |drift| ≤
    n/2 is applied by integer cross-multiplication (·2, no halves).
    The ONE cross-engine hazard is round(sum(double)) — the sums
    are identical IEEE doubles here because DuckDB and Spark both
    reduce this column without reordering at these partition counts;
    the cents discipline exists precisely so production never has
    to rely on that (stated — this audit is the exhibit, not the
    recommended path).
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.trunc("o_orderdate", "month").alias("m"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.round("o_totalprice").cast("bigint"))
            .cast("bigint")
            .alias("sum_of_rounded_d"),
            F.round(F.sum("o_totalprice")).cast("bigint").alias("rounded_sum_d"),
        )
        .select(
            "m",
            "n_orders",
            "sum_of_rounded_d",
            "rounded_sum_d",
            (F.col("sum_of_rounded_d") - F.col("rounded_sum_d"))
            .cast("bigint")
            .alias("drift_d"),
            (
                F.abs(F.col("sum_of_rounded_d") - F.col("rounded_sum_d")) * 2
                <= F.col("n_orders")
            ).alias("within_half_ulp_bound"),
        )
        .orderBy("m")
    )


@op(
    "agg_new_vs_returning_aov",
    oracle="""
    WITH firsts AS (
        SELECT o_custkey AS ck,
               min(CAST(date_trunc('month', o_orderdate) AS DATE)) AS m0
        FROM orders GROUP BY 1
    ), tagged AS (
        SELECT CAST(date_trunc('month', o.o_orderdate) AS DATE) AS m,
               CAST(round(o.o_totalprice) AS BIGINT) AS v,
               CAST(date_trunc('month', o.o_orderdate) AS DATE) = f.m0
                   AS is_new
        FROM orders o JOIN firsts f ON f.ck = o.o_custkey
    )
    SELECT m,
           CAST(sum(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new,
           CAST(sum(CASE WHEN is_new THEN v ELSE 0 END) AS BIGINT)
               AS new_rev_d,
           CAST(sum(CASE WHEN is_new THEN 0 ELSE 1 END) AS BIGINT)
               AS n_ret,
           CAST(sum(CASE WHEN is_new THEN 0 ELSE v END) AS BIGINT)
               AS ret_rev_d,
           CASE WHEN sum(CASE WHEN is_new THEN 1 ELSE 0 END) = 0
                  OR sum(CASE WHEN is_new THEN 0 ELSE 1 END) = 0
                THEN NULL
                ELSE CAST((sum(CASE WHEN is_new THEN v ELSE 0 END)
                           * sum(CASE WHEN is_new THEN 0 ELSE 1 END)
                           * 1000000)
                          // (sum(CASE WHEN is_new THEN 1 ELSE 0 END)
                              * sum(CASE WHEN is_new THEN 0 ELSE v END))
                          AS BIGINT) END AS new_over_ret_aov_ppm
    FROM tagged GROUP BY m ORDER BY m
    """,
    category=CAT,
)
def agg_new_vs_returning_aov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-returning average order value by month: each month's
    orders split by whether the customer DEBUTED that month, with
    the AOV ratio in ppm — the acquisition-quality trend
    (agg_new_returning_users counts HEADS; this prices them: a
    ratio sliding below 10⁶ means each acquisition cohort arrives
    spending less than the installed base — growth that mixes the
    average DOWN, invisible in both the volume chart and the user
    split; finance calls the gap 'new-customer discount' and it
    decides whether CAC math uses blended or new-only AOV).

    Debut month per customer is one min-rollup joined back (the
    retention-cohort anchor); the AOV ratio is the ratio-of-ratios
    cross-multiplication in exact BIGINT ppm (new_rev·n_ret·10⁶ div
    (n_new·ret_rev) — dollars per the overflow rule), with zero-side
    months yielding NULL rather than a division error. One fact
    pass + one ≤|months| rollup.
    """
    o = load_table(spark, sf_dir, "orders")
    firsts = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.min(F.trunc("o_orderdate", "month")).alias("m0")
    )
    tagged = o.join(firsts, firsts.ck == o.o_custkey).select(
        F.trunc("o_orderdate", "month").alias("m"),
        F.round("o_totalprice").cast("bigint").alias("v"),
        (F.trunc("o_orderdate", "month") == F.col("m0")).alias("is_new"),
    )
    n_new = F.sum(F.when(F.col("is_new"), 1).otherwise(0)).cast("bigint")
    new_rev = F.sum(F.when(F.col("is_new"), F.col("v")).otherwise(0)).cast(
        "bigint"
    )
    n_ret = F.sum(F.when(F.col("is_new"), 0).otherwise(1)).cast("bigint")
    ret_rev = F.sum(F.when(F.col("is_new"), 0).otherwise(F.col("v"))).cast(
        "bigint"
    )
    return (
        tagged.groupBy("m")
        .agg(
            n_new.alias("n_new"),
            new_rev.alias("new_rev_d"),
            n_ret.alias("n_ret"),
            ret_rev.alias("ret_rev_d"),
        )
        .select(
            "m",
            "n_new",
            "new_rev_d",
            "n_ret",
            "ret_rev_d",
            F.when(
                (F.col("n_new") == 0) | (F.col("n_ret") == 0),
                F.lit(None).cast("bigint"),
            )
            .otherwise(
                F.expr(
                    "(new_rev_d * n_ret * 1000000) div (n_new * ret_rev_d)"
                ).cast("bigint")
            )
            .alias("new_over_ret_aov_ppm"),
        )
        .orderBy("m")
    )


@op(
    "agg_boxplot_fences",
    oracle="""
    WITH cents AS (
        SELECT c.c_mktsegment AS seg,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS v
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), qs AS (
        SELECT seg,
               CAST(count(*) AS BIGINT) AS n,
               CAST(min(v) AS BIGINT) AS v_min,
               CAST(round(quantile_cont(v, 0.25) * 4) AS BIGINT) AS q1x4,
               CAST(round(quantile_cont(v, 0.50) * 4) AS BIGINT) AS medx4,
               CAST(round(quantile_cont(v, 0.75) * 4) AS BIGINT) AS q3x4,
               CAST(max(v) AS BIGINT) AS v_max
        FROM cents GROUP BY seg
    )
    SELECT q.seg, q.n, q.v_min, q.q1x4, q.medx4, q.q3x4, q.v_max,
           CAST((SELECT count(*) FROM cents c
                 WHERE c.seg = q.seg
                   AND 8 * c.v < 2 * q.q1x4 - 3 * (q.q3x4 - q.q1x4))
               AS BIGINT) AS n_low_outliers,
           CAST((SELECT count(*) FROM cents c
                 WHERE c.seg = q.seg
                   AND 8 * c.v > 2 * q.q3x4 + 3 * (q.q3x4 - q.q1x4))
               AS BIGINT) AS n_high_outliers
    FROM qs q ORDER BY q.seg
    """,
    category=CAT,
)
def agg_boxplot_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey box plot per segment: five-number summary + the count of
    points OUTSIDE the 1.5·IQR fences — the outlier census behind
    every box chart (agg_median_exact reports percentiles;
    agg_mad_robust flags by a robust z; Tukey fences are the third,
    quartile-anchored convention — and since the three disagree at
    the margins on heavy tails, a data platform must offer all
    three and say which one a chart used).

    Quartiles of integer cents interpolate on quarter weights, so
    ×4-scaled quartiles are EXACT BIGINTs (round only collapses the
    representation, not information); fences live in ×8 units where
    lo = 2·q1×4 − 3·IQR×4 stays integer, and outlier membership is
    the exact comparison 8v < lo — no float ever decides a count.
    One grouped quantile pass + one fence-count pass (two scans of
    the dim-bounded cents projection; at scale fuse via a window,
    stated).
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cents = o.join(c, c.c_custkey == o.o_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v"),
    )
    qs = cents.groupBy("seg").agg(
        F.count("*").cast("bigint").alias("n"),
        F.min("v").cast("bigint").alias("v_min"),
        F.round(F.expr("percentile(v, 0.25)") * 4).cast("bigint").alias("q1x4"),
        F.round(F.expr("percentile(v, 0.50)") * 4).cast("bigint").alias("medx4"),
        F.round(F.expr("percentile(v, 0.75)") * 4).cast("bigint").alias("q3x4"),
        F.max("v").cast("bigint").alias("v_max"),
    )
    j = cents.join(F.broadcast(qs), "seg")
    lo8 = 2 * F.col("q1x4") - 3 * (F.col("q3x4") - F.col("q1x4"))
    hi8 = 2 * F.col("q3x4") + 3 * (F.col("q3x4") - F.col("q1x4"))
    counts = j.groupBy("seg").agg(
        F.sum(F.when(8 * F.col("v") < lo8, 1).otherwise(0))
        .cast("bigint")
        .alias("n_low_outliers"),
        F.sum(F.when(8 * F.col("v") > hi8, 1).otherwise(0))
        .cast("bigint")
        .alias("n_high_outliers"),
    )
    return (
        qs.join(counts, "seg")
        .select(
            "seg",
            "n",
            "v_min",
            "q1x4",
            "medx4",
            "q3x4",
            "v_max",
            "n_low_outliers",
            "n_high_outliers",
        )
        .orderBy("seg")
    )


MUS_SAMPLES = 50
MUS_BUCKET = 1000  # orderkey div bucket for the two-level prefix sum


@op(
    "agg_monetary_unit_sampling",
    oracle=f"""
    WITH lines AS (
        SELECT l_orderkey AS ok, l_linenumber AS ln,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS w
        FROM lineitem
    ), seq AS (
        SELECT ok, ln, w,
               CAST(sum(w) OVER (ORDER BY ok, ln
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum
        FROM lines
    ), tot AS (SELECT CAST(sum(w) AS BIGINT) AS t FROM lines),
    params AS (
        SELECT t, t // {MUS_SAMPLES} AS interval_c,
               (t // {MUS_SAMPLES}) // 2 AS start_c
        FROM tot
    ), hits AS (
        SELECT s.ok, s.ln, s.w, s.cum
        FROM seq s CROSS JOIN params p
        WHERE (s.cum - p.start_c - 1) // p.interval_c
              > (s.cum - s.w - p.start_c - 1) // p.interval_c
          AND s.cum > p.start_c
    )
    SELECT CAST(count(*) AS BIGINT) AS n_selected,
           CAST(sum(w) AS BIGINT) AS selected_value_c,
           CAST(min(ok) AS BIGINT) AS first_ok,
           CAST(max(ok) AS BIGINT) AS last_ok,
           CAST((SELECT max(w) FROM lines) AS BIGINT) AS max_item_c,
           (SELECT t // {MUS_SAMPLES} FROM tot) <= (SELECT max(w) FROM lines)
               AS has_certain_selections
    FROM hits
    """,
    category=CAT,
)
def agg_monetary_unit_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monetary-unit sampling (MUS / PPS): fixed-interval selection
    over the cumulative CENTS of the book, deterministic mid-interval
    start — the CPA audit-sampling standard (each cent is equally
    likely, so a line's selection probability is proportional to its
    VALUE: the $1M line cannot hide behind ten thousand $10 lines
    the way it does under row sampling — which is the entire point
    of auditing by monetary unit; items larger than the interval are
    CERTAIN selections, flagged so the auditor strata them out).

    The cumulative is a prefix sum over the total (ok, ln) book
    order; the oracle runs it as one global window while the Spark
    side uses the dq_sequence_gaps two-level shape — partitioned
    cumsum within ok-div-{MUS_BUCKET} buckets plus broadcast bucket
    offsets from the per-bucket summary — provably identical and
    shuffle-sane at 100 TB. Interval crossing is pure integer
    floor-division bracketing (an item is picked iff its cents span
    crosses a sampling point), start = interval div 2 keeps §2.X's
    no-rand rule.
    """
    li = load_table(spark, sf_dir, "lineitem")
    lines = li.select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("w"),
    ).withColumn("bkt", F.expr(f"ok div {MUS_BUCKET}"))
    wb = Window.partitionBy("bkt").orderBy("ok", "ln").rowsBetween(
        Window.unboundedPreceding, 0
    )
    intra = lines.withColumn("cum_in", F.sum("w").over(wb).cast("bigint"))
    bsum = lines.groupBy("bkt").agg(F.sum("w").cast("bigint").alias("bw"))
    wo = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bsum.select(
        "bkt",
        F.coalesce(F.sum("bw").over(wo), F.lit(0)).cast("bigint").alias("off"),
    )
    seq = intra.join(F.broadcast(offsets), "bkt").select(
        "ok", "ln", "w", (F.col("cum_in") + F.col("off")).alias("cum")
    )
    tot = lines.agg(F.sum("w").cast("bigint").alias("t"))
    params = tot.select(
        "t",
        F.expr(f"t div {MUS_SAMPLES}").alias("interval_c"),
        F.expr(f"(t div {MUS_SAMPLES}) div 2").alias("start_c"),
    )
    hits = seq.crossJoin(F.broadcast(params)).filter(
        (
            F.expr("(cum - start_c - 1) div interval_c")
            > F.expr("(cum - w - start_c - 1) div interval_c")
        )
        & (F.col("cum") > F.col("start_c"))
    )
    max_item = lines.agg(F.max("w").cast("bigint").alias("mx"))
    return (
        hits.agg(
            F.count("*").cast("bigint").alias("n_selected"),
            F.sum("w").cast("bigint").alias("selected_value_c"),
            F.min("ok").cast("bigint").alias("first_ok"),
            F.max("ok").cast("bigint").alias("last_ok"),
        )
        .crossJoin(F.broadcast(max_item))
        .crossJoin(F.broadcast(params.select("interval_c")))
        .select(
            "n_selected",
            "selected_value_c",
            "first_ok",
            "last_ok",
            F.col("mx").alias("max_item_c"),
            (F.col("interval_c") <= F.col("mx")).alias(
                "has_certain_selections"
            ),
        )
    )


TRIM_PCT = 10  # trim 10 % from each tail


@op(
    "agg_trimmed_mean_exact",
    oracle=f"""
    WITH cents AS (
        SELECT c.c_mktsegment AS seg,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS v
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), ranked AS (
        SELECT seg, v,
               CAST(row_number() OVER (PARTITION BY seg ORDER BY v)
                    AS BIGINT) AS rk,
               CAST(count(*) OVER (PARTITION BY seg) AS BIGINT) AS n
        FROM cents
    ), kept AS (
        SELECT seg, v, n FROM ranked
        WHERE rk > (n * {TRIM_PCT}) // 100
          AND rk <= n - (n * {TRIM_PCT}) // 100
    )
    SELECT seg,
           CAST(max(n) AS BIGINT) AS n_total,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(v) AS BIGINT) AS kept_sum_c,
           CAST((sum(v) * 1000000) // count(*) AS BIGINT)
               AS trimmed_mean_microcents
    FROM kept GROUP BY seg ORDER BY seg
    """,
    category=CAT,
)
def agg_trimmed_mean_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact {TRIM_PCT} %-trimmed mean per segment — the robust center
    that completes the location family (mean is whale-dragged,
    median throws away 98 % of the information, MAD is a SPREAD;
    the trimmed mean is what rating systems and robust KPIs
    actually use because it keeps 80 % of the data's efficiency
    while bounding any single tail's influence — and trimmed vs
    plain mean side by side is the two-second whale-influence
    read).

    Trim boundaries are integer rank arithmetic ((n·{TRIM_PCT}) div
    100 from each end — floor on both sides, stated convention) over
    a per-segment rank window; the kept sum is an exact BIGINT and
    the mean is published in integer MICRO-CENTS via div (a round-9
    double at ~10⁷ cents leaves sub-ulp digits exposed —
    gate-caught, the ts_interrupted_series magnitude lesson; the
    integer form is simply exact). Rank windows partition by
    segment — the agg_median_exact shape.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cents = o.join(c, c.c_custkey == o.o_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v"),
    )
    wseg = Window.partitionBy("seg")
    ranked = cents.select(
        "seg",
        "v",
        F.row_number().over(wseg.orderBy("v")).cast("bigint").alias("rk"),
        F.count("*").over(wseg).cast("bigint").alias("n"),
    )
    cut = F.expr(f"(n * {TRIM_PCT}) div 100")
    kept = ranked.filter((F.col("rk") > cut) & (F.col("rk") <= F.col("n") - cut))
    return (
        kept.groupBy("seg")
        .agg(
            F.max("n").cast("bigint").alias("n_total"),
            F.count("*").cast("bigint").alias("n_kept"),
            F.sum("v").cast("bigint").alias("kept_sum_c"),
            F.expr("(sum(v) * 1000000) div count(*)")
            .cast("bigint")
            .alias("trimmed_mean_microcents"),
        )
        .orderBy("seg")
    )


THEIL_SCALE = 10**9


@op(
    "agg_theil_index",
    oracle=f"""
    WITH x AS (
      SELECT c.c_mktsegment AS seg, o.o_custkey,
             CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(cents) AS BIGINT) AS s FROM x),
    seg AS (SELECT seg, CAST(count(*) AS BIGINT) AS n_g,
                   CAST(sum(cents) AS BIGINT) AS s_g FROM x GROUP BY 1),
    within AS (
      SELECT x.seg,
             CAST(sum(CAST(floor((x.cents * g.n_g / (1.0 * g.s_g))
                  * ln(x.cents * g.n_g / (1.0 * g.s_g))
                  * {THEIL_SCALE} + 0.5) AS BIGINT)) AS BIGINT) AS twq
      FROM x JOIN seg g ON g.seg = x.seg GROUP BY x.seg),
    overall AS (
      SELECT CAST(sum(CAST(floor((x.cents * t.n / (1.0 * t.s))
                  * ln(x.cents * t.n / (1.0 * t.s))
                  * {THEIL_SCALE} + 0.5) AS BIGINT)) AS BIGINT) AS tq
      FROM x CROSS JOIN tot t)
    SELECT g.seg, g.n_g, g.s_g,
           round(w.twq / (g.n_g * {THEIL_SCALE}.0), 9) AS theil_within,
           round((g.s_g * 1.0 / t.s)
                 * ln((g.s_g * 1.0 / t.s) / (g.n_g * 1.0 / t.n)), 9)
               AS between_term,
           round(o.tq / (t.n * {THEIL_SCALE}.0), 9) AS theil_overall
    FROM seg g, tot t, within w, overall o
    WHERE w.seg = g.seg
    ORDER BY g.seg
    """,
    category=CAT,
)
def agg_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T inequality index of per-customer spend, DECOMPOSED into
    within-segment and between-segment components — the additive
    decomposition is why Theil beats Gini for cohort diagnostics
    (agg_gini_activity ranks overall inequality; Theil answers WHERE
    it lives: T = Σ share_g·T_g + Σ share_g·ln(mean_g/mean)). Here
    between_term ≈ 0 at both SFs — market segment explains basically
    none of the spend inequality, itself the finding.

    Determinism: spend quantized to integer cents at the row
    (the float fold over o_totalprice never exists); each customer's
    (x/μ)·ln(x/μ) term is a per-row float quantized to nano units
    floor(t·10⁹+0.5) BEFORE the cross-row sum, so every aggregate is
    exact BIGINT in any order (§2.X); the ≤5 published numbers are
    single rounded divisions of agreed integers. x>0 for every
    grouped customer (they exist because they ordered), so ln is
    total. Plan: one fact-side groupBy, 1-row/5-row broadcast
    aggregates joined back — no second fact scan, no skew exposure.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    x = (
        o.join(F.broadcast(c.select("c_custkey", "c_mktsegment")),
               o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"), "o_custkey")
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    x = tracked_persist(x)  # reused by tot/seg/within/overall: one fact scan, not four
    tot = x.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
    )
    seg = x.groupBy("seg").agg(
        F.count("*").cast("bigint").alias("n_g"),
        F.sum("cents").cast("bigint").alias("s_g"),
    )

    def term_q(num, den):
        ratio = F.col("cents") * num / (1.0 * den)
        return F.floor(ratio * F.log(ratio) * THEIL_SCALE + 0.5).cast("bigint")

    within = (
        x.join(F.broadcast(seg), "seg")
        .groupBy("seg")
        .agg(F.sum(term_q(F.col("n_g"), F.col("s_g"))).cast("bigint").alias("twq"))
    )
    overall = (
        x.crossJoin(F.broadcast(tot))
        .agg(F.sum(term_q(F.col("n"), F.col("s"))).cast("bigint").alias("tq"))
    )
    return (
        seg.join(within, "seg")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(overall))
        .select(
            "seg",
            "n_g",
            "s_g",
            F.round(F.col("twq") / (F.col("n_g") * float(THEIL_SCALE)), 9).alias(
                "theil_within"
            ),
            F.round(
                (F.col("s_g") * 1.0 / F.col("s"))
                * F.log(
                    (F.col("s_g") * 1.0 / F.col("s"))
                    / (F.col("n_g") * 1.0 / F.col("n"))
                ),
                9,
            ).alias("between_term"),
            F.round(F.col("tq") / (F.col("n") * float(THEIL_SCALE)), 9).alias(
                "theil_overall"
            ),
        )
        .orderBy("seg")
    )


CRAMER_SCALE = 10**9


@op(
    "agg_cramers_v",
    oracle=f"""
    WITH obs AS (
      SELECT l_returnflag AS r, l_linestatus AS c,
             CAST(count(*) AS BIGINT) AS o
      FROM lineitem GROUP BY 1, 2),
    marg_r AS (SELECT r, CAST(sum(o) AS BIGINT) AS nr FROM obs GROUP BY 1),
    marg_c AS (SELECT c, CAST(sum(o) AS BIGINT) AS nc FROM obs GROUP BY 1),
    tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
                   CAST(count(DISTINCT r) AS BIGINT) AS nrow,
                   CAST(count(DISTINCT c) AS BIGINT) AS ncol FROM obs),
    cells AS (
      SELECT CAST(floor((o.o - mr.nr * mc.nc / (1.0 * t.n)) ^ 2
                  / (mr.nr * mc.nc / (1.0 * t.n))
                  * {CRAMER_SCALE} + 0.5) AS BIGINT) AS chi_q
      FROM obs o JOIN marg_r mr ON mr.r = o.r
                 JOIN marg_c mc ON mc.c = o.c
                 CROSS JOIN tot t)
    SELECT t.n, t.nrow, t.ncol,
           CAST(sum(c.chi_q) AS BIGINT) AS chi2_q,
           round(sqrt(sum(c.chi_q) / {CRAMER_SCALE}.0
                 / (t.n * least(t.nrow - 1, t.ncol - 1))), 9) AS cramers_v
    FROM cells c CROSS JOIN tot t
    GROUP BY t.n, t.nrow, t.ncol
    """,
    category=CAT,
)
def agg_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V for returnflag × linestatus — the EFFECT-SIZE
    normalization agg_chi_square lacks: at 600 k rows a χ² of 1.86 is
    'significant' at any α while V = 0.0018 says the association is
    practically nil — the p-value-vs-effect-size distinction as a
    query (big-data χ² is ALWAYS significant; V is what you act on).

    χ² clears to per-cell quantized nano-terms summed as exact BIGINTs
    (contingency cells are the only rows; the float fold never exists
    at data scale — the fact table dies in the first groupBy);
    marginals/total are broadcast-size relations; V is one sqrt of an
    agreed integer ratio, round-9. One fact scan, one shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    obs = li.groupBy(
        F.col("l_returnflag").alias("r"), F.col("l_linestatus").alias("c")
    ).agg(F.count("*").cast("bigint").alias("o"))
    marg_r = obs.groupBy("r").agg(F.sum("o").cast("bigint").alias("nr"))
    marg_c = obs.groupBy("c").agg(F.sum("o").cast("bigint").alias("nc"))
    tot = obs.agg(
        F.sum("o").cast("bigint").alias("n"),
        F.countDistinct("r").cast("bigint").alias("nrow"),
        F.countDistinct("c").cast("bigint").alias("ncol"),
    )
    expected = F.col("nr") * F.col("nc") / (1.0 * F.col("n"))
    chi_q = F.floor(
        F.pow(F.col("o") - expected, 2) / expected * CRAMER_SCALE + 0.5
    ).cast("bigint")
    cells = (
        obs.join(F.broadcast(marg_r), "r")
        .join(F.broadcast(marg_c), "c")
        .crossJoin(F.broadcast(tot))
        .select(chi_q.alias("chi_q"), "n", "nrow", "ncol")
    )
    return cells.groupBy("n", "nrow", "ncol").agg(
        F.sum("chi_q").cast("bigint").alias("chi2_q"),
        F.round(
            F.sqrt(
                F.sum("chi_q")
                / float(CRAMER_SCALE)
                / (F.col("n") * F.least(F.col("nrow") - 1, F.col("ncol") - 1))
            ),
            9,
        ).alias("cramers_v"),
    )
