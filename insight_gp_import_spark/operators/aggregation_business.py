"""Business-metric aggregation operators (SURVEY.md §2.D): funnels,
cohorts/retention/LTV, RFM, pricing (index, endings, volume-mix),
inventory/fulfillment (ATP, aging, lags), growth accounting (MRR
bridge, like-for-like, run-rate) and assortment analytics (ABC/XYZ,
baskets, adoption). Split out of aggregation.py in r12 (verdict
item 7); same category/oracle contract, registry unchanged.
"""


from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from insight_gp_import_spark.registry import op, tracked_persist
from insight_gp_import_spark.tables import load_table

CAT = "aggregation"

from insight_gp_import_spark.operators.aggregation import (  # noqa: F401
    _exact_global_ntile,
    _exact_global_rank,
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
    # r13 (guide §2.4 + §5, the r12 co-purchase de-join pattern): ONE
    # distinct+collect_set pass builds each order's sorted item array,
    # persisted at order cardinality; nb (row count), item frequencies
    # (explode), and the pair counts (strictly-increasing in-JVM
    # expansion — quadratic only in order size, the same bound the old
    # self-join had) all derive from it. Before, the baskets distinct
    # was re-evaluated FOUR times (nb, item, both self-join sides).
    # Pair relation verified exceptAll-identical both ways at sf0.1
    # before the swap; measured variants at sf0.1 (quiet, warm): old
    # 1.95 s, persist-only 1.48, this 1.38 (the dejoin-without-persist
    # form ties at 1.29 but re-runs the distinct 3x — at scale that is
    # three full (orderkey, partkey) shuffles for one).
    sets = tracked_persist(
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
    )
    nb = sets.agg(F.count("*").alias("nb"))
    item = sets.select(F.explode("ps").alias("l_partkey")).groupBy(
        "l_partkey"
    ).agg(F.count("*").alias("n_item"))
    pair = (
        sets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "transform(slice(ps, i + 2, size(ps) - i - 1), "
                    "y -> struct(x AS p1, y AS p2))))"
                )
            ).alias("pr")
        )
        .groupBy(F.col("pr.p1").alias("p1"), F.col("pr.p2").alias("p2"))
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
