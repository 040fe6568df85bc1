"""Time-series model & diagnostic operators (SURVEY.md §2):
autocorrelation (ACF, Ljung-Box, AR(1)), trend tests (Theil-Sen,
Mann-Kendall, CUSUM, interrupted series), distribution fits (negbin,
overdispersion), forecasts + interval bands + combinations, control
charts (XMR, Bollinger, RSI, SMA crossover) and anomaly attribution.
Split out of timeseries.py in r12 (verdict item 7); registry unchanged.
"""


from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from insight_gp_import_spark.registry import op, tracked_persist
from insight_gp_import_spark.tables import load_table

CAT = "timeseries"

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


@op(
    "ts_ewma_7",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ), lagged AS (
        SELECT event_type, d, cnt,
               lag(cnt, 1) OVER w AS x1, lag(cnt, 2) OVER w AS x2,
               lag(cnt, 3) OVER w AS x3, lag(cnt, 4) OVER w AS x4,
               lag(cnt, 5) OVER w AS x5, lag(cnt, 6) OVER w AS x6
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY d)
    )
    SELECT event_type, d, cnt,
           round((CAST(cnt AS DOUBLE)
                  + 0.5 * coalesce(x1, 0) + 0.25 * coalesce(x2, 0)
                  + 0.125 * coalesce(x3, 0) + 0.0625 * coalesce(x4, 0)
                  + 0.03125 * coalesce(x5, 0) + 0.015625 * coalesce(x6, 0))
                 / (1.0
                    + CASE WHEN x1 IS NULL THEN 0 ELSE 0.5 END
                    + CASE WHEN x2 IS NULL THEN 0 ELSE 0.25 END
                    + CASE WHEN x3 IS NULL THEN 0 ELSE 0.125 END
                    + CASE WHEN x4 IS NULL THEN 0 ELSE 0.0625 END
                    + CASE WHEN x5 IS NULL THEN 0 ELSE 0.03125 END
                    + CASE WHEN x6 IS NULL THEN 0 ELSE 0.015625 END),
                 4) AS ewma7
    FROM lagged
    """,
    category=CAT,
)
def ts_ewma_7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (α=0.5) of daily event
    volume over a bounded 7-row trailing horizon — the smoothed-trend
    twin of win_moving's uniform window (recent days dominate, spikes
    decay geometrically instead of falling off a cliff at the frame
    edge).

    The textbook EWMA recursion s_i = αx_i + (1−α)s_{i−1} is
    inherently sequential; the distributed formulation truncates the
    geometric tail at 7 terms (weight < 2 % beyond, renormalized over
    the terms actually present) so it becomes SEVEN lag() columns over
    ONE (event_type, d) window — embarrassingly parallel, zero state.
    Determinism is exact, not approximate-float: the weights are
    negative powers of two (exactly representable doubles), the inputs
    are integer counts, so every product and the numerator sum are
    computed without representation error in BOTH engines before the
    single rounded division. At 100 TB the daily pre-aggregate
    collapses the stream to |event_types|×|days| rows first; the
    window is a no-op cost after that.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("d")
    lags = daily.select(
        "event_type", "d", "cnt",
        *[F.lag("cnt", k).over(w).alias(f"x{k}") for k in range(1, 7)],
    )
    weights = [0.5, 0.25, 0.125, 0.0625, 0.03125, 0.015625]
    num = F.col("cnt").cast("double")
    den = F.lit(1.0)
    for k, wt in enumerate(weights, start=1):
        num = num + wt * F.coalesce(F.col(f"x{k}"), F.lit(0))
        den = den + F.when(F.col(f"x{k}").isNull(), 0.0).otherwise(wt)
    return lags.select(
        "event_type", "d", "cnt", F.round(num / den, 4).alias("ewma7")
    )


@op(
    "ts_cusum_change",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ), base AS (
        SELECT event_type,
               CAST(sum(cnt) AS BIGINT) AS total,
               CAST(count(*) AS BIGINT) AS n_days
        FROM daily GROUP BY event_type
    ), dev AS (
        SELECT daily.event_type, d, cnt,
               cnt * n_days - total AS sdev,
               total, n_days
        FROM daily JOIN base ON daily.event_type = base.event_type
    )
    SELECT event_type, d, cnt,
           CAST(sum(sdev) OVER (PARTITION BY event_type ORDER BY d)
                AS BIGINT) AS cusum_scaled,
           (abs(sum(sdev) OVER (PARTITION BY event_type ORDER BY d)) * 10
            > total) AS drifted
    FROM dev
    """,
    category=CAT,
)
def ts_cusum_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point signal (Page '54, simplified): the running
    sum of deviations from the stream's own mean — a level SHIFT
    accumulates monotonically while noise cancels, so a drifting
    stream crosses the alarm band long before any single day trips
    dq_anomaly_zscore. The drift detector of the monitoring family.

    Exact integers throughout: deviation is scaled by n_days
    (cnt·N − total, avoiding the fractional mean entirely) and the
    alarm compares |CUSUM|·10 > total — integer cross-multiplication,
    no float boundary anywhere (the agg_heavy_hitters protocol applied
    to a window). Shape: daily pre-agg, a per-type broadcast of (total,
    n_days), then ONE partitioned running-sum window. CUSUM is
    inherently sequential but the partition is the stream key, so
    streams parallelize; within a stream the state is one number.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count("*").alias("cnt"))
    base = daily.groupBy("event_type").agg(
        F.sum("cnt").alias("total"), F.count("*").alias("n_days")
    )
    dev = daily.join(F.broadcast(base), "event_type").withColumn(
        "sdev", F.col("cnt") * F.col("n_days") - F.col("total")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    cusum = F.sum("sdev").over(w)
    return dev.select(
        "event_type", "d", "cnt",
        cusum.alias("cusum_scaled"),
        (F.abs(cusum) * 10 > F.col("total")).alias("drifted"),
    )


@op(
    "ts_seasonal_naive_forecast",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ), f AS (
        SELECT event_type, d, cnt,
               lag(cnt, 7) OVER (PARTITION BY event_type ORDER BY d)
                   AS forecast
        FROM daily
    )
    SELECT event_type,
           CAST(count(forecast) AS BIGINT) AS n_scored,
           CAST(sum(abs(cnt - forecast)) AS BIGINT) AS total_abs_err,
           CAST(sum(abs(cnt - forecast)) * 1000 // sum(cnt)
                FILTER (forecast IS NOT NULL) AS BIGINT) AS wape_milli
    FROM f GROUP BY event_type
    """,
    category=CAT,
)
def ts_seasonal_naive_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast benchmark (forecast = same weekday last
    week) with WAPE error — the baseline every real forecasting model
    must beat, and the capacity-planning sanity report next to
    ts_seasonality_profile's shape. M-competition lineage: seasonal
    naive is the standard yardstick, not a strawman.

    All-integer scoring: the forecast is lag-7 (exact), the error is
    an integer absolute difference, and WAPE = Σ|err|/Σactual is
    published in exact per-mille via integer floor division — no
    float enters the op (same discipline as ts_cusum_change). One
    daily pre-agg + one partitioned lag + a per-type reduction.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("d")
    f = daily.withColumn("forecast", F.lag("cnt", 7).over(w))
    return f.groupBy("event_type").agg(
        F.count("forecast").alias("n_scored"),
        F.sum(F.abs(F.col("cnt") - F.col("forecast"))).alias("total_abs_err"),
        F.expr(
            "CAST(sum(abs(cnt - forecast)) * 1000"
            " div sum(CASE WHEN forecast IS NOT NULL THEN cnt END) AS BIGINT)"
        ).alias("wape_milli"),
    )


@op(
    "ts_sma_crossover",
    oracle="""
    WITH daily AS (
        SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    ), sums AS (
        SELECT d, cnt,
               CAST(sum(cnt) OVER (ORDER BY d
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS s5,
               CAST(sum(cnt) OVER (ORDER BY d
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS BIGINT) AS s10,
               CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn
        FROM daily
    ), sig AS (
        SELECT d, cnt, s5, s10, (s5 * 2 > s10) AS fast_above,
               lag(s5 * 2 > s10) OVER (ORDER BY d) AS prev_above
        FROM sums WHERE rn >= 10
    )
    SELECT d, cnt, s5, s10,
           CASE WHEN fast_above AND NOT prev_above THEN 'golden'
                ELSE 'death' END AS cross_type
    FROM sig
    WHERE prev_above IS NOT NULL AND fast_above <> prev_above
    """,
    category=CAT,
)
def ts_sma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-average crossover detection: days where the 5-day volume
    SMA crosses the 10-day SMA (golden/death cross) — the
    trend-reversal signal every monitoring and trading dashboard
    draws, reported as the CROSSING DAYS only (ts_cusum_change finds
    level shifts via cumulative deviation; this finds them via
    window-ratio sign flips, and the two fire on different shapes).

    No SMA double is ever formed: sma5 > sma10 ⟺ 2·s5 > s10 by
    cross-multiplication (windows of 5 and 10 rows), so the whole
    signal is exact integer arithmetic on moving SUMS. Trading-day
    convention: ROWS frames over observed days (gaps collapse, like
    every exchange chart); both frames and the lag share one ordered
    window over the ≤|days| daily aggregate — the data volume dies in
    the groupBy below it (ts_yoy_growth rule). Warm-up rows (rn<10)
    are excluded BEFORE the lag so the first comparable day
    anchors the flip detection.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count("*").alias("cnt")
    )
    w = Window.orderBy("d")
    sums = daily.select(
        "d",
        "cnt",
        F.sum("cnt").over(w.rowsBetween(-4, 0)).alias("s5"),
        F.sum("cnt").over(w.rowsBetween(-9, 0)).alias("s10"),
        F.row_number().over(w).alias("rn"),
    )
    sig = sums.filter(F.col("rn") >= 10).select(
        "d",
        "cnt",
        "s5",
        "s10",
        (F.col("s5") * 2 > F.col("s10")).alias("fast_above"),
        F.lag(F.col("s5") * 2 > F.col("s10")).over(w).alias("prev_above"),
    )
    return sig.filter(
        F.col("prev_above").isNotNull()
        & (F.col("fast_above") != F.col("prev_above"))
    ).select(
        "d",
        "cnt",
        "s5",
        "s10",
        F.when(
            F.col("fast_above") & ~F.col("prev_above"), F.lit("golden")
        )
        .otherwise(F.lit("death"))
        .alias("cross_type"),
    )


DESEAS_TOP_K = 10


@op(
    "ts_deseasonalized_outliers",
    oracle=f"""
    WITH monthly AS (
        SELECT CAST(strftime(o_orderdate, '%m') AS INTEGER) AS mon,
               strftime(o_orderdate, '%Y-%m') AS ym,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_c
        FROM orders GROUP BY 1, 2
    ), per_mon AS (
        SELECT mon, CAST(sum(rev_c) AS BIGINT) AS mon_rev_c,
               CAST(count(*) AS BIGINT) AS n_years
        FROM monthly GROUP BY mon
    ), tot AS (
        SELECT CAST(sum(mon_rev_c) AS BIGINT) AS all_rev_c,
               CAST(sum(n_years) AS BIGINT) AS all_months
        FROM per_mon
    ), scored AS (
        SELECT ym, m.mon, rev_c,
               round((CAST(mon_rev_c AS DOUBLE) / n_years)
                     / (CAST(all_rev_c AS DOUBLE) / all_months), 4) AS sidx,
               round(CAST(rev_c AS DOUBLE)
                     / ((CAST(mon_rev_c AS DOUBLE) / n_years)
                        / (CAST(all_rev_c AS DOUBLE) / all_months))
                     / (CAST(all_rev_c AS DOUBLE) / all_months), 4)
                   AS deseas_ratio
        FROM monthly m JOIN per_mon p ON m.mon = p.mon CROSS JOIN tot
    )
    SELECT ym, mon, rev_c, sidx, deseas_ratio
    FROM scored
    ORDER BY abs(deseas_ratio - 1) DESC, ym
    LIMIT {DESEAS_TOP_K}
    """,
    category=CAT,
)
def ts_deseasonalized_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESEASONALIZED anomaly ranking — classical decomposition closed:
    each month's revenue ÷ its seasonal factor ÷ the overall monthly
    level = a ratio that is 1.0 for a month behaving exactly as its
    calendar position predicts; the top-{DESEAS_TOP_K} months by
    |ratio−1| are the genuinely anomalous ones AFTER the calendar is
    excused (ts_seasonal_index_monthly supplies the factors;
    dq_anomaly_zscore would flag every December — deseasonalizing
    first is the difference between an alert and an almanac).

    The whole chain reuses the monthly rollup once (one fact
    shuffle); factors and level are |months|-row/1-row broadcasts;
    final TakeOrdered on (|ratio−1| DESC, ym) with the unique
    year-month tie-break (§2.X rule 2). The ratio derives from
    integer sums, rounded before ranking.
    """
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.month("o_orderdate").alias("mon"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    ).agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("bigint")
        ).alias("rev_c")
    )
    per_mon = monthly.groupBy("mon").agg(
        F.sum("rev_c").alias("mon_rev_c"),
        F.count("*").alias("n_years"),
    )
    tot = per_mon.agg(
        F.sum("mon_rev_c").alias("all_rev_c"),
        F.sum("n_years").alias("all_months"),
    )
    level = F.col("all_rev_c").cast("double") / F.col("all_months")
    sidx = (F.col("mon_rev_c").cast("double") / F.col("n_years")) / level
    scored = (
        monthly.join(F.broadcast(per_mon), "mon")
        .crossJoin(F.broadcast(tot))
        .select(
            "ym",
            "mon",
            "rev_c",
            F.round(sidx, 4).alias("sidx"),
            F.round(
                F.col("rev_c").cast("double") / sidx / level, 4
            ).alias("deseas_ratio"),
        )
    )
    return scored.orderBy(
        F.abs(F.col("deseas_ratio") - 1).desc(), "ym"
    ).limit(DESEAS_TOP_K)


ACF_MAX_LAG = 7


def _acf_oracle() -> str:
    parts = []
    for k in range(1, ACF_MAX_LAG + 1):
        parts.append(f"""
    SELECT {k} AS lag_k, n,
           round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                 / sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy),
                 4) AS acf_r
    FROM (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(a.cnt) AS BIGINT) AS sx,
               CAST(sum(b.cnt) AS BIGINT) AS sy,
               CAST(sum(a.cnt * a.cnt) AS BIGINT) AS sxx,
               CAST(sum(b.cnt * b.cnt) AS BIGINT) AS syy,
               CAST(sum(a.cnt * b.cnt) AS BIGINT) AS sxy
        FROM daily a JOIN daily b ON b.d = a.d - {k}
    )""")
    return (
        """WITH daily AS (
        SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    )"""
        + " UNION ALL ".join(parts)
    )


@op("ts_acf_lags", oracle=_acf_oracle(), category=CAT)
def ts_acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUTOCORRELATION function, lags 1..{ACF_MAX_LAG}: Pearson r
    between the daily volume series and its k-day-shifted self — the
    diagnostic that picks model structure (a spike at lag 7 says
    weekly seasonality → seasonal-naive or weekday features; fast
    decay says short memory → EWMA is enough; agg_runs_test answers
    IS it autocorrelated, the ACF answers AT WHICH LAG).

    Pair formation is a d−k equi self-join of the tiny daily rollup
    per lag (the ts_wow_aligned shape — value-based alignment, no
    frame semantics); each lag's (n, Σx, Σy, Σx², Σy², Σxy) moment
    state is exact BIGINT and r derives identically per §2.X rule 1.
    Pairs use the INTERSECTION of the series with its shift (lag-k
    ACF over n−k points, the standard sample form).
    """
    ev = load_table(spark, sf_dir, "events")
    # r12 (guide §2.4): the daily rollup is referenced twice per lag
    # (both self-join sides) — persist it so the events scan+aggregate
    # runs once instead of 14 times across the 7 lags.
    daily = tracked_persist(
        ev.groupBy(F.to_date("ts").alias("d")).agg(
            F.count("*").alias("cnt")
        )
    )
    outs = []
    for k in range(1, ACF_MAX_LAG + 1):
        a = daily.alias("a")
        b = daily.select(
            F.date_add("d", k).alias("dk"), F.col("cnt").alias("cnt_b")
        ).alias("b")
        pairs = a.join(b, F.col("a.d") == F.col("b.dk"))
        m = pairs.agg(
            F.count("*").alias("n"),
            F.sum("cnt").alias("sx"),
            F.sum("cnt_b").alias("sy"),
            F.sum(F.col("cnt") * F.col("cnt")).alias("sxx"),
            F.sum(F.col("cnt_b") * F.col("cnt_b")).alias("syy"),
            F.sum(F.col("cnt") * F.col("cnt_b")).alias("sxy"),
        )
        nd = F.col("n").cast("double")
        num = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
        den = F.sqrt(
            nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
        ) * F.sqrt(
            nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
        )
        outs.append(
            m.select(
                F.lit(k).alias("lag_k"),
                "n",
                F.round(num / den, 4).alias("acf_r"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


BOLL_N = 20


@op(
    "ts_bollinger_breaks",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS d, CAST(count(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY 1
    ), stats AS (
        SELECT d, cnt,
               CAST(sum(cnt) OVER w AS BIGINT) AS s,
               CAST(sum(cnt * cnt) OVER w AS BIGINT) AS q,
               CAST(count(*) OVER w AS BIGINT) AS n,
               CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN {BOLL_N - 1} PRECEDING
                                         AND 1 PRECEDING)
    )
    SELECT d, cnt, s, q,
           CASE WHEN n * cnt - s > 0 THEN 'upper' ELSE 'lower' END AS band
    FROM stats
    WHERE rn > {BOLL_N}
      AND (n * cnt - s) * (n * cnt - s) > 4 * (n * q - s * s)
    ORDER BY d
    """,
    category=CAT,
)
def ts_bollinger_breaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band breakout days: daily shipment volume outside the
    trailing {BOLL_N}-day mean ± 2σ envelope — the volatility-scaled
    spike detector (a fixed-threshold alert pages on every seasonal
    hump; σ-scaled bands only page on days abnormal RELATIVE to their
    own recent regime; dq_anomaly_zscore is the same idea for a DQ
    metric, this is the trading-chart form on the business series).

    No mean or stddev double is ever formed: x > μ + 2σ over an
    n-row window ⟺ (n·x − s) > 0 ∧ (n·x − s)² > 4(n·q − s²) by
    cross-multiplication (n²σ² = n·q − s², both BIGINT-safe: daily
    counts ≤ ~10⁴ even at 100 TB keep q ≤ 20·10⁸). The envelope
    window EXCLUDES the current row (… 1 PRECEDING) — a spike must
    not fatten the very band that judges it, the off-by-one that
    makes textbook Bollinger miss step changes. Whole signal is one
    ordered window over the ≤|days| daily aggregate; the 100 TB fact
    volume dies in the groupBy (ts_sma_crossover rule).
    """
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.to_date("l_shipdate").alias("d")).agg(
        F.count("*").alias("cnt")
    )
    w = Window.orderBy("d")
    env = w.rowsBetween(-(BOLL_N - 1), -1)
    stats = daily.select(
        "d",
        "cnt",
        F.sum("cnt").over(env).alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).over(env).alias("q"),
        F.count("*").over(env).alias("n"),
        F.row_number().over(w).alias("rn"),
    )
    dev = F.col("n") * F.col("cnt") - F.col("s")
    return (
        stats.filter(
            (F.col("rn") > BOLL_N)
            & (dev * dev > 4 * (F.col("n") * F.col("q") - F.col("s") * F.col("s")))
        )
        .select(
            "d",
            "cnt",
            "s",
            "q",
            F.when(dev > 0, F.lit("upper")).otherwise(F.lit("lower")).alias("band"),
        )
        .orderBy("d")
    )


RSI_N = 14


@op(
    "ts_rsi_zones",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS d, CAST(count(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY 1
    ), delta AS (
        SELECT d, cnt, cnt - lag(cnt) OVER (ORDER BY d) AS ch,
               row_number() OVER (ORDER BY d) AS rn
        FROM daily
    ), gl AS (
        SELECT d, cnt,
               CAST(sum(CASE WHEN ch > 0 THEN ch ELSE 0 END) OVER w
                    AS BIGINT) AS g,
               CAST(sum(CASE WHEN ch < 0 THEN -ch ELSE 0 END) OVER w
                    AS BIGINT) AS l,
               rn
        FROM delta
        WINDOW w AS (ORDER BY d ROWS BETWEEN {RSI_N - 1} PRECEDING
                                         AND CURRENT ROW)
    )
    SELECT d, cnt, g, l,
           round(100.0 * g / (g + l), 9) AS rsi,
           CASE WHEN 2 * g >= 3 * l THEN 'overbought'
                ELSE 'oversold' END AS zone
    FROM gl
    WHERE rn > {RSI_N} AND g + l > 0
      AND (2 * g >= 3 * l OR 3 * g <= 2 * l)
    ORDER BY d
    """,
    category=CAT,
)
def ts_rsi_zones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSI({RSI_N}) momentum zones on daily shipment volume: days where
    Cutler's RSI = 100·G/(G+L) leaves the 40–60 neutral band — the
    overbought/oversold oscillator (ts_sma_crossover flags trend
    REVERSALS, Bollinger flags LEVEL outliers; RSI flags one-sided
    momentum RUNS — 14 days of mostly-up drift never trips either of
    the others). Cutler's simple-average form, not Wilder's EWMA:
    the recursive smoothing compounds float error unboundedly, the
    windowed form is pure integers.

    G and L are integer sums of the window's up-moves/down-moves, so
    zone entry is exact cross-multiplication (RSI ≥ 60 ⟺ 2G ≥ 3L,
    RSI ≤ 40 ⟺ 3G ≤ 2L); the displayed rsi is one int/int IEEE
    division rounded at 9 (identical in both engines). Flat windows
    (G+L=0) are excluded before the division can 0/0. One ordered
    window chain over the daily aggregate — same ≤|days| shape as
    every op in this family.
    """
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.to_date("l_shipdate").alias("d")).agg(
        F.count("*").alias("cnt")
    )
    w = Window.orderBy("d")
    delta = daily.select(
        "d",
        "cnt",
        (F.col("cnt") - F.lag("cnt").over(w)).alias("ch"),
        F.row_number().over(w).alias("rn"),
    )
    fr = w.rowsBetween(-(RSI_N - 1), 0)
    gl = delta.select(
        "d",
        "cnt",
        F.sum(F.when(F.col("ch") > 0, F.col("ch")).otherwise(0)).over(fr).alias("g"),
        F.sum(F.when(F.col("ch") < 0, -F.col("ch")).otherwise(0)).over(fr).alias("l"),
        "rn",
    )
    g, l = F.col("g"), F.col("l")
    return (
        gl.filter(
            (F.col("rn") > RSI_N)
            & (g + l > 0)
            & ((2 * g >= 3 * l) | (3 * g <= 2 * l))
        )
        .select(
            "d",
            "cnt",
            "g",
            "l",
            F.round(F.lit(100.0) * g / (g + l), 9).alias("rsi"),
            F.when(2 * g >= 3 * l, F.lit("overbought"))
            .otherwise(F.lit("oversold"))
            .alias("zone"),
        )
        .orderBy("d")
    )


@op(
    "ts_theil_sen_trend",
    oracle="""
    WITH daily AS (
        SELECT event_type AS et, CAST(ts AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ), slopes AS (
        SELECT a.et,
               round((b.cnt - a.cnt) * 1.0
                     / date_diff('day', a.d, b.d), 9) AS slope,
               a.d AS d1, b.d AS d2
        FROM daily a JOIN daily b ON a.et = b.et AND a.d < b.d
    ), ranked AS (
        SELECT et, slope,
               CAST(row_number() OVER (PARTITION BY et
                   ORDER BY slope, d1, d2) AS BIGINT) AS rn,
               CAST(count(*) OVER (PARTITION BY et) AS BIGINT) AS n_pairs
        FROM slopes
    )
    SELECT et, n_pairs, slope AS sen_slope
    FROM ranked
    WHERE rn = (n_pairs + 1) // 2
    ORDER BY et
    """,
    category=CAT,
)
def ts_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per event type: the MEDIAN of all
    pairwise daily-volume slopes — the outlier-immune answer to
    agg_regression's OLS slope (one launch-day spike drags a
    least-squares fit arbitrarily; the slope median tolerates ~29 %
    contamination, which is why monitoring burn-rate trends use it).

    Pairwise O(days²) happens on the DAILY AGGREGATE (the fact
    volume dies in the groupBy; days are dim-sized, 435 pairs per
    type here, ~bounded by the retention window at 100 TB — and the
    self-join partitions by event_type so pairs never cross types).
    Each slope is ONE int/int IEEE division — bit-identical in both
    engines — rounded at 9 BEFORE the median rank (§2.X flag rule);
    the LOWER median ((n+1) div 2, stated) avoids averaging two
    doubles; (slope, d1, d2) makes the order total.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("et"), F.to_date("ts").alias("d")
    ).agg(F.count("*").cast("bigint").alias("cnt"))
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(
        b, (F.col("a.et") == F.col("b.et")) & (F.col("a.d") < F.col("b.d"))
    ).select(
        F.col("a.et").alias("et"),
        F.round(
            (F.col("b.cnt") - F.col("a.cnt"))
            * 1.0
            / F.datediff(F.col("b.d"), F.col("a.d")),
            9,
        ).alias("slope"),
        F.col("a.d").alias("d1"),
        F.col("b.d").alias("d2"),
    )
    w = Window.partitionBy("et")
    ranked = slopes.select(
        "et",
        "slope",
        F.row_number()
        .over(w.orderBy("slope", "d1", "d2"))
        .cast("bigint")
        .alias("rn"),
        F.count("*").over(w).cast("bigint").alias("n_pairs"),
    )
    return (
        ranked.filter(
            F.col("rn") == F.floor((F.col("n_pairs") + 1) / 2).cast("bigint")
        )
        .select("et", "n_pairs", F.col("slope").alias("sen_slope"))
        .orderBy("et")
    )


PGRAM_PERIODS = (3, 5, 7, 14, 30)


PGRAM_SCALE = 1000


@op(
    "ts_periodogram_quantized",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS dd, CAST(count(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY 1
    ), idx AS (
        SELECT date_diff('day', (SELECT min(dd) FROM daily), dd) AS d, cnt
        FROM daily
    ), per AS (SELECT unnest({list(PGRAM_PERIODS)}) AS p), terms AS (
        SELECT p, cnt,
            CAST(round(cos(2 * pi() * (d % p) / p) * {PGRAM_SCALE})
                 AS BIGINT) AS c,
            CAST(round(sin(2 * pi() * (d % p) / p) * {PGRAM_SCALE})
                 AS BIGINT) AS s
        FROM idx CROSS JOIN per
    ), pw AS (
        SELECT p, CAST(sum(cnt * c) AS BIGINT) AS sc,
               CAST(sum(cnt * s) AS BIGINT) AS ss
        FROM terms GROUP BY p
    )
    SELECT p AS period, sc, ss,
           CAST(sc * sc + ss * ss AS BIGINT) AS power,
           CAST(row_number() OVER (ORDER BY sc * sc + ss * ss DESC, p)
                AS BIGINT) AS power_rank
    FROM pw ORDER BY period
    """,
    category=CAT,
)
def ts_periodogram_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized-DFT periodogram: spectral power of the daily volume
    series at candidate periods {PGRAM_PERIODS} — WHICH cycle
    dominates, answered by Fourier projection instead of
    ts_acf_lags' time-domain autocorrelation (ACF at lag 7 conflates
    a true weekly cycle with a 14-day cycle's harmonic; the
    periodogram separates them — here the 14-day component outranks
    the 7-day one, which ACF alone cannot show).

    THE determinism trick: a raw DFT is Σ xₜ·cos(ωt) — a cross-row
    FLOAT sum, order-dependent and §2.X-banned. Instead each trig
    factor is QUANTIZED to an integer (round(cos·10³) — the ½·10⁻³
    quantization step dwarfs any libm last-ulp disagreement, which
    is the point) so the projection becomes Σ cnt·c — an exact,
    commutative BIGINT sum; power = sc²+ss² stays integer
    (overflow-audited: |sc| ≤ Σcnt·10³). The ~0.1 % amplitude bias
    from quantization is uniform across periods, so the power
    RANKING — the deliverable — is unaffected. One daily rollup ×
    |periods| cross join, map-combined.
    """
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.to_date("l_shipdate").alias("dd")).agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    d0 = daily.agg(F.min("dd").alias("d0"))
    idx = daily.crossJoin(F.broadcast(d0)).select(
        F.datediff(F.col("dd"), F.col("d0")).alias("d"), "cnt"
    )
    per = spark.createDataFrame([(p,) for p in PGRAM_PERIODS], "p int")
    ang = 2 * F.expr("pi()") * (F.col("d") % F.col("p")) / F.col("p")
    terms = idx.crossJoin(F.broadcast(per)).select(
        "p",
        "cnt",
        F.round(F.cos(ang) * PGRAM_SCALE).cast("bigint").alias("c"),
        F.round(F.sin(ang) * PGRAM_SCALE).cast("bigint").alias("s"),
    )
    pw = terms.groupBy("p").agg(
        F.sum(F.col("cnt") * F.col("c")).cast("bigint").alias("sc"),
        F.sum(F.col("cnt") * F.col("s")).cast("bigint").alias("ss"),
    )
    power = (F.col("sc") * F.col("sc") + F.col("ss") * F.col("ss")).cast(
        "bigint"
    )
    return (
        pw.select(
            F.col("p").alias("period"),
            "sc",
            "ss",
            power.alias("power"),
        )
        .withColumn(
            "power_rank",
            F.row_number()
            .over(Window.orderBy(F.desc("power"), "period"))
            .cast("bigint"),
        )
        .orderBy("period")
    )


NAIVE_LAG = 7


PI_LO_PCT, PI_HI_PCT = 10, 90


PI_REPORT_DAYS = 30


@op(
    "ts_naive_interval_bands",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS d, CAST(count(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY 1
    ), fc AS (
        SELECT d, cnt,
               lag(cnt, {NAIVE_LAG}) OVER (ORDER BY d) AS naive,
               CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn,
               CAST(count(*) OVER () AS BIGINT) AS nd
        FROM daily
    ), resid AS (
        SELECT cnt - naive AS r FROM fc WHERE naive IS NOT NULL
    ), rr AS (
        SELECT r, CAST(row_number() OVER (ORDER BY r) AS BIGINT) AS rk,
               CAST(count(*) OVER () AS BIGINT) AS n
        FROM resid
    ), qs AS (
        SELECT
          max(CASE WHEN rk = (n * {PI_LO_PCT} + 99) // 100 THEN r END) AS r_lo,
          max(CASE WHEN rk = (n * {PI_HI_PCT} + 99) // 100 THEN r END) AS r_hi
        FROM rr
    )
    SELECT f.d, f.cnt AS actual, f.naive,
           CAST(f.naive + q.r_lo AS BIGINT) AS lo,
           CAST(f.naive + q.r_hi AS BIGINT) AS hi,
           (f.cnt >= f.naive + q.r_lo AND f.cnt <= f.naive + q.r_hi)
               AS covered
    FROM fc f CROSS JOIN qs q
    WHERE f.naive IS NOT NULL AND f.rn > f.nd - {PI_REPORT_DAYS}
    ORDER BY f.d
    """,
    category=CAT,
)
def ts_naive_interval_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prediction intervals for the seasonal-naive forecast: lag-7
    point forecast ± exact empirical residual quantiles
    (p{PI_LO_PCT}/p{PI_HI_PCT}), reported for the last
    {PI_REPORT_DAYS} days with a per-day coverage flag — the
    uncertainty band every forecast consumer actually needs
    (ts_seasonal_naive_forecast emits the point; a point without an
    interval cannot drive a paging threshold, and the empirical-
    residual band is the distribution-free way to get one —
    conformal prediction's base case).

    Residual quantiles are EXACT ordered selection (rank =
    ⌈p·n/100⌉ over integer residuals — the agg_median_exact
    device, no interpolation, no float), folded to one row by
    conditional max; bands are then integer adds. The residual
    rank window is over ≤|days| rows; everything downstream of the
    daily rollup is day-scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.to_date("l_shipdate").alias("d")).agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    w = Window.orderBy("d")
    fc = daily.select(
        "d",
        "cnt",
        F.lag("cnt", NAIVE_LAG).over(w).alias("naive"),
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.count("*").over(Window.partitionBy()).cast("bigint").alias("nd"),
    )
    resid = fc.filter(F.col("naive").isNotNull()).select(
        (F.col("cnt") - F.col("naive")).alias("r")
    )
    rr = resid.select(
        "r",
        F.row_number().over(Window.orderBy("r")).cast("bigint").alias("rk"),
        F.count("*").over(Window.partitionBy()).cast("bigint").alias("n"),
    )
    qs = rr.agg(
        F.max(
            F.when(
                F.col("rk")
                == F.expr(f"(n * {PI_LO_PCT} + 99) div 100"),
                F.col("r"),
            )
        ).alias("r_lo"),
        F.max(
            F.when(
                F.col("rk")
                == F.expr(f"(n * {PI_HI_PCT} + 99) div 100"),
                F.col("r"),
            )
        ).alias("r_hi"),
    )
    return (
        fc.filter(
            F.col("naive").isNotNull()
            & (F.col("rn") > F.col("nd") - PI_REPORT_DAYS)
        )
        .crossJoin(F.broadcast(qs))
        .select(
            "d",
            F.col("cnt").alias("actual"),
            "naive",
            (F.col("naive") + F.col("r_lo")).cast("bigint").alias("lo"),
            (F.col("naive") + F.col("r_hi")).cast("bigint").alias("hi"),
            (
                (F.col("cnt") >= F.col("naive") + F.col("r_lo"))
                & (F.col("cnt") <= F.col("naive") + F.col("r_hi"))
            ).alias("covered"),
        )
        .orderBy("d")
    )


UNDERWATER_TOP_K = 5


@op(
    "ts_underwater_duration",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS d,
               CAST(sum(round(l_extendedprice * 100)) AS BIGINT) AS rev_c
        FROM lineitem GROUP BY 1
    ), marked AS (
        SELECT d, rev_c,
               CAST(max(rev_c) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS peak
        FROM daily
    ), uw AS (
        SELECT d, peak - rev_c AS depth_c,
               CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn_all
        FROM marked WHERE rev_c < peak
    ), isl AS (
        SELECT d, depth_c,
               CAST(d - INTERVAL (row_number() OVER (ORDER BY d)) DAY
                    AS DATE) AS grp
        FROM uw
    )
    SELECT min(d) AS spell_start, max(d) AS spell_end,
           CAST(count(*) AS BIGINT) AS underwater_days,
           CAST(max(depth_c) AS BIGINT) AS max_depth_c
    FROM isl GROUP BY grp
    ORDER BY underwater_days DESC, spell_start
    LIMIT {UNDERWATER_TOP_K}
    """,
    category=CAT,
)
def ts_underwater_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest underwater spells: maximal runs of consecutive days
    where daily revenue sits below its running all-time peak, top-5
    by duration with max depth — TIME-based drawdown
    (win_max_drawdown answers 'how far below peak'; this answers
    'how LONG below peak', and the two disagree on purpose: a deep
    one-day dip and a shallow two-month slump are opposite findings,
    which is why fund reporting always shows both).

    Gaps-islands on a CONDITION: underwater days anchored by
    d − row_number() (the win_gaps_islands device — consecutive
    dates in a filtered set share one anchor), after a running-max
    window on the daily cents rollup. All integer; spell bounds are
    min/max per island, ties broken by start date. The global
    windows run over ≤|days| rows — the fact died in the groupBy.
    """
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.to_date("l_shipdate").alias("d")).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100))
        .cast("bigint")
        .alias("rev_c")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    marked = daily.select(
        "d", "rev_c", F.max("rev_c").over(w).cast("bigint").alias("peak")
    )
    uw = marked.filter(F.col("rev_c") < F.col("peak")).select(
        "d", (F.col("peak") - F.col("rev_c")).alias("depth_c")
    )
    isl = uw.select(
        "d",
        "depth_c",
        F.date_sub(
            F.col("d"), F.row_number().over(Window.orderBy("d"))
        ).alias("grp"),
    )
    return (
        isl.groupBy("grp")
        .agg(
            F.min("d").alias("spell_start"),
            F.max("d").alias("spell_end"),
            F.count("*").cast("bigint").alias("underwater_days"),
            F.max("depth_c").cast("bigint").alias("max_depth_c"),
        )
        .drop("grp")
        .orderBy(F.desc("underwater_days"), "spell_start")
        .limit(UNDERWATER_TOP_K)
    )


XMR_K_MILLI = 2660  # Shewhart individuals constant 2.66, in milli-units


@op(
    "ts_xmr_control_chart",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS d, CAST(count(*) AS BIGINT) AS x
        FROM lineitem GROUP BY 1
    ), mr AS (
        SELECT d, x,
               abs(x - lag(x) OVER (ORDER BY d)) AS mrv
        FROM daily
    ), const AS (
        SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s,
               CAST(count(mrv) AS BIGINT) AS m, CAST(sum(mrv) AS BIGINT) AS mm
        FROM mr
    )
    SELECT r.d, r.x,
           CAST(c.s AS BIGINT) AS sum_x, c.n AS n_days,
           CAST(c.mm AS BIGINT) AS sum_mr, c.m AS n_mr,
           CASE WHEN r.x * c.n > c.s THEN 'above' ELSE 'below' END AS side
    FROM mr r CROSS JOIN const c
    WHERE abs(r.x * c.n - c.s) * c.m * 1000 > {XMR_K_MILLI} * c.n * c.mm
    ORDER BY r.d
    """,
    category=CAT,
)
def ts_xmr_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart XmR (individuals) control chart: days outside
    x̄ ± 2.66·M̄R — statistical process control's fixed-limit
    out-of-control signal (Bollinger adapts its band to the rolling
    regime and dq_anomaly_zscore to the global σ; SPC limits come
    from the MOVING RANGE, which estimates only COMMON-CAUSE
    variation — a slow drift inflates σ and hides itself from a
    z-score, but leaves MR small so XmR still fires; that
    distinction is the entire Deming argument for control charts).

    No mean, range-average or limit is ever a float: the violation
    predicate |x·n − S|·m·1000 > 2660·n·M̄Rsum is one BIGINT
    cross-multiplication (constants published as integer state so
    the limits are recomputable downstream); sidedness from the
    sign. One lag window + one scalar moment row over the daily
    rollup.
    """
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.to_date("l_shipdate").alias("d")).agg(
        F.count("*").cast("bigint").alias("x")
    )
    w = Window.orderBy("d")
    mr = daily.select(
        "d", "x", F.abs(F.col("x") - F.lag("x").over(w)).alias("mrv")
    )
    const = mr.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.count("mrv").cast("bigint").alias("m"),
        F.sum("mrv").cast("bigint").alias("mm"),
    )
    j = mr.crossJoin(F.broadcast(const))
    dev = F.abs(F.col("x") * F.col("n") - F.col("s"))
    return (
        j.filter(
            dev * F.col("m") * 1000 > XMR_K_MILLI * F.col("n") * F.col("mm")
        )
        .select(
            "d",
            "x",
            F.col("s").alias("sum_x"),
            F.col("n").alias("n_days"),
            F.col("mm").alias("sum_mr"),
            F.col("m").alias("n_mr"),
            F.when(F.col("x") * F.col("n") > F.col("s"), "above")
            .otherwise("below")
            .alias("side"),
        )
        .orderBy("d")
    )


EVENT_STUDY_HALF = 3  # offsets -3..+3 around each event day


@op(
    "ts_event_study_panel",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS d, CAST(count(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY 1
    ), stats AS (
        SELECT d, cnt,
               CAST(sum(cnt) OVER w AS BIGINT) AS s,
               CAST(sum(cnt * cnt) OVER w AS BIGINT) AS q,
               CAST(count(*) OVER w AS BIGINT) AS n,
               CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN 19 PRECEDING AND 1 PRECEDING)
    ), ev AS (
        SELECT d AS ed FROM stats
        WHERE rn > 20 AND n * cnt - s > 0
          AND (n * cnt - s) * (n * cnt - s) > 4 * (n * q - s * s)
    ), panel AS (
        SELECT date_diff('day', e.ed, x.d) AS offset_d, x.cnt
        FROM ev e JOIN daily x
          ON abs(date_diff('day', e.ed, x.d)) <= {EVENT_STUDY_HALF}
    ), base AS (
        SELECT CAST(sum(cnt) AS BIGINT) AS s0, CAST(count(*) AS BIGINT) AS n0
        FROM panel WHERE offset_d = 0
    )
    SELECT p.offset_d,
           CAST(count(*) AS BIGINT) AS n_obs,
           CAST(sum(p.cnt) AS BIGINT) AS sum_cnt,
           CAST((sum(p.cnt) * b.n0 * 1000000) // (count(*) * b.s0)
                AS BIGINT) AS rel_to_day0_ppm
    FROM panel p CROSS JOIN base b
    GROUP BY p.offset_d, b.n0, b.s0
    ORDER BY p.offset_d
    """,
    category=CAT,
)
def ts_event_study_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event study around volatility breakouts: the average volume
    trajectory at offsets −{EVENT_STUDY_HALF}..+{EVENT_STUDY_HALF}
    days around every Bollinger UPPER break, normalized to day 0 in
    ppm — the econometric event-study panel applied to the engine's
    own signal (ts_bollinger_breaks finds the spike DAYS; this
    stacks and averages their NEIGHBORHOODS, answering the question
    the single-day flag can't: do spikes mean-revert next day or
    persist? — i.e. is the alert actionable or already over). The
    event set is recomputed inline from the same cross-multiplied
    integer predicate, so flag and panel can never drift.

    The stack is a ±{EVENT_STUDY_HALF}-day band join of the event
    days (dim-sized) against the daily rollup; the trajectory is a
    ratio of per-offset means to the day-0 mean, computed as ONE
    exact BIGINT cross-multiplication in ppm (sum·n₀·10⁶ div
    (n·s₀)) — the mean-of-means float trap never appears.
    """
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.to_date("l_shipdate").alias("d")).agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    w = Window.orderBy("d")
    env = w.rowsBetween(-19, -1)
    stats = daily.select(
        "d",
        "cnt",
        F.sum("cnt").over(env).alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).over(env).alias("q"),
        F.count("*").over(env).alias("n"),
        F.row_number().over(w).alias("rn"),
    )
    dev = F.col("n") * F.col("cnt") - F.col("s")
    ev = stats.filter(
        (F.col("rn") > 20)
        & (dev > 0)
        & (dev * dev > 4 * (F.col("n") * F.col("q") - F.col("s") * F.col("s")))
    ).select(F.col("d").alias("ed"))
    panel = ev.join(
        daily, F.abs(F.datediff(F.col("d"), F.col("ed"))) <= EVENT_STUDY_HALF
    ).select(F.datediff(F.col("d"), F.col("ed")).alias("offset_d"), "cnt")
    base = panel.filter(F.col("offset_d") == 0).agg(
        F.sum("cnt").cast("bigint").alias("s0"),
        F.count("*").cast("bigint").alias("n0"),
    )
    return (
        panel.groupBy("offset_d")
        .agg(
            F.count("*").cast("bigint").alias("n_obs"),
            F.sum("cnt").cast("bigint").alias("sum_cnt"),
        )
        .crossJoin(F.broadcast(base))
        .select(
            "offset_d",
            "n_obs",
            "sum_cnt",
            F.expr("(sum_cnt * n0 * 1000000) div (n_obs * s0)")
            .cast("bigint")
            .alias("rel_to_day0_ppm"),
        )
        .orderBy("offset_d")
    )


@op(
    "ts_anomaly_consensus",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS d, CAST(count(*) AS BIGINT) AS x
        FROM lineitem GROUP BY 1
    ), gm AS (
        SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s,
               CAST(sum(x * x) AS BIGINT) AS q
        FROM daily
    ), mr AS (
        SELECT d, x, abs(x - lag(x) OVER (ORDER BY d)) AS mrv,
               CAST(sum(x) OVER wb AS BIGINT) AS bs,
               CAST(sum(x * x) OVER wb AS BIGINT) AS bq,
               CAST(count(*) OVER wb AS BIGINT) AS bn,
               CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn
        FROM daily
        WINDOW wb AS (ORDER BY d ROWS BETWEEN 19 PRECEDING AND 1 PRECEDING)
    ), mrs AS (
        SELECT CAST(count(mrv) AS BIGINT) AS m, CAST(sum(mrv) AS BIGINT) AS mm
        FROM mr
    ), flags AS (
        SELECT r.d, r.x,
               (r.x * g.n - g.s) * (r.x * g.n - g.s)
                   > 9 * (g.n * g.q - g.s * g.s) AS z_flag,
               r.rn > 20 AND
               (r.bn * r.x - r.bs) * (r.bn * r.x - r.bs)
                   > 4 * (r.bn * r.bq - r.bs * r.bs) AS boll_flag,
               abs(r.x * g.n - g.s) * ms.m * 1000
                   > 2660 * g.n * ms.mm AS xmr_flag
        FROM mr r CROSS JOIN gm g CROSS JOIN mrs ms
    )
    SELECT d, x, z_flag, boll_flag, xmr_flag,
           CAST((CASE WHEN z_flag THEN 1 ELSE 0 END)
                + (CASE WHEN boll_flag THEN 1 ELSE 0 END)
                + (CASE WHEN xmr_flag THEN 1 ELSE 0 END) AS BIGINT) AS n_flags
    FROM flags
    WHERE z_flag OR boll_flag OR xmr_flag
    ORDER BY d
    """,
    category=CAT,
)
def ts_anomaly_consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly-detector consensus: every day flagged by ANY of the
    engine's three volume detectors — global 3σ z-score, rolling
    Bollinger 2σ, Shewhart XmR — with per-detector booleans and the
    vote count. The disagreement pattern is the deliverable
    (alert-fatigue triage 101: z-only = level outlier vs history,
    Bollinger-only = outlier vs recent regime, XmR-only = shift vs
    common-cause noise, 3/3 = page someone; shipping the consensus
    as ONE relation is what lets an on-call rota tier its paging
    rules instead of triaging three streams).

    All three predicates are the already-verified integer
    cross-multiplications of their standalone ops, recomputed inline
    from SHARED state (one daily rollup, one ordered window pass
    carrying the Bollinger frame AND the moving range, one scalar
    moment row) — detectors can't drift from their ops because the
    predicates are textually identical, and no float appears
    anywhere.
    """
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.to_date("l_shipdate").alias("d")).agg(
        F.count("*").cast("bigint").alias("x")
    )
    glob = daily.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("q"),
    )
    w = Window.orderBy("d")
    wb = w.rowsBetween(-19, -1)
    mr = daily.select(
        "d",
        "x",
        F.abs(F.col("x") - F.lag("x").over(w)).alias("mrv"),
        F.sum("x").over(wb).cast("bigint").alias("bs"),
        F.sum(F.col("x") * F.col("x")).over(wb).cast("bigint").alias("bq"),
        F.count("*").over(wb).cast("bigint").alias("bn"),
        F.row_number().over(w).cast("bigint").alias("rn"),
    )
    mrs = mr.agg(
        F.count("mrv").cast("bigint").alias("m"),
        F.sum("mrv").cast("bigint").alias("mm"),
    )
    j = mr.crossJoin(F.broadcast(glob)).crossJoin(F.broadcast(mrs))
    gdev = F.col("x") * F.col("n") - F.col("s")
    bdev = F.col("bn") * F.col("x") - F.col("bs")
    z_flag = gdev * gdev > 9 * (F.col("n") * F.col("q") - F.col("s") * F.col("s"))
    boll_flag = (F.col("rn") > 20) & (
        bdev * bdev > 4 * (F.col("bn") * F.col("bq") - F.col("bs") * F.col("bs"))
    )
    xmr_flag = F.abs(gdev) * F.col("m") * 1000 > 2660 * F.col("n") * F.col("mm")
    flags = j.select(
        "d",
        "x",
        z_flag.alias("z_flag"),
        boll_flag.alias("boll_flag"),
        xmr_flag.alias("xmr_flag"),
    )
    nf = (
        F.when(F.col("z_flag"), 1).otherwise(0)
        + F.when(F.col("boll_flag"), 1).otherwise(0)
        + F.when(F.col("xmr_flag"), 1).otherwise(0)
    )
    return (
        flags.withColumn("n_flags", nf.cast("bigint"))
        .filter(F.col("z_flag") | F.col("boll_flag") | F.col("xmr_flag"))
        .orderBy("d")
    )


LB_LAGS = 7


LB_CHI2_95_MILLI = 14067  # chi-square(7 df) 95th pct, milli-units


def _lb_lag_sql(k: int) -> str:
    """Per-lag centered Pearson autocorrelation of the residual
    series as a DuckDB scalar subquery (exact BIGINT moments)."""
    return f"""
        (SELECT round((n * sxy - sx * sy)
                      / (sqrt(n * sxx - sx * sx * 1.0)
                         * sqrt(n * syy - sy * sy * 1.0)), 6)
         FROM (SELECT CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(a.r) AS BIGINT) AS sx,
                      CAST(sum(b.r) AS BIGINT) AS sy,
                      CAST(sum(a.r * b.r) AS BIGINT) AS sxy,
                      CAST(sum(a.r * a.r) AS BIGINT) AS sxx,
                      CAST(sum(b.r * b.r) AS BIGINT) AS syy
               FROM resid a JOIN resid b ON b.rn = a.rn + {k}))
    """


@op(
    "ts_ljung_box_residuals",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS d, CAST(count(*) AS BIGINT) AS x
        FROM lineitem GROUP BY 1
    ), lagged AS (
        SELECT d, x - lag(x, 7) OVER (ORDER BY d) AS r
        FROM daily
    ), resid AS (
        SELECT r, CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn
        FROM lagged WHERE r IS NOT NULL
    ), rs AS (
        SELECT CAST((SELECT count(*) FROM resid) AS BIGINT) AS n,
               {", ".join(f"{_lb_lag_sql(k)} AS r{k}" for k in range(1, LB_LAGS + 1))}
    )
    SELECT n, r1, r2, r3, r4, r5, r6, r7,
           round(n * (n + 2.0)
                 * (((r1 * r1 / (n - 1.0) + r2 * r2 / (n - 2.0))
                     + (r3 * r3 / (n - 3.0) + r4 * r4 / (n - 4.0)))
                    + ((r5 * r5 / (n - 5.0) + r6 * r6 / (n - 6.0))
                       + r7 * r7 / (n - 7.0))), 9) AS q_stat,
           round(n * (n + 2.0)
                 * (((r1 * r1 / (n - 1.0) + r2 * r2 / (n - 2.0))
                     + (r3 * r3 / (n - 3.0) + r4 * r4 / (n - 4.0)))
                    + ((r5 * r5 / (n - 5.0) + r6 * r6 / (n - 6.0))
                       + r7 * r7 / (n - 7.0))), 9) * 1000
               < {LB_CHI2_95_MILLI} AS residuals_white
    FROM rs
    """,
    category=CAT,
)
def ts_ljung_box_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung–Box Q on the seasonal-naive forecast's residuals: are
    the leftovers WHITE NOISE, i.e. is there structure the lag-7
    model missed? — the diagnostic that closes the forecasting loop
    (ts_naive_interval_bands assumed exchangeable residuals to build
    its conformal band; Ljung–Box TESTS that assumption: Q above
    χ²₇(.95) means the residuals still carry autocorrelation, the
    band is too narrow, and a richer model is owed — the
    Box–Jenkins residual-checking step as a query).

    Per-lag autocorrelations are exact-BIGINT-moment Pearsons over
    rn/rn+k pair joins (the ts_acf_lags device on the RESIDUAL
    series), each rounded at 6 BEFORE entering Q; Q itself combines
    the seven rounded terms in one fixed parenthesization (the ANOVA
    pivot device — no float reduction), rounded at 9, and the
    whiteness verdict compares the ROUNDED Q against the χ²
    constant in milli-units so both engines branch identically.
    """
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.to_date("l_shipdate").alias("d")).agg(
        F.count("*").cast("bigint").alias("x")
    )
    w = Window.orderBy("d")
    lagged = daily.select(
        "d", (F.col("x") - F.lag("x", 7).over(w)).alias("r")
    ).filter(F.col("r").isNotNull())
    # r12 (guide §2.4): resid is referenced 15 times (the count + both
    # sides of 7 per-lag self-joins) — persist the tiny residual series
    # so the daily rollup + lag windows run once.
    resid = tracked_persist(
        lagged.select(
            "r",
            F.row_number().over(Window.orderBy("d")).cast("bigint").alias("rn"),
        )
    )
    n_row = resid.agg(F.count("*").cast("bigint").alias("n"))
    rs = n_row
    for k in range(1, LB_LAGS + 1):
        a, b = resid.alias("a"), resid.alias("b")
        mom = a.join(b, F.col("b.rn") == F.col("a.rn") + k).agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.col("a.r")).cast("bigint").alias("sx"),
            F.sum(F.col("b.r")).cast("bigint").alias("sy"),
            F.sum(F.col("a.r") * F.col("b.r")).cast("bigint").alias("sxy"),
            F.sum(F.col("a.r") * F.col("a.r")).cast("bigint").alias("sxx"),
            F.sum(F.col("b.r") * F.col("b.r")).cast("bigint").alias("syy"),
        )
        rk = mom.select(
            F.round(
                F.expr(
                    "(n * sxy - sx * sy)"
                    " / (sqrt(n * sxx - sx * sx * 1.0D)"
                    " * sqrt(n * syy - sy * sy * 1.0D))"
                ),
                6,
            ).alias(f"r{k}")
        )
        rs = rs.crossJoin(F.broadcast(rk))
    q_expr = (
        "n * (n + 2.0D)"
        " * (((r1 * r1 / (n - 1.0D) + r2 * r2 / (n - 2.0D))"
        " + (r3 * r3 / (n - 3.0D) + r4 * r4 / (n - 4.0D)))"
        " + ((r5 * r5 / (n - 5.0D) + r6 * r6 / (n - 6.0D))"
        " + r7 * r7 / (n - 7.0D)))"
    )
    return rs.select(
        "n",
        "r1",
        "r2",
        "r3",
        "r4",
        "r5",
        "r6",
        "r7",
        F.round(F.expr(q_expr), 9).alias("q_stat"),
        (F.round(F.expr(q_expr), 9) * 1000 < LB_CHI2_95_MILLI).alias(
            "residuals_white"
        ),
    )


VMR_OVER_MILLI = 1200  # overdispersed if VMR > 1.2


@op(
    "ts_overdispersion_index",
    oracle=f"""
    WITH daily AS (
        SELECT event_type AS et, CAST(ts AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    ), mom AS (
        SELECT et, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS s,
               CAST(sum(x * x) AS BIGINT) AS q
        FROM daily GROUP BY et
    )
    SELECT et, n, s, q,
           round((n * q - s * s) * 1.0 / ((n - 1.0) * s), 9) AS vmr,
           (n * q - s * s) * 1000 > {VMR_OVER_MILLI} * (n - 1) * s
               AS overdispersed
    FROM mom ORDER BY et
    """,
    category=CAT,
)
def ts_overdispersion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overdispersion index (variance-to-mean ratio, the Fano factor)
    of daily counts per event type, with an exact >1.2 flag — the
    Poisson-or-not decision every count model starts with (VMR ≈ 1:
    Poisson assumptions hold, intervals from √λ are honest; VMR ≫ 1:
    bursty/clustered arrivals — negative-binomial territory, and
    every Poisson-based alert threshold is too tight, firing on
    burstiness the model calls impossible; ts_anomaly_consensus's
    detectors all assume SOME dispersion model — this op says which
    one is defensible).

    VMR = (nQ − S²)/((n−1)·S) straight from three integer moments
    per type; the flag cross-multiplies in milli-units
    ((nQ−S²)·1000 > 1200·(n−1)·S — BIGINT-safe), so flag and
    displayed (round-9) ratio can never disagree. One daily rollup,
    one ≤|types| moment aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("et"), F.to_date("ts").alias("d")
    ).agg(F.count("*").cast("bigint").alias("x"))
    mom = daily.groupBy("et").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("q"),
    )
    num = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    return mom.select(
        "et",
        "n",
        "s",
        "q",
        F.round(
            num * 1.0 / ((F.col("n") - F.lit(1.0)) * F.col("s")), 9
        ).alias("vmr"),
        (num * 1000 > VMR_OVER_MILLI * (F.col("n") - 1) * F.col("s")).alias(
            "overdispersed"
        ),
    ).orderBy("et")


PEAK_HALF_WIN = 3


PEAK_MARGIN_MILLI = 1100  # peak must exceed neighborhood max by 10 %


@op(
    "ts_local_peaks_prominence",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS d, CAST(count(*) AS BIGINT) AS x
        FROM lineitem GROUP BY 1
    ), nb AS (
        SELECT d, x,
               CAST(greatest(
                   max(x) OVER (ORDER BY d ROWS BETWEEN {PEAK_HALF_WIN}
                                PRECEDING AND 1 PRECEDING),
                   max(x) OVER (ORDER BY d ROWS BETWEEN 1 FOLLOWING
                                AND {PEAK_HALF_WIN} FOLLOWING))
                   AS BIGINT) AS nbr_max,
               CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn,
               CAST(count(*) OVER () AS BIGINT) AS nd
        FROM daily
    )
    SELECT d, x, nbr_max,
           CAST((x * 1000000) // nbr_max AS BIGINT) AS prominence_ppm
    FROM nb
    WHERE rn > {PEAK_HALF_WIN} AND rn <= nd - {PEAK_HALF_WIN}
      AND x * 1000 > nbr_max * {PEAK_MARGIN_MILLI}
    ORDER BY d
    """,
    category=CAT,
)
def ts_local_peaks_prominence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local peak detection with a prominence margin: days strictly
    10 % above EVERYTHING within ±{PEAK_HALF_WIN} days — the
    scipy-find_peaks idiom as a window query (Bollinger asks
    'abnormal vs the rolling REGIME', XmR 'vs common-cause noise';
    a local peak asks the chart-reader's question — 'is this the
    top of its neighborhood' — which none of the band detectors
    answer: a day inside a high-variance band can still be the
    local summit a campaign post-mortem needs to anchor on).

    Neighborhood max is two one-sided frames (PRECEDING / FOLLOWING
    — one window pass each, current row excluded by construction);
    the margin is an exact milli-unit cross-multiplication
    (x·1000 > nbr_max·{PEAK_MARGIN_MILLI}); edge days without a
    full neighborhood are excluded by rank, not silently compared
    against a truncated window (the find_peaks boundary bug,
    stated). Prominence reported as integer ppm of the neighborhood
    max.
    """
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.to_date("l_shipdate").alias("d")).agg(
        F.count("*").cast("bigint").alias("x")
    )
    w = Window.orderBy("d")
    nbr_max = F.greatest(
        F.max("x").over(w.rowsBetween(-PEAK_HALF_WIN, -1)),
        F.max("x").over(w.rowsBetween(1, PEAK_HALF_WIN)),
    ).cast("bigint")
    nb = daily.select(
        "d",
        "x",
        nbr_max.alias("nbr_max"),
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.count("*").over(Window.partitionBy()).cast("bigint").alias("nd"),
    )
    return (
        nb.filter(
            (F.col("rn") > PEAK_HALF_WIN)
            & (F.col("rn") <= F.col("nd") - PEAK_HALF_WIN)
            & (F.col("x") * 1000 > F.col("nbr_max") * PEAK_MARGIN_MILLI)
        )
        .select(
            "d",
            "x",
            "nbr_max",
            F.expr("(x * 1000000) div nbr_max")
            .cast("bigint")
            .alias("prominence_ppm"),
        )
        .orderBy("d")
    )


@op(
    "ts_negbin_fit_mom",
    oracle="""
    WITH daily AS (
        SELECT event_type AS et, CAST(ts AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    ), mom AS (
        SELECT et, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS s,
               CAST(sum(x * x) AS BIGINT) AS q
        FROM daily GROUP BY et
    )
    SELECT et, n, s, q,
           CASE WHEN (n * q - s * s) * n > s * s * (n - 1)
                THEN round((s * s * (n - 1.0))
                           / ((n * q - s * s) * n - s * s * (n - 1.0)), 9)
                END AS r_hat,
           CASE WHEN (n * q - s * s) * n > s * s * (n - 1)
                THEN round(s * (n - 1.0) / ((n * q - s * s) * 1.0 * n / s), 9)
                END AS p_over_q_hint,
           (n * q - s * s) * n > s * s * (n - 1) AS nb_admissible
    FROM mom ORDER BY et
    """,
    category=CAT,
)
def ts_negbin_fit_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative-binomial method-of-moments fit per event type: r̂ =
    m²/(v−m) — the model ts_overdispersion_index's flag points at
    (the Fano gate DECIDES Poisson-vs-NB; this op FITS the NB when
    admissible, and the r̂ it lands is the dispersion parameter an
    alert threshold or capacity planner actually plugs in; r̂ → ∞
    recovers Poisson, small r̂ = heavy bursts). Admissibility
    (v > m) is tested EXACTLY by integer cross-multiplication —
    a type the gate called Poisson gets NULL fits, not garbage.

    With m = S/n and v = (nQ−S²)/(n(n−1)), r̂ expands to
    S²(n−1) / (n(nQ−S²) − S²(n−1)) — assembled from the same three
    BIGINT moments as the Fano op (deliberately: the two ops share
    state definitions so they can never disagree about m and v),
    with the single float division mirrored and rounded at 9.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("et"), F.to_date("ts").alias("d")
    ).agg(F.count("*").cast("bigint").alias("x"))
    mom = daily.groupBy("et").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("q"),
    )
    adm = (F.col("n") * F.col("q") - F.col("s") * F.col("s")) * F.col("n") > (
        F.col("s") * F.col("s") * (F.col("n") - 1)
    )
    return mom.select(
        "et",
        "n",
        "s",
        "q",
        F.when(
            adm,
            F.round(
                F.expr(
                    "(s * s * (n - 1.0D))"
                    " / ((n * q - s * s) * n - s * s * (n - 1.0D))"
                ),
                9,
            ),
        ).alias("r_hat"),
        F.when(
            adm,
            F.round(
                F.expr("s * (n - 1.0D) / ((n * q - s * s) * 1.0D * n / s)"), 9
            ),
        ).alias("p_over_q_hint"),
        adm.alias("nb_admissible"),
    ).orderBy("et")


@op(
    "ts_spike_type_attribution",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS d, l_returnflag AS rf,
               CAST(count(*) AS BIGINT) AS c
        FROM lineitem GROUP BY 1, 2
    ), tot AS (
        SELECT d, CAST(sum(c) AS BIGINT) AS x FROM daily GROUP BY d
    ), stats AS (
        SELECT d, x,
               CAST(sum(x) OVER w AS BIGINT) AS s,
               CAST(sum(x * x) OVER w AS BIGINT) AS q,
               CAST(count(*) OVER w AS BIGINT) AS n,
               CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn
        FROM tot
        WINDOW w AS (ORDER BY d ROWS BETWEEN 19 PRECEDING AND 1 PRECEDING)
    ), spikes AS (
        SELECT d, x, s AS base_total FROM stats
        WHERE rn > 20 AND n * x - s > 0
          AND (n * x - s) * (n * x - s) > 4 * (n * q - s * s)
    ), base_mix AS (
        SELECT sp.d, dy.rf, CAST(sum(dy.c) AS BIGINT) AS base_c
        FROM spikes sp
        JOIN daily dy ON dy.d > sp.d - 21 AND dy.d < sp.d
        GROUP BY 1, 2
    )
    SELECT sp.d, dy.rf,
           dy.c AS day_c, sp.x AS day_total,
           bm.base_c, sp.base_total,
           CAST((dy.c * 1000000) // sp.x
                - (bm.base_c * 1000000) // sp.base_total AS BIGINT)
               AS mix_shift_ppm
    FROM spikes sp
    JOIN daily dy ON dy.d = sp.d
    JOIN base_mix bm ON bm.d = sp.d AND bm.rf = dy.rf
    ORDER BY sp.d, dy.rf
    """,
    category=CAT,
)
def ts_spike_type_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spike attribution: on every Bollinger-upper spike day, each
    return-flag category's share of the spike vs its share of the
    trailing 20-day baseline (mix shift in signed ppm) — the
    incident-triage question AFTER the alert fires ('volume spiked —
    was it returns?'): a spike with zero mix shift is more-of-the-
    same (demand), a spike with mass migrating into 'R' is a
    returns incident — same alert, opposite on-call (the event
    study asked WHEN spikes resolve; this asks WHAT they're made
    of, and both recompute the flag predicate inline so alert and
    attribution can't drift).

    The baseline mix reuses the SAME 20-day window as the band
    (dy.d ∈ (spike−21, spike) — a date-range join of the dim-sized
    spike set against the per-category daily rollup); both shares
    are integer ppm against their own totals, so the shift is an
    exact BIGINT difference.
    """
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        F.to_date("l_shipdate").alias("d"), F.col("l_returnflag").alias("rf")
    ).agg(F.count("*").cast("bigint").alias("c"))
    tot = daily.groupBy("d").agg(F.sum("c").cast("bigint").alias("x"))
    w = Window.orderBy("d")
    env = w.rowsBetween(-19, -1)
    stats = tot.select(
        "d",
        "x",
        F.sum("x").over(env).alias("s"),
        F.sum(F.col("x") * F.col("x")).over(env).alias("q"),
        F.count("*").over(env).alias("n"),
        F.row_number().over(w).alias("rn"),
    )
    dev = F.col("n") * F.col("x") - F.col("s")
    spikes = stats.filter(
        (F.col("rn") > 20)
        & (dev > 0)
        & (dev * dev > 4 * (F.col("n") * F.col("q") - F.col("s") * F.col("s")))
    ).select("d", "x", F.col("s").alias("base_total"))
    sp = spikes.alias("sp")
    dy = daily.alias("dy")
    base_mix = (
        sp.join(
            dy,
            (F.col("dy.d") > F.date_sub(F.col("sp.d"), 21))
            & (F.col("dy.d") < F.col("sp.d")),
        )
        .groupBy(F.col("sp.d").alias("d"), F.col("dy.rf").alias("rf"))
        .agg(F.sum(F.col("dy.c")).cast("bigint").alias("base_c"))
    )
    day_rows = sp.join(dy, F.col("dy.d") == F.col("sp.d")).select(
        F.col("sp.d").alias("d"),
        F.col("dy.rf").alias("rf"),
        F.col("dy.c").alias("day_c"),
        F.col("sp.x").alias("day_total"),
        F.col("sp.base_total").alias("base_total"),
    )
    return (
        day_rows.join(base_mix, ["d", "rf"])
        .select(
            "d",
            "rf",
            "day_c",
            "day_total",
            "base_c",
            "base_total",
            (
                F.expr("(day_c * 1000000) div day_total")
                - F.expr("(base_c * 1000000) div base_total")
            )
            .cast("bigint")
            .alias("mix_shift_ppm"),
        )
        .orderBy("d", "rf")
    )


ITS_CUTOFF = "2000-01-01"


@op(
    "ts_interrupted_series",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(sum(round(o_totalprice)) AS BIGINT) AS rev_d
        FROM orders GROUP BY 1
    ), idx AS (
        SELECT date_diff('day', DATE '{ITS_CUTOFF}', d) AS t, rev_d,
               date_diff('day', DATE '{ITS_CUTOFF}', d) >= 0 AS post
        FROM daily
    ), seg AS (
        SELECT post,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(t) AS BIGINT) AS st,
               CAST(sum(rev_d) AS BIGINT) AS sy,
               CAST(sum(t * rev_d) AS BIGINT) AS sty,
               CAST(sum(t * t) AS BIGINT) AS stt
        FROM idx GROUP BY post
    ), piv AS (
        SELECT
          max(CASE WHEN NOT post THEN n END) AS n0,
          max(CASE WHEN NOT post THEN st END) AS st0,
          max(CASE WHEN NOT post THEN sy END) AS sy0,
          max(CASE WHEN NOT post THEN sty END) AS sty0,
          max(CASE WHEN NOT post THEN stt END) AS stt0,
          max(CASE WHEN post THEN n END) AS n1,
          max(CASE WHEN post THEN st END) AS st1,
          max(CASE WHEN post THEN sy END) AS sy1,
          max(CASE WHEN post THEN sty END) AS sty1,
          max(CASE WHEN post THEN stt END) AS stt1
        FROM seg
    )
    SELECT n0, n1,
           round((n0 * sty0 - st0 * 1.0 * sy0)
                 / (n0 * stt0 - st0 * 1.0 * st0), 6) AS slope_pre,
           round((n1 * sty1 - st1 * 1.0 * sy1)
                 / (n1 * stt1 - st1 * 1.0 * st1), 6) AS slope_post,
           round((sy1 * 1.0 / n1
                  - (n1 * sty1 - st1 * 1.0 * sy1)
                    / (n1 * stt1 - st1 * 1.0 * st1) * (st1 * 1.0 / n1))
                 - (sy0 * 1.0 / n0
                    - (n0 * sty0 - st0 * 1.0 * sy0)
                      / (n0 * stt0 - st0 * 1.0 * st0) * (st0 * 1.0 / n0)),
                 6) AS level_jump_at_cutoff
    FROM piv
    """,
    category=CAT,
)
def ts_interrupted_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interrupted time series at {ITS_CUTOFF}: separate OLS fits on
    each side of the cutoff — slope before, slope after, and the
    LEVEL JUMP where both intercepts meet the cutoff — the
    within-series causal design for when no control group exists
    (agg_did_estimate needs a comparison population; a policy that
    hit EVERYONE at a known date leaves only the series' own
    trajectory, and segmented regression is the standard ITS
    analysis; a level jump with unchanged slopes is a step effect,
    a slope change with no jump is a ramp — the decomposition IS
    the reading).

    Time is centered at the cutoff (t = days since), so each
    segment's intercept-at-cutoff is ȳ − β·t̄ directly. Both fits
    come from ONE pivoted row of ten BIGINT moments (ANOVA device);
    slope and jump expressions are mirrored token-for-token with
    the 1.0 promotions placed to keep integer products in moment
    scale, rounded at 6 — NOT 9: the jump is a ~10⁵-dollar value
    and a fixed decimal rounding only absorbs last-ulp noise when
    magnitude × 10⁻ᵈ dwarfs it (gate-caught at sf0.1; round
    behaves like significant figures only for |x| ≈ 1). Dollars per
    the overflow rule.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round("o_totalprice")).cast("bigint").alias("rev_d")
    )
    idx = daily.select(
        F.datediff(F.col("d"), F.lit(ITS_CUTOFF).cast("date")).alias("t"),
        "rev_d",
    ).withColumn("post", F.col("t") >= 0)
    seg = idx.groupBy("post").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("t").cast("bigint").alias("st"),
        F.sum("rev_d").cast("bigint").alias("sy"),
        F.sum(F.col("t") * F.col("rev_d")).cast("bigint").alias("sty"),
        F.sum(F.col("t") * F.col("t")).cast("bigint").alias("stt"),
    )
    aggs = []
    for flag, sfx in ((False, "0"), (True, "1")):
        for c in ("n", "st", "sy", "sty", "stt"):
            aggs.append(
                F.max(F.when(F.col("post") == flag, F.col(c))).alias(
                    f"{c}{sfx}"
                )
            )
    piv = seg.agg(*aggs)
    slope0 = "(n0 * sty0 - st0 * 1.0D * sy0) / (n0 * stt0 - st0 * 1.0D * st0)"
    slope1 = "(n1 * sty1 - st1 * 1.0D * sy1) / (n1 * stt1 - st1 * 1.0D * st1)"
    return piv.select(
        "n0",
        "n1",
        F.round(F.expr(slope0), 6).alias("slope_pre"),
        F.round(F.expr(slope1), 6).alias("slope_post"),
        F.round(
            F.expr(
                f"(sy1 * 1.0D / n1 - ({slope1}) * (st1 * 1.0D / n1))"
                f" - (sy0 * 1.0D / n0 - ({slope0}) * (st0 * 1.0D / n0))"
            ),
            6,
        ).alias("level_jump_at_cutoff"),
    )


FC_EVAL_DAYS = 100


@op(
    "ts_forecast_combination",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS d, CAST(count(*) AS BIGINT) AS x
        FROM lineitem GROUP BY 1
    ), fc AS (
        SELECT d, x,
               lag(x, 7) OVER w AS naive7,
               CAST(sum(x) OVER (ORDER BY d ROWS BETWEEN 7 PRECEDING
                                 AND 1 PRECEDING) AS BIGINT) AS ma_sum,
               CAST(count(*) OVER (ORDER BY d ROWS BETWEEN 7 PRECEDING
                                   AND 1 PRECEDING) AS BIGINT) AS ma_n,
               CAST(row_number() OVER w AS BIGINT) AS rn,
               CAST(count(*) OVER () AS BIGINT) AS nd
        FROM daily WINDOW w AS (ORDER BY d)
    ), eval_rows AS (
        -- doubled/scaled errors keep everything integer: e_na2 uses
        -- 14x (naive at weight 14/14), e_ma2 14x/ma_n-scaled, combo
        -- = (7*naive + ma_sum/ma_n * 7) => x - combo scaled by 14*ma_n
        SELECT abs(14 * ma_n * x - 14 * ma_n * naive7) AS e_na_s,
               abs(14 * ma_n * x - 14 * ma_sum) AS e_ma_s,
               abs(14 * ma_n * x - (7 * ma_n * naive7 + 7 * ma_sum))
                   AS e_co_s,
               ma_n
        FROM fc
        WHERE naive7 IS NOT NULL AND ma_n = 7 AND rn > nd - {FC_EVAL_DAYS}
    )
    SELECT CAST(count(*) AS BIGINT) AS n_eval,
           CAST(sum(e_na_s) AS BIGINT) AS sae_naive_s,
           CAST(sum(e_ma_s) AS BIGINT) AS sae_ma_s,
           CAST(sum(e_co_s) AS BIGINT) AS sae_combo_s,
           sum(e_co_s) < sum(e_na_s) AND sum(e_co_s) < sum(e_ma_s)
               AS combo_wins
    FROM eval_rows
    """,
    category=CAT,
)
def ts_forecast_combination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast combination test: seasonal-naive (lag-7) vs 7-day
    moving average vs their 50/50 blend, scored by summed absolute
    error over the last {FC_EVAL_DAYS} days — the M-competition
    finding as a query (the simple average of two mediocre
    forecasts routinely beats both components because their errors
    anticorrelate; `combo_wins` is that claim TESTED on this series
    rather than recited, and when it's false here that's equally a
    finding — combination only pays when the components genuinely
    disagree).

    Every error is kept integer by scaling: with the common factor
    14·ma_n, naive/MA/combo errors become |14n·x − 14n·ŷ| without a
    single division (the MA's /n and the blend's /2 both clear),
    so the three SAE columns are exact BIGINTs and the winner flag
    is an integer comparison. Window pass shared by both
    forecasters; eval restricted to full-history rows by rank.
    """
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.to_date("l_shipdate").alias("d")).agg(
        F.count("*").cast("bigint").alias("x")
    )
    w = Window.orderBy("d")
    ma_f = w.rowsBetween(-7, -1)
    fc = daily.select(
        "d",
        "x",
        F.lag("x", 7).over(w).alias("naive7"),
        F.sum("x").over(ma_f).cast("bigint").alias("ma_sum"),
        F.count("*").over(ma_f).cast("bigint").alias("ma_n"),
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.count("*").over(Window.partitionBy()).cast("bigint").alias("nd"),
    )
    ev = fc.filter(
        F.col("naive7").isNotNull()
        & (F.col("ma_n") == 7)
        & (F.col("rn") > F.col("nd") - FC_EVAL_DAYS)
    ).select(
        F.abs(14 * F.col("ma_n") * F.col("x") - 14 * F.col("ma_n") * F.col("naive7")).alias("e_na_s"),
        F.abs(14 * F.col("ma_n") * F.col("x") - 14 * F.col("ma_sum")).alias("e_ma_s"),
        F.abs(
            14 * F.col("ma_n") * F.col("x")
            - (7 * F.col("ma_n") * F.col("naive7") + 7 * F.col("ma_sum"))
        ).alias("e_co_s"),
    )
    return ev.agg(
        F.count("*").cast("bigint").alias("n_eval"),
        F.sum("e_na_s").cast("bigint").alias("sae_naive_s"),
        F.sum("e_ma_s").cast("bigint").alias("sae_ma_s"),
        F.sum("e_co_s").cast("bigint").alias("sae_combo_s"),
        (
            (F.sum("e_co_s") < F.sum("e_na_s"))
            & (F.sum("e_co_s") < F.sum("e_ma_s"))
        ).alias("combo_wins"),
    )


@op(
    "ts_mann_kendall",
    oracle="""
    WITH daily AS (
        SELECT event_type AS et, CAST(ts AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    ), pairs AS (
        SELECT a.et,
               CASE WHEN b.x > a.x THEN 1
                    WHEN b.x < a.x THEN -1 ELSE 0 END AS sgn
        FROM daily a JOIN daily b ON b.et = a.et AND b.d > a.d
    ), s_stat AS (
        SELECT et, CAST(sum(sgn) AS BIGINT) AS s FROM pairs GROUP BY et
    ), nn AS (
        SELECT et, CAST(count(*) AS BIGINT) AS n FROM daily GROUP BY et
    ), ties AS (
        SELECT et, CAST(sum(tc * (tc - 1) * (2 * tc + 5)) AS BIGINT) AS tsum
        FROM (SELECT et, x, CAST(count(*) AS BIGINT) AS tc
              FROM daily GROUP BY et, x) g
        GROUP BY et
    )
    SELECT s.et, n.n, s.s,
           CAST((n.n * (n.n - 1) * (2 * n.n + 5) - t.tsum) AS BIGINT)
               AS var18,
           round((CASE WHEN s.s > 0 THEN s.s - 1
                       WHEN s.s < 0 THEN s.s + 1 ELSE 0 END)
                 / sqrt((n.n * (n.n - 1) * (2 * n.n + 5) - t.tsum)
                        / 18.0), 9) AS z,
           abs(round((CASE WHEN s.s > 0 THEN s.s - 1
                           WHEN s.s < 0 THEN s.s + 1 ELSE 0 END)
                     / sqrt((n.n * (n.n - 1) * (2 * n.n + 5) - t.tsum)
                            / 18.0), 9)) >= 1.96 AS trend_significant
    FROM s_stat s JOIN nn n ON n.et = s.et JOIN ties t ON t.et = s.et
    ORDER BY s.et
    """,
    category=CAT,
)
def ts_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend test per event type: S = Σ sign(xⱼ−xᵢ) over
    all day pairs, tie-corrected variance, continuity-corrected z —
    the SIGNIFICANCE half of the robust-trend pair (ts_theil_sen_
    trend estimates the slope; Mann–Kendall says whether a monotone
    trend exists AT ALL, distribution-free — the two are published
    together in every environmental/SRE trend report because a
    slope without a significance statement is a chart, not a
    finding).

    S and the tie term Σt(t−1)(2t+5) are pure integers (the sign
    join is O(days²) on the per-type DAILY aggregate — the Theil–Sen
    shape); var·18 is kept integer and the /18 deferred into the one
    mirrored sqrt expression; the continuity correction (S∓1) is
    integer CASE; verdict compares the ROUNDED z. No float exists
    before the final expression.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("et"), F.to_date("ts").alias("d")
    ).agg(F.count("*").cast("bigint").alias("x"))
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        b, (F.col("b.et") == F.col("a.et")) & (F.col("b.d") > F.col("a.d"))
    ).select(
        F.col("a.et").alias("et"),
        F.when(F.col("b.x") > F.col("a.x"), 1)
        .when(F.col("b.x") < F.col("a.x"), -1)
        .otherwise(0)
        .alias("sgn"),
    )
    s_stat = pairs.groupBy("et").agg(F.sum("sgn").cast("bigint").alias("s"))
    nn = daily.groupBy("et").agg(F.count("*").cast("bigint").alias("n"))
    ties = (
        daily.groupBy("et", "x")
        .agg(F.count("*").cast("bigint").alias("tc"))
        .groupBy("et")
        .agg(
            F.sum(
                F.col("tc") * (F.col("tc") - 1) * (2 * F.col("tc") + 5)
            )
            .cast("bigint")
            .alias("tsum")
        )
    )
    j = s_stat.join(nn, "et").join(ties, "et")
    var18 = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tsum")
    ).cast("bigint")
    s_corr = (
        F.when(F.col("s") > 0, F.col("s") - 1)
        .when(F.col("s") < 0, F.col("s") + 1)
        .otherwise(0)
    )
    z = F.round(s_corr / F.sqrt(var18 / 18.0), 9)
    return j.select(
        "et",
        "n",
        "s",
        var18.alias("var18"),
        z.alias("z"),
        (F.abs(z) >= 1.96).alias("trend_significant"),
    ).orderBy("et")


VAR_PCT = 5  # 5th percentile = 95% historical VaR


@op(
    "ts_historical_var",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS d,
               CAST(sum(round(l_extendedprice)) AS BIGINT) AS rev_d
        FROM lineitem GROUP BY 1
    ), deltas AS (
        SELECT d, rev_d - lag(rev_d) OVER (ORDER BY d) AS dd
        FROM daily
    ), rd AS (
        SELECT dd, CAST(row_number() OVER (ORDER BY dd) AS BIGINT) AS rk,
               CAST(count(*) OVER () AS BIGINT) AS n
        FROM deltas WHERE dd IS NOT NULL
    ), var_c AS (
        SELECT CAST(max(CASE WHEN rk = (n * {VAR_PCT} + 99) // 100
                             THEN dd END) AS BIGINT) AS var_d,
               CAST(max(n) AS BIGINT) AS n
        FROM rd
    )
    SELECT v.n AS n_deltas, v.var_d,
           CAST((SELECT count(*) FROM rd WHERE rd.dd < v.var_d) AS BIGINT)
               AS n_breaches,
           CAST(((SELECT count(*) FROM rd WHERE rd.dd < v.var_d) * 1000000)
                // v.n AS BIGINT) AS breach_ppm
    FROM var_c v
    """,
    category=CAT,
)
def ts_historical_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historical Value-at-Risk on daily revenue CHANGES: the exact
    empirical {VAR_PCT}th-percentile daily move plus the count of
    days that breached it — risk management's plainest instrument
    applied to the business series (VaR answers 'how bad is a
    normal-bad day'; the BREACH COUNT is its own backtest — the
    Kupiec idea: a 5 % VaR breached on ~5 % of days is calibrated,
    breached on 12 % means the tail is fatter than the history
    window, and ts_underwater_duration measures the resulting
    drawdowns while this prices the daily shock itself).

    The quantile is EXACT ordered selection over integer deltas
    (⌈p·n/100⌉ rank — the conformal-bands device, no
    interpolation); breaches are strict integer comparisons against
    that selected integer, so statistic and backtest can never
    disagree. Day-scale everything after the rollup.
    """
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.to_date("l_shipdate").alias("d")).agg(
        F.sum(F.round("l_extendedprice")).cast("bigint").alias("rev_d")
    )
    w = Window.orderBy("d")
    deltas = daily.select(
        (F.col("rev_d") - F.lag("rev_d").over(w)).alias("dd")
    ).filter(F.col("dd").isNotNull())
    rd = deltas.select(
        "dd",
        F.row_number().over(Window.orderBy("dd")).cast("bigint").alias("rk"),
        F.count("*").over(Window.partitionBy()).cast("bigint").alias("n"),
    )
    var_c = rd.agg(
        F.max(
            F.when(
                F.col("rk") == F.expr(f"(n * {VAR_PCT} + 99) div 100"),
                F.col("dd"),
            )
        )
        .cast("bigint")
        .alias("var_d"),
        F.max("n").cast("bigint").alias("n"),
    )
    breaches = (
        rd.crossJoin(F.broadcast(var_c.select("var_d")))
        .filter(F.col("dd") < F.col("var_d"))
        .agg(F.count("*").cast("bigint").alias("nb"))
    )
    return (
        var_c.crossJoin(F.broadcast(breaches))
        .select(
            F.col("n").alias("n_deltas"),
            "var_d",
            F.col("nb").alias("n_breaches"),
            F.expr("(nb * 1000000) div n").cast("bigint").alias("breach_ppm"),
        )
    )


@op(
    "ts_record_days_rate",
    oracle="""
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS d, CAST(count(*) AS BIGINT) AS x
        FROM lineitem GROUP BY 1
    ), runs AS (
        SELECT d, x,
               CAST(max(x) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS BIGINT) AS prior_max,
               CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS k
        FROM daily
    ), obs AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN prior_max IS NULL OR x > prior_max
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_records,
               CAST(sum(1000000 // k) AS BIGINT) AS harmonic_micro
        FROM runs
    )
    SELECT n, n_records,
           CAST(harmonic_micro // 1000000 AS BIGINT)
               AS expected_records_floor,
           harmonic_micro,
           CAST((n_records * 1000000000000) // harmonic_micro AS BIGINT)
               AS obs_over_expected_ppm
    FROM obs
    """,
    category=CAT,
)
def ts_record_days_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-breaking days vs theory: the count of all-time-high
    volume days against the i.i.d. expectation H(n) = Σ1/k (record
    statistics: under exchangeability, day k sets a record with
    probability exactly 1/k, so ~8 records are expected in 2 500
    days NO MATTER the distribution) — the distribution-free trend
    detector hiding in a trivia fact: observed ≫ H(n) is growth,
    ≈ H(n) is stationarity, and the ratio needs no variance
    estimate, no model, no parameter (Mann–Kendall uses all pairs;
    this uses only the maxima chain — far blunter, but explainable
    to anyone in one sentence, which has its own operational value).

    Records come off one running-max window (current row excluded —
    a day isn't its own prior record); the harmonic expectation is
    Σ(10⁶ div k) — the quantized-series device making the float
    series an exact integer sum (per-term truncation < n µ-units,
    stated); the observed/expected ratio is one BIGINT division.
    """
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.to_date("l_shipdate").alias("d")).agg(
        F.count("*").cast("bigint").alias("x")
    )
    w = Window.orderBy("d")
    runs = daily.select(
        "d",
        "x",
        F.max("x")
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
        .cast("bigint")
        .alias("prior_max"),
        F.row_number().over(w).cast("bigint").alias("k"),
    )
    obs = runs.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(
            F.when(
                F.col("prior_max").isNull()
                | (F.col("x") > F.col("prior_max")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_records"),
        F.sum(F.expr("1000000 div k")).cast("bigint").alias("harmonic_micro"),
    )
    return obs.select(
        "n",
        "n_records",
        F.expr("harmonic_micro div 1000000")
        .cast("bigint")
        .alias("expected_records_floor"),
        "harmonic_micro",
        F.expr("(n_records * 1000000000000) div harmonic_micro")
        .cast("bigint")
        .alias("obs_over_expected_ppm"),
    )


@op(
    "ts_max_gain_window",
    oracle="""
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS d,
               CAST(sum(round(l_extendedprice)) AS BIGINT) AS rev_d
        FROM lineitem GROUP BY 1
    ), pre AS (
        SELECT d, rev_d,
               CAST(sum(rev_d) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum
        FROM daily
    ), anchored AS (
        SELECT d, cum,
               CAST(coalesce(min(cum) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS min_before
        FROM pre
    )
    SELECT d AS run_end, CAST(cum - min_before AS BIGINT) AS max_run_d
    FROM anchored
    ORDER BY cum - min_before DESC, d
    LIMIT 1
    """,
    category=CAT,
)
def ts_max_gain_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-sum contiguous run of daily revenue (Kadane's problem)
    — the best consecutive stretch the business ever had, found
    WITHOUT Kadane's sequential loop: max subarray ending at j is
    prefix[j] − min(prefix[<j]), so the textbook O(n) scan becomes
    one running-sum window plus one running-min window and an
    argmax — the general lesson this op exists to teach (a large
    class of 'inherently sequential' DP recurrences are prefix
    reductions in disguise and therefore window-parallelizable;
    agg_atp_allocation made the same move for greedy allocation,
    win_max_drawdown is this op's mirror image on losses).

    All integer (dollar sums, prefix sums, the min-before frame
    excludes the current row so a single-day run is measured
    against the zero prefix); the argmax is a total (value, date)
    order with LIMIT 1. Day-scale after the rollup.
    """
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.to_date("l_shipdate").alias("d")).agg(
        F.sum(F.round("l_extendedprice")).cast("bigint").alias("rev_d")
    )
    w = Window.orderBy("d")
    pre = daily.select(
        "d",
        F.sum("rev_d")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("cum"),
    )
    anchored = pre.select(
        "d",
        "cum",
        F.coalesce(
            F.min("cum").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        .cast("bigint")
        .alias("min_before"),
    )
    return (
        anchored.select(
            F.col("d").alias("run_end"),
            (F.col("cum") - F.col("min_before")).cast("bigint").alias(
                "max_run_d"
            ),
        )
        .orderBy(F.desc("max_run_d"), "run_end")
        .limit(1)
    )


AR1_LOG_SCALE = 1000000


@op(
    "ts_ar1_persistence",
    oracle=f"""
    WITH daily AS (
        SELECT event_type AS et, CAST(ts AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    ), lagged AS (
        SELECT et, x AS y,
               lag(x) OVER (PARTITION BY et ORDER BY d) AS xp
        FROM daily
    ), mom AS (
        SELECT et, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(xp) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(xp * y) AS BIGINT) AS sxy,
               CAST(sum(xp * xp) AS BIGINT) AS sxx
        FROM lagged WHERE xp IS NOT NULL GROUP BY et
    )
    SELECT et, n,
           round((n * sxy - sx * 1.0 * sy)
                 / (n * sxx - sx * 1.0 * sx), 6) AS phi,
           CASE WHEN (n * sxy - sx * 1.0 * sy)
                     / (n * sxx - sx * 1.0 * sx) > 0
                 AND (n * sxy - sx * 1.0 * sy)
                     / (n * sxx - sx * 1.0 * sx) < 1
                THEN CAST(round(-693147.0
                     / round(ln((n * sxy - sx * 1.0 * sy)
                                / (n * sxx - sx * 1.0 * sx))
                             * {AR1_LOG_SCALE}) * {AR1_LOG_SCALE})
                     AS BIGINT)
                END AS shock_halflife_microdays
    FROM mom ORDER BY et
    """,
    category=CAT,
)
def ts_ar1_persistence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(1) persistence per event type: φ from the lag-1 OLS (the
    agg_regression moments on (xₜ₋₁, xₜ)) plus the SHOCK HALF-LIFE
    ln2/(−ln φ) in micro-days — the one number that says how long a
    perturbation lingers (φ≈0: tomorrow forgets today, alert on
    levels; φ→1: shocks compound toward a random walk, alert on
    CHANGES — the ACF op shows the whole correlogram, φ compresses
    its first lag into the operating decision, and the half-life
    is the same fact in units an on-call understands).

    φ comes from five BIGINT moments with one mirrored round-6
    division (slope of a regression is scale-free, so round-6 is
    magnitude-safe here); the half-life quantizes ln φ to integer
    micro-nats FIRST (the KL device) and divides the exact
    −ln 2·10⁶ constant by it — so the published half-life is a pure
    integer computation on a quantized input, and φ outside (0,1)
    yields NULL (no stationary half-life) rather than nonsense.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("et"), F.to_date("ts").alias("d")
    ).agg(F.count("*").cast("bigint").alias("x"))
    w = Window.partitionBy("et").orderBy("d")
    lagged = daily.select(
        "et", F.col("x").alias("y"), F.lag("x").over(w).alias("xp")
    ).filter(F.col("xp").isNotNull())
    mom = lagged.groupBy("et").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("xp").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("xp") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("xp") * F.col("xp")).cast("bigint").alias("sxx"),
    )
    phi_expr = "(n * sxy - sx * 1.0D * sy) / (n * sxx - sx * 1.0D * sx)"
    return mom.select(
        "et",
        "n",
        F.round(F.expr(phi_expr), 6).alias("phi"),
        F.when(
            (F.expr(phi_expr) > 0) & (F.expr(phi_expr) < 1),
            F.round(
                F.lit(-693147.0)
                / F.round(
                    F.log(F.expr(phi_expr)) * AR1_LOG_SCALE
                )
                * AR1_LOG_SCALE
            ).cast("bigint"),
        ).alias("shock_halflife_microdays"),
    ).orderBy("et")


SPECENT_SCALE = 10**9


# ln(len(PGRAM_PERIODS)) as an exact shared double literal: libm ln can
# differ in the last ulp across engines, so NEITHER engine computes it
import math as _math


SPECENT_LN_K = repr(_math.log(len(PGRAM_PERIODS)))


@op(
    "ts_spectral_entropy",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS dd, CAST(count(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY 1
    ), idx AS (
        SELECT date_diff('day', (SELECT min(dd) FROM daily), dd) AS d, cnt
        FROM daily
    ), per AS (SELECT unnest({list(PGRAM_PERIODS)}) AS p), terms AS (
        SELECT p, cnt,
            CAST(round(cos(2 * pi() * (d % p) / p) * {PGRAM_SCALE})
                 AS BIGINT) AS c,
            CAST(round(sin(2 * pi() * (d % p) / p) * {PGRAM_SCALE})
                 AS BIGINT) AS s
        FROM idx CROSS JOIN per
    ), pw AS (
        SELECT p, CAST(sum(cnt * c) AS BIGINT) AS sc,
               CAST(sum(cnt * s) AS BIGINT) AS ss
        FROM terms GROUP BY p
    ), pows AS (
        SELECT p, CAST(sc * sc + ss * ss AS BIGINT) AS power FROM pw
    ), tot AS (SELECT CAST(sum(power) AS BIGINT) AS tp,
                      CAST(count(*) AS BIGINT) AS k FROM pows),
    hent AS (
        SELECT CAST(sum(CASE WHEN power > 0 THEN
                 CAST(floor(-(power / (1.0 * t.tp))
                      * ln(power / (1.0 * t.tp))
                      * {SPECENT_SCALE} + 0.5) AS BIGINT)
               ELSE 0 END) AS BIGINT) AS hq,
               max(t.tp) AS tp, max(t.k) AS k
        FROM pows CROSS JOIN tot t)
    SELECT k, tp AS total_power, hq,
           round(CAST(hq AS DOUBLE) / 1e9 / {SPECENT_LN_K}, 9)
               AS spectral_entropy_norm
    FROM hent
    """,
    category=CAT,
)
def ts_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized spectral entropy of the daily-volume periodogram —
    the one-number 'how periodic is this series' dial (0 = all power
    in one cycle, 1 = white-noise-flat spectrum) that decides whether
    seasonal models are worth fitting at all; ts_periodogram_quantized
    ranks WHICH period wins, this measures whether the win means
    anything. The corpus reads ~0.69 at sf0.01 vs ~0.92 at sf0.1 —
    more data flattens the candidate spectrum, itself the finding.

    Determinism inherits the periodogram's quantized-trig projection
    (exact BIGINT powers), then each period's −p·ln p entropy term is
    per-row nano-quantized before the 5-row sum; the ln(k) normalizer
    is a SHARED double literal baked into both engines (neither calls
    ln(5) at runtime — last-ulp libm divergence on constants is real).
    Driver-object size: 5 rows; one daily rollup scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.to_date("l_shipdate").alias("dd")).agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    d0 = daily.agg(F.min("dd").alias("d0"))
    idx = daily.crossJoin(F.broadcast(d0)).select(
        F.datediff(F.col("dd"), F.col("d0")).alias("d"), "cnt"
    )
    per = spark.createDataFrame([(p,) for p in PGRAM_PERIODS], "p int")
    ang = 2 * F.expr("pi()") * (F.col("d") % F.col("p")) / F.col("p")
    terms = idx.crossJoin(F.broadcast(per)).select(
        "p",
        "cnt",
        F.round(F.cos(ang) * PGRAM_SCALE).cast("bigint").alias("c"),
        F.round(F.sin(ang) * PGRAM_SCALE).cast("bigint").alias("s"),
    )
    pows = (
        terms.groupBy("p")
        .agg(
            F.sum(F.col("cnt") * F.col("c")).cast("bigint").alias("sc"),
            F.sum(F.col("cnt") * F.col("s")).cast("bigint").alias("ss"),
        )
        .select(
            "p",
            (F.col("sc") * F.col("sc") + F.col("ss") * F.col("ss"))
            .cast("bigint")
            .alias("power"),
        )
    )
    tot = pows.agg(
        F.sum("power").cast("bigint").alias("tp"),
        F.count("*").cast("bigint").alias("k"),
    )
    ratio = F.col("power") / (1.0 * F.col("tp"))
    term_q = F.when(
        F.col("power") > 0,
        F.floor(-ratio * F.log(ratio) * SPECENT_SCALE + 0.5).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    hent = (
        pows.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(term_q).cast("bigint").alias("hq"),
            F.max("tp").alias("tp"),
            F.max("k").alias("k"),
        )
    )
    return hent.select(
        "k",
        F.col("tp").alias("total_power"),
        "hq",
        F.round(
            F.col("hq").cast("double") / 1e9 / float(SPECENT_LN_K), 9
        ).alias("spectral_entropy_norm"),
    )
