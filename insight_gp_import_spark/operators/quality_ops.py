"""Data-quality + CDC operators: the validation/merge layer of a
warehouse load pipeline.

A loader that ships data into a warehouse needs (a) column profiling
(null/distinct/min/max) to catch drift, (b) referential-integrity
checks between fact and dimension tables, and (c) changelog
application (insert/update/delete merge) for incremental feeds.
Each is expressed as one declarative Spark plan with a DuckDB twin.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from insight_gp_import_spark.registry import op
from insight_gp_import_spark.tables import load_table

CAT = "quality"

# (column, kind) pairs profiled on orders; numeric min/max are rounded
# doubles, string/date min/max are ISO strings — separate typed columns
# so no engine-specific float→varchar formatting enters the hash.
_PROFILE_COLS = [
    ("o_custkey", "num"),
    ("o_totalprice", "num"),
    ("o_orderstatus", "str"),
    ("o_orderdate", "str"),
]


def _profile_oracle() -> str:
    parts = []
    for c, kind in _PROFILE_COLS:
        if kind == "num":
            mn = f"round(CAST(min({c}) AS DOUBLE), 2)"
            mx = f"round(CAST(max({c}) AS DOUBLE), 2)"
            ms, xs = "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"
        else:
            mn, mx = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
            ms = f"CAST(min({c}) AS VARCHAR)"
            xs = f"CAST(max({c}) AS VARCHAR)"
        parts.append(
            f"SELECT '{c}' AS col, count(*) AS n_rows, count({c}) AS n_non_null,"
            f" count(DISTINCT {c}) AS n_distinct, {mn} AS min_num, {mx} AS max_num,"
            f" {ms} AS min_str, {xs} AS max_str FROM orders"
        )
    return " UNION ALL ".join(parts)


@op("dq_profile", oracle=_profile_oracle(), category=CAT)
def dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling: per-column row/non-null/distinct counts and
    typed min/max over the orders feed — the drift detector a loader
    runs on every batch before committing it.

    Scale shape: one map-side-combined aggregate pass PER COLUMN over
    the same cached scan (4 small jobs), each reading only its own
    column (pruned scan). count(DISTINCT) is the exact two-phase
    expansion; at 100 TB swap to approx_count_distinct per profile
    config — the frame is identical. Min/max land in typed columns
    (double vs string) so no float→varchar formatting divergence can
    enter the comparison.
    """
    orders = load_table(spark, sf_dir, "orders")
    frames = []
    for c, kind in _PROFILE_COLS:
        if kind == "num":
            mn = F.round(F.min(c).cast("double"), 2).alias("min_num")
            mx = F.round(F.max(c).cast("double"), 2).alias("max_num")
            ms = F.lit(None).cast("string").alias("min_str")
            xs = F.lit(None).cast("string").alias("max_str")
        else:
            mn = F.lit(None).cast("double").alias("min_num")
            mx = F.lit(None).cast("double").alias("max_num")
            ms = F.min(c).cast("string").alias("min_str")
            xs = F.max(c).cast("string").alias("max_str")
        frames.append(
            orders.agg(
                F.count("*").alias("n_rows"),
                F.count(c).alias("n_non_null"),
                F.countDistinct(c).alias("n_distinct"),
                mn, mx, ms, xs,
            ).select(F.lit(c).alias("col"), "*")
        )
    return reduce(DataFrame.unionByName, frames)


# FK edges checked: child table, child key, parent table, parent key
_FK_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
]


def _referential_oracle() -> str:
    parts = [
        f"SELECT '{ct}.{ck}' AS fk, count(*) AS n_orphans FROM {ct} c"
        f" WHERE NOT EXISTS (SELECT 1 FROM {pt} p WHERE p.{pk} = c.{ck})"
        for ct, ck, pt, pk in _FK_EDGES
    ]
    return " UNION ALL ".join(parts)


@op("dq_referential", oracle=_referential_oracle(), category=CAT)
def dq_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for each fact→dim
    foreign key (anti-join cardinality). Zero everywhere on a clean
    load; non-zero rows are the load-gate alarm.

    Scale shape: each edge is a LEFT ANTI join — dimension sides
    (customer, nation) broadcast; the lineitem→orders edge shuffles
    once on the join key with only the key column carried (pruned
    scan). At 100 TB this is the cheapest possible formulation: no
    row data moves, only keys.
    """
    frames = []
    for ct, ck, pt, pk in _FK_EDGES:
        child = load_table(spark, sf_dir, ct).select(ck)
        parent = load_table(spark, sf_dir, pt).select(pk)
        orphans = child.join(parent, child[ck] == parent[pk], "left_anti")
        frames.append(
            orphans.agg(F.count("*").alias("n_orphans")).select(
                F.lit(f"{ct}.{ck}").alias("fk"), "n_orphans"
            )
        )
    return reduce(DataFrame.unionByName, frames)


@op(
    "merge_cdc_apply",
    oracle="""
    WITH cents AS (
        SELECT *, CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
        FROM orders
    ), chg AS (
        SELECT o_orderkey AS key, 'D' AS cdc_op,
               CAST(NULL AS DOUBLE) AS new_totalprice
        FROM cents WHERE o_orderkey % 13 = 0
        UNION ALL
        -- +10% in integer cents, explicit half-up: no float .005 ambiguity
        SELECT o_orderkey, 'U', ((price_c * 11 + 5) // 10) / 100.0
        FROM cents WHERE o_orderkey % 13 = 1
        UNION ALL
        SELECT o_orderkey + 100000000, 'I', price_c / 100.0
        FROM cents WHERE o_orderkey % 13 = 2
    )
    SELECT COALESCE(b.o_orderkey, c.key) AS o_orderkey,
           COALESCE(b.o_custkey, CAST(-1 AS BIGINT)) AS o_custkey,
           round(CASE WHEN c.cdc_op IN ('U', 'I') THEN c.new_totalprice
                      ELSE b.o_totalprice END, 2) AS o_totalprice,
           CASE WHEN c.cdc_op = 'U' THEN 'update'
                WHEN c.cdc_op = 'I' THEN 'insert'
                ELSE 'keep' END AS cdc_action
    FROM orders b FULL OUTER JOIN chg c ON b.o_orderkey = c.key
    WHERE COALESCE(c.cdc_op, '') <> 'D'
    """,
    category=CAT,
)
def merge_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog MERGE: apply an insert/update/delete feed onto a base
    snapshot in one full-outer-join pass (the engine-level semantics
    of SQL MERGE / Delta upsert, without requiring a table format).
    The changelog is derived deterministically from the base (keys
    ≡0 mod 13 delete, ≡1 update +10%, ≡2 insert under a shifted key)
    so the op is self-contained and hash-checkable. The +10% runs in
    integer cents with explicit half-up division — `round(x*1.1, 2)`
    diverges between engines when the product lands on a .005
    boundary (found by the local parity gate at sf0.01).

    Scale shape: a real CDC feed is tiny vs the snapshot → Spark
    broadcasts the changes side automatically under AQE (full outer
    with one small side stays a shuffle join, so at 100 TB pre-bucket
    both sides on the key — sink_parquet_bucketed demonstrates that
    layout; the merge then runs shuffle-free). Deletes are a filter,
    updates a projection — no per-row driver logic anywhere.
    """
    base = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    cents = base.withColumn(
        "price_c", F.round(F.col("o_totalprice") * 100).cast("bigint")
    )
    chg = (
        cents.filter(k % 13 == 0)
        .select(k.alias("key"), F.lit("D").alias("cdc_op"),
                F.lit(None).cast("double").alias("new_totalprice"))
        .unionByName(
            cents.filter(k % 13 == 1).select(
                k.alias("key"), F.lit("U").alias("cdc_op"),
                (F.expr("(price_c * 11 + 5) div 10") / 100.0).alias("new_totalprice"))
        )
        .unionByName(
            cents.filter(k % 13 == 2).select(
                (k + 100000000).alias("key"), F.lit("I").alias("cdc_op"),
                (F.col("price_c") / 100.0).alias("new_totalprice"))
        )
    )
    merged = base.join(chg, base["o_orderkey"] == chg["key"], "full_outer")
    return merged.filter(
        F.coalesce(F.col("cdc_op"), F.lit("")) != "D"
    ).select(
        F.coalesce(base["o_orderkey"], chg["key"]).alias("o_orderkey"),
        F.coalesce(base["o_custkey"], F.lit(-1).cast("bigint")).alias("o_custkey"),
        F.round(
            F.when(F.col("cdc_op").isin("U", "I"), F.col("new_totalprice"))
            .otherwise(base["o_totalprice"]),
            2,
        ).alias("o_totalprice"),
        F.when(F.col("cdc_op") == "U", "update")
        .when(F.col("cdc_op") == "I", "insert")
        .otherwise("keep")
        .alias("cdc_action"),
    )


@op(
    "observe_metrics",
    oracle="""
    SELECT count(*) AS n_rows,
           round(sum(o_totalprice), 2) AS sum_price,
           CAST(count(CASE WHEN o_custkey IS NULL THEN 1 END) AS BIGINT)
               AS null_custkey,
           count(DISTINCT o_orderstatus) AS n_statuses
    FROM orders
    """,
    category=CAT,
)
def observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass pipeline metrics via df.observe(): the load job
    itself carries accumulator-style aggregates (row count, sum,
    null count), so data-quality counters cost ZERO extra scans —
    at 100 TB a separate dq_profile pass doubles the read; observe
    rides the write. The observed values are returned as a 1-row
    DataFrame and hash-checked against the oracle recomputation.

    (n_statuses uses a plain agg: observe() forbids distinct
    aggregates, a documented limitation of the metric channel.)
    """
    from pyspark.sql import Observation

    orders = load_table(spark, sf_dir, "orders")
    obs = Observation("load_metrics")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("null_custkey"),
    )
    observed.write.format("noop").mode("overwrite").save()  # the "load" action
    m = obs.get
    n_statuses = orders.select("o_orderstatus").distinct().count()
    return spark.createDataFrame(
        [(m["n_rows"], float(m["sum_price"]), m["null_custkey"], n_statuses)],
        "n_rows long, sum_price double, null_custkey long, n_statuses long",
    )


@op(
    "dq_freshness",
    oracle="""
    WITH per_type AS (
        SELECT event_type,
               max(CAST(ts AS TIMESTAMP)) AS latest,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY event_type
    ), global_max AS (
        SELECT max(latest) AS g FROM per_type
    )
    SELECT event_type, latest, n_events,
           CAST(floor(epoch(g)) AS BIGINT)
               - CAST(floor(epoch(latest)) AS BIGINT) AS staleness_sec,
           (CAST(floor(epoch(g)) AS BIGINT)
               - CAST(floor(epoch(latest)) AS BIGINT) > 3600) AS is_stale
    FROM per_type CROSS JOIN global_max
    """,
    category=CAT,
)
def dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream freshness audit: how far behind the newest data is
    each event stream (the 'did the agent on host X stop uploading'
    check a monitoring warehouse runs after every load — staleness
    beyond an SLA flags the stream).

    One map-side-combined agg to |streams| rows, then a 1-row global
    max broadcast back — the corpus never reshuffles, same shape as
    corpus_mix_weights. Staleness in integer epoch seconds (DuckDB
    epoch() is fractional DOUBLE and CAST rounds while Spark's
    unix_timestamp floors — floor() in the oracle; §2.X: never emit raw double
    arithmetic when integers express the semantics exactly)."""
    per_type = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.max("ts").alias("latest"),
            F.count("*").alias("n_events"),
        )
    )
    gmax = per_type.agg(F.max("latest").alias("g"))
    stale = F.unix_timestamp("g") - F.unix_timestamp("latest")
    return per_type.crossJoin(F.broadcast(gmax)).select(
        "event_type",
        "latest",
        "n_events",
        stale.alias("staleness_sec"),
        (stale > 3600).alias("is_stale"),
    )


@op(
    "dq_anomaly_zscore",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE)
    ), stats AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cnt) AS BIGINT) AS s,
               CAST(sum(cnt * cnt) AS BIGINT) AS ss
        FROM daily GROUP BY event_type
    )
    SELECT d.event_type, d.d, d.cnt,
           round((CAST(d.cnt AS DOUBLE) - CAST(s AS DOUBLE) / n)
                 / sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                        / (n - 1)), 4) AS z,
           (abs((CAST(d.cnt AS DOUBLE) - CAST(s AS DOUBLE) / n)
                / sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                       / (n - 1))) > 2.0) AS is_anomaly
    FROM daily d JOIN stats USING (event_type)
    WHERE n > 1
    """,
    category=CAT,
)
def dq_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily load-volume anomaly audit: z-score of each (stream, day)
    event count against that stream's own distribution — the 'agent
    uploaded half the usual volume on Tuesday' check a monitoring
    warehouse runs after every load (complements dq_freshness, which
    only catches streams that stop entirely).

    Determinism: mean/std are DERIVED in the final projection from
    exact integer partial states (n, sum, sum-of-squares as BIGINTs),
    so both engines evaluate the identical double expression in the
    same order — no aggregation-order float drift can enter before
    rounding (same protocol as agg_incremental_merge). Scale shape:
    raw events collapse to |streams × days| rows in one map-side-
    combined agg; the per-stream stats row set (|streams|) is
    broadcast back — the corpus never reshuffles. At petabyte daily
    volumes sum(cnt*cnt) can exceed BIGINT; swap the partial states
    to DECIMAL(38,0) and re-verify (the derivation is unchanged).
    """
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count("*").alias("cnt"))
    )
    stats = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("cnt").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = (
        F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n")
    ) / (F.col("n") - 1)
    z = (F.col("cnt").cast("double") - mean) / F.sqrt(var)
    return (
        daily.join(F.broadcast(stats), "event_type")
        .filter(F.col("n") > 1)
        .select(
            "event_type",
            "d",
            "cnt",
            F.round(z, 4).alias("z"),
            (F.abs(z) > 2.0).alias("is_anomaly"),
        )
    )


# (table, key expression) pairs audited for primary-key uniqueness.
_PK_AUDITS = [
    ("orders", "o_orderkey"),
    ("customer", "c_custkey"),
    ("events", "event_id"),
    ("lineitem", "l_orderkey * 10 + l_linenumber"),  # composite PK packed
]


@op(
    "dq_uniqueness",
    oracle="""
    SELECT * FROM (
        SELECT 'orders' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_keys
        FROM orders
        UNION ALL
        SELECT 'customer', CAST(count(*) AS BIGINT),
               CAST(count(DISTINCT c_custkey) AS BIGINT) FROM customer
        UNION ALL
        SELECT 'events', CAST(count(*) AS BIGINT),
               CAST(count(DISTINCT event_id) AS BIGINT) FROM events
        UNION ALL
        SELECT 'lineitem', CAST(count(*) AS BIGINT),
               CAST(count(DISTINCT l_orderkey * 10 + l_linenumber) AS BIGINT)
        FROM lineitem
    ) t
    """,
    category=CAT,
)
def dq_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit across the load's tables — the
    pre-load check a warehouse loader runs before a MERGE (a dup key
    turns an upsert into a cross-join row explosion; catching it at
    the staging edge is the cheap place). One count + count(DISTINCT)
    per table, unioned into a single audit relation; the composite
    lineitem key is packed arithmetically so the audit shape stays
    one column per table.

    Scale: each branch is an independent scan→agg (parallel stages,
    map-combined); count(DISTINCT key) at 100 TB swaps to the
    bitmap/HLL states of agg_bitmap_distinct / agg_hll_partial_merge
    per the accuracy the gate needs (exact vs screening)."""
    parts = []
    for tbl, key in _PK_AUDITS:
        t = load_table(spark, sf_dir, tbl)
        parts.append(
            t.agg(
                F.lit(tbl).alias("tbl"),
                F.count("*").alias("n_rows"),
                F.countDistinct(F.expr(key)).alias("n_keys"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@op(
    "pipeline_monitoring_health",
    oracle="""
    WITH per_type AS (
        SELECT event_type,
               max(CAST(ts AS TIMESTAMP)) AS latest,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(DISTINCT event_id) AS BIGINT) AS n_ids,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events GROUP BY event_type
    ), g AS (
        SELECT max(latest) AS gmax FROM per_type
    ), daily AS (
        SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ), vol AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(cnt) AS BIGINT) AS s,
               CAST(sum(cnt * cnt) AS BIGINT) AS ss,
               CAST(max(cnt) AS BIGINT) AS peak
        FROM daily GROUP BY event_type
    )
    SELECT p.event_type, p.n_events, p.n_users,
           (p.n_events = p.n_ids) AS ids_unique,
           CAST(floor(epoch(g.gmax)) AS BIGINT)
               - CAST(floor(epoch(p.latest)) AS BIGINT) AS staleness_sec,
           v.n_days, v.peak,
           round(CAST(v.s AS DOUBLE) / v.n_days, 4) AS avg_daily,
           round(sqrt((CAST(v.ss AS DOUBLE) - CAST(v.s AS DOUBLE) * v.s / v.n_days)
                      / (v.n_days - 1)), 4) AS std_daily
    FROM per_type p CROSS JOIN g JOIN vol v USING (event_type)
    WHERE v.n_days > 1
    """,
    category=CAT,
)
def pipeline_monitoring_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FOURTH capstone, the reference's own domain: the post-load
    health report a monitoring warehouse emits per stream after every
    ingest — freshness (dq_freshness's staleness), volume profile
    (dq_anomaly_zscore's integer-moment mean/std + peak), and
    exactly-once integrity (dq_uniqueness's id check) composed as ONE
    declarative plan over one fact table.

    Scale shape: two map-combined aggregations over events (the
    per-stream rollup and the daily collapse), each reduced to
    |streams|-sized relations BEFORE any join; the global-max row and
    the joins are broadcast-class. The corpus is scanned twice and
    shuffled never — at 100 TB the two scans merge into one with the
    daily collapse as a grouping-sets pass if the scan dominates
    (documented tradeoff; grouping-sets inflates the map-side state
    |days|-fold, worth it only when I/O outweighs memory)."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.max("ts").alias("latest"),
        F.count("*").alias("n_events"),
        F.countDistinct("event_id").alias("n_ids"),
        F.countDistinct("user_id").alias("n_users"),
    )
    g = per_type.agg(F.max("latest").alias("gmax"))
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count("*").alias("cnt")
    )
    vol = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum("cnt").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("ss"),
        F.max("cnt").alias("peak"),
    )
    mean = F.col("s").cast("double") / F.col("n_days")
    std = F.sqrt(
        (F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n_days"))
        / (F.col("n_days") - 1)
    )
    return (
        per_type.crossJoin(F.broadcast(g))
        .join(F.broadcast(vol), "event_type")
        .filter(F.col("n_days") > 1)
        .select(
            "event_type",
            "n_events",
            "n_users",
            (F.col("n_events") == F.col("n_ids")).alias("ids_unique"),
            (F.unix_timestamp("gmax") - F.unix_timestamp("latest")).alias(
                "staleness_sec"
            ),
            "n_days",
            "peak",
            F.round(mean, 4).alias("avg_daily"),
            F.round(std, 4).alias("std_daily"),
        )
    )


@op(
    "dq_checksum_columns",
    oracle="""
    WITH rowhash AS (
        SELECT o_orderstatus,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               CAST(('0x' || substr(md5(
                   CAST(o_orderkey AS VARCHAR) || '|'
                   || CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR)
                   || '|'
                   || CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS VARCHAR)
               ), 1, 9)) AS BIGINT) AS h,
               o_orderkey % 2 AS half
        FROM orders
    ), direct AS (
        SELECT o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(cents) AS BIGINT) AS sum_cents,
               CAST(sum(h) AS BIGINT) AS checksum
        FROM rowhash GROUP BY o_orderstatus
    ), reloaded AS (
        SELECT o_orderstatus,
               CAST(sum(n) AS BIGINT) AS n_rows,
               CAST(sum(s) AS BIGINT) AS sum_cents,
               CAST(sum(c) AS BIGINT) AS checksum
        FROM (
            SELECT o_orderstatus, count(*) AS n, sum(cents) AS s, sum(h) AS c
            FROM rowhash WHERE half = 0 GROUP BY o_orderstatus
            UNION ALL
            SELECT o_orderstatus, count(*), sum(cents), sum(h)
            FROM rowhash WHERE half = 1 GROUP BY o_orderstatus
        ) GROUP BY o_orderstatus
    )
    SELECT d.o_orderstatus, d.n_rows, d.sum_cents, d.checksum,
           (d.n_rows = r.n_rows) AS rows_match,
           (d.sum_cents = r.sum_cents) AS sums_match,
           (d.checksum = r.checksum) AS checksums_match
    FROM direct d JOIN reloaded r ON d.o_orderstatus = r.o_orderstatus
    """,
    category=CAT,
)
def dq_checksum_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-load reconciliation by content checksum — the reference
    domain's "did the batch land intact" audit: after a Greenplum
    load you compare the staged relation against the loaded table
    without re-shipping either. Per partition (order status) we emit
    row count, an exact money total, and an ORDER-INDEPENDENT content
    checksum (sum of a 36-bit integer derived from each row's md5 over
    its key fields), then prove a two-slice reload reproduces all
    three — any dropped, duplicated, or bit-flipped row flips the
    checksum with probability 1−2⁻³⁶.

    Design for scale: the checksum is a commutative SUM, so it
    map-side combines and never needs sorted input (an order-dependent
    digest like a rolling hash would force a global sort); 9 hex chars
    (2³⁶) keep the per-group sum far below 2⁶³ at any realistic row
    count while Spark's non-ANSI bigint sum stays exact (the
    agg_regression overflow lesson). md5 is the only hash both engines
    share bit-for-bit (xxhash64 has no DuckDB twin — the dedup_simhash
    lesson), and the hashed key string serializes the NTZ order
    date as zone-independent epoch DAYS (NTZ→date never consults the
    session zone; epoch-µs via unix_micros would reject NTZ input).
    """
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    key = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        cents.cast("string"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).cast("string"),
    )
    h = F.conv(F.substring(F.md5(key), 1, 9), 16, 10).cast("bigint")
    rowhash = o.select(
        "o_orderstatus",
        cents.alias("cents"),
        h.alias("h"),
        (F.col("o_orderkey") % 2).alias("half"),
    )
    direct = rowhash.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_rows"),
        F.sum("cents").alias("sum_cents"),
        F.sum("h").alias("checksum"),
    )
    halves = (
        rowhash.filter(F.col("half") == 0)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), F.sum("cents").alias("s"), F.sum("h").alias("c"))
        .unionAll(
            rowhash.filter(F.col("half") == 1)
            .groupBy("o_orderstatus")
            .agg(
                F.count("*").alias("n"),
                F.sum("cents").alias("s"),
                F.sum("h").alias("c"),
            )
        )
    )
    reloaded = halves.groupBy("o_orderstatus").agg(
        F.sum("n").alias("rn_rows"),
        F.sum("s").alias("rsum_cents"),
        F.sum("c").alias("rchecksum"),
    )
    return (
        direct.join(reloaded, "o_orderstatus")
        .select(
            "o_orderstatus",
            "n_rows",
            "sum_cents",
            "checksum",
            (F.col("n_rows") == F.col("rn_rows")).alias("rows_match"),
            (F.col("sum_cents") == F.col("rsum_cents")).alias("sums_match"),
            (F.col("checksum") == F.col("rchecksum")).alias("checksums_match"),
        )
    )


@op(
    "dq_psi_drift",
    oracle="""
    WITH stamped AS (
        SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events
    ), bounds AS (
        SELECT min(us) AS lo, max(us) AS hi FROM stamped
    ), halves AS (
        SELECT event_type,
               CASE WHEN us * 2 < lo + hi THEN 'a' ELSE 'b' END AS half
        FROM stamped CROSS JOIN bounds
    ), counts AS (
        SELECT event_type,
               CAST(count(*) FILTER (half = 'a') AS BIGINT) AS n_a,
               CAST(count(*) FILTER (half = 'b') AS BIGINT) AS n_b
        FROM halves GROUP BY event_type
    ), tot AS (
        SELECT CAST(sum(n_a) AS BIGINT) AS ta, CAST(sum(n_b) AS BIGINT) AS tb
        FROM counts
    )
    SELECT event_type, n_a, n_b,
           round((CAST(n_a AS DOUBLE) / ta - CAST(n_b AS DOUBLE) / tb)
                 * ln((CAST(n_a AS DOUBLE) / ta) / (CAST(n_b AS DOUBLE) / tb)),
                 6) AS psi_term,
           (round((CAST(n_a AS DOUBLE) / ta - CAST(n_b AS DOUBLE) / tb)
                  * ln((CAST(n_a AS DOUBLE) / ta) / (CAST(n_b AS DOUBLE) / tb)),
                  6) > 0.1) AS term_alert
    FROM counts CROSS JOIN tot
    """,
    category=CAT,
)
def dq_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second half of
    the stream's time span — the standard drift score for categorical
    mix shift (credit-scoring lineage): per-category term
    (p−q)·ln(p/q), with PSI = Σ terms and the conventional 0.1/0.25
    alert bands applied per term. Complements dq_anomaly_zscore
    (level) and ts_cusum_change (trend) with a MIX-shift axis.

    The time split is exact integer µs arithmetic (us·2 < lo+hi — no
    float midpoint); category shares come from one FILTER-aggregated
    pass (two exact counts per row group, map-combined); the only
    doubles are the identical share/ln expressions rounded at 6
    (text_collocation_pmi's single-ln bound). At 100 TB: one scan,
    one |categories|-row reduction, a 1-row broadcast of totals.
    """
    ev = load_table(spark, sf_dir, "events")
    stamped = ev.select("event_type", F.unix_micros("ts").alias("us"))
    bounds = stamped.agg(F.min("us").alias("lo"), F.max("us").alias("hi"))
    halves = stamped.crossJoin(F.broadcast(bounds)).withColumn(
        "half",
        F.when(F.col("us") * 2 < F.col("lo") + F.col("hi"), "a").otherwise("b"),
    )
    counts = halves.groupBy("event_type").agg(
        F.count(F.when(F.col("half") == "a", 1)).alias("n_a"),
        F.count(F.when(F.col("half") == "b", 1)).alias("n_b"),
    )
    tot = counts.agg(F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb"))
    p = F.col("n_a").cast("double") / F.col("ta")
    q = F.col("n_b").cast("double") / F.col("tb")
    term = F.round((p - q) * F.log(p / q), 6)
    return counts.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n_a",
        "n_b",
        term.alias("psi_term"),
        (term > 0.1).alias("term_alert"),
    )


@op(
    "pipeline_growth_dashboard",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rev_c
        FROM events GROUP BY 1, 2
    ), vol AS (
        SELECT event_type,
               CAST(sum(cnt) AS BIGINT) AS total_events,
               CAST(count(*) AS BIGINT) AS n_days,
               max(d) AS latest_d
        FROM daily GROUP BY event_type
    ), wau AS (
        SELECT e.event_type,
               CAST(count(DISTINCT e.user_id) AS BIGINT) AS wau_latest
        FROM (SELECT event_type, user_id,
                     CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
              FROM events) e
        JOIN vol v ON e.event_type = v.event_type
        WHERE e.d > v.latest_d - 7
        GROUP BY e.event_type
    ), eq AS (
        SELECT event_type, d,
               CAST(sum(rev_c) OVER (PARTITION BY event_type ORDER BY d)
                    AS BIGINT) AS equity_c
        FROM daily
    ), dd AS (
        SELECT event_type,
               CAST(max(peak_c - equity_c) AS BIGINT) AS max_drawdown_c
        FROM (SELECT event_type, equity_c,
                     CAST(max(equity_c) OVER (PARTITION BY event_type
                                              ORDER BY d) AS BIGINT) AS peak_c
              FROM eq)
        GROUP BY event_type
    ), wape AS (
        SELECT event_type,
               CAST(sum(abs(cnt - f)) * 1000
                    // sum(cnt) FILTER (f IS NOT NULL) AS BIGINT) AS wape_milli
        FROM (SELECT event_type, cnt,
                     lag(cnt, 7) OVER (PARTITION BY event_type ORDER BY d) AS f
              FROM daily)
        GROUP BY event_type
    )
    SELECT v.event_type, v.total_events, v.n_days, v.latest_d,
           w.wau_latest, d.max_drawdown_c, p.wape_milli,
           (d.max_drawdown_c * 10 > (SELECT max(equity_c) FROM eq e2
                                     WHERE e2.event_type = v.event_type))
               AS drawdown_alert
    FROM vol v
    JOIN wau w ON v.event_type = w.event_type
    JOIN dd d ON v.event_type = d.event_type
    JOIN wape p ON v.event_type = p.event_type
    """,
    category=CAT,
)
def pipeline_growth_dashboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIXTH capstone (the analytics family): the per-stream executive
    dashboard row — volume summary, latest 7-day active users,
    maximum revenue drawdown with a 10 %-of-peak alert, and
    seasonal-naive forecast error — composed from four derived
    relations over ONE daily base aggregate in a single declarative
    plan. The growth twin of pipeline_monitoring_health (which reads
    pipeline integrity; this reads business trajectory).

    Every number is exact integer arithmetic (counts, cents, per-mille
    WAPE, cross-multiplied alert) — a fully-integer capstone, no
    float anywhere. Shape: the events scan collapses ONCE to the
    daily relation; every component (vol/wau/drawdown/wape) derives
    from it or from a latest-window filtered pass, and the final join
    fans |streams| rows — broadcast-class throughout. At 100 TB this
    is the daily incremental dashboard: the daily base is the only
    thing recomputed, everything above it is seconds.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(
        F.count("*").alias("cnt"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("rev_c"),
    )
    vol = daily.groupBy("event_type").agg(
        F.sum("cnt").alias("total_events"),
        F.count("*").alias("n_days"),
        F.max("d").alias("latest_d"),
    )
    wau = (
        ev.select("event_type", "user_id", F.to_date("ts").alias("d"))
        .join(F.broadcast(vol.select("event_type", "latest_d")), "event_type")
        .filter(F.col("d") > F.date_sub(F.col("latest_d"), 7))
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("wau_latest"))
    )
    w = Window.partitionBy("event_type").orderBy("d")
    eq = daily.select(
        "event_type", "d", F.sum("rev_c").over(w).alias("equity_c")
    )
    peaks = eq.withColumn("peak_c", F.max("equity_c").over(w))
    dd = peaks.groupBy("event_type").agg(
        F.max(F.col("peak_c") - F.col("equity_c")).alias("max_drawdown_c"),
        F.max("equity_c").alias("final_equity_c"),
    )
    f = F.lag("cnt", 7).over(w)
    wape = (
        daily.withColumn("f", f)
        .groupBy("event_type")
        .agg(
            F.expr(
                "CAST(sum(abs(cnt - f)) * 1000"
                " div sum(CASE WHEN f IS NOT NULL THEN cnt END) AS BIGINT)"
            ).alias("wape_milli")
        )
    )
    return (
        vol.join(wau, "event_type")
        .join(dd, "event_type")
        .join(wape, "event_type")
        .select(
            "event_type", "total_events", "n_days", "latest_d",
            "wau_latest", "max_drawdown_c", "wape_milli",
            (F.col("max_drawdown_c") * 10 > F.col("final_equity_c")).alias(
                "drawdown_alert"
            ),
        )
    )


@op(
    "dq_benford_check",
    oracle="""
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                                AS VARCHAR), 1, 1) AS BIGINT) AS d
        FROM orders WHERE o_totalprice > 0
    ), obs AS (
        SELECT d, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY d
    ), tot AS (
        SELECT CAST(sum(n) AS BIGINT) AS t FROM obs
    )
    SELECT d, n,
           round(CAST(n AS DOUBLE) / t, 6) AS observed_p,
           round(ln(1.0 + 1.0 / d) / ln(10.0), 6) AS benford_p,
           round(abs(CAST(n AS DOUBLE) / t - ln(1.0 + 1.0 / d) / ln(10.0)),
                 6) AS abs_dev,
           (abs(CAST(n AS DOUBLE) / t - ln(1.0 + 1.0 / d) / ln(10.0))
            > 0.05) AS digit_alert
    FROM obs CROSS JOIN tot
    """,
    category=CAT,
)
def dq_benford_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order amounts — the
    forensic-accounting classic (Benford '38; naturally occurring
    multi-scale amounts put ~30.1 % of first digits at 1; fabricated
    or truncated data doesn't). As a DATA-QUALITY gate it catches
    generator/ingest artifacts: unit mix-ups, clipped ranges, and
    synthetic fills all bend the digit curve — this fixture's uniform
    prices deliberately FAIL the law, which the flags exhibit (the
    op's job is the audit machinery, §2.X module contract).

    First digit via integer→string head (no log10-floor division
    dance, no float before the ratio); expected p = ln(1+1/d)/ln(10)
    as the identical expression both engines; deviations rounded at
    6 with the alert on the raw |dev| (drift ≪ threshold scale).
    One map-combined digit count — trivially 100 TB-safe.
    """
    o = load_table(spark, sf_dir, "orders")
    digits = o.filter(F.col("o_totalprice") > 0).select(
        F.substring(
            F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"),
            1, 1,
        ).cast("bigint").alias("d")
    )
    obs = digits.groupBy("d").agg(F.count("*").alias("n"))
    tot = obs.agg(F.sum("n").alias("t"))
    p_obs = F.col("n").cast("double") / F.col("t")
    p_ben = F.log(1.0 + 1.0 / F.col("d")) / F.log(F.lit(10.0))
    dev = F.abs(p_obs - p_ben)
    return obs.crossJoin(F.broadcast(tot)).select(
        "d",
        "n",
        F.round(p_obs, 6).alias("observed_p"),
        F.round(p_ben, 6).alias("benford_p"),
        F.round(dev, 6).alias("abs_dev"),
        (dev > 0.05).alias("digit_alert"),
    )


@op(
    "dq_ks_drift",
    oracle="""
    WITH tagged AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS v,
               event_id % 2 AS side
        FROM events
    ), counts AS (
        SELECT v,
               CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
               CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
        FROM tagged GROUP BY v
    ), tot AS (
        SELECT CAST(sum(c0) AS BIGINT) AS n0, CAST(sum(c1) AS BIGINT) AS n1
        FROM counts
    ), cdf AS (
        SELECT v,
               CAST(sum(c0) OVER (ORDER BY v) AS BIGINT) AS f0,
               CAST(sum(c1) OVER (ORDER BY v) AS BIGINT) AS f1
        FROM counts
    ), diffs AS (
        SELECT v, abs(f0 * (SELECT n1 FROM tot) - f1 * (SELECT n0 FROM tot))
                      AS d_num
        FROM cdf
    )
    SELECT (SELECT n0 FROM tot) AS n0, (SELECT n1 FROM tot) AS n1,
           CAST(max(d_num) AS BIGINT) AS d_num,
           CAST(min(v) FILTER (WHERE d_num = (SELECT max(d_num) FROM diffs))
                AS BIGINT) AS at_v,
           round(CAST(max(d_num) AS DOUBLE)
                 / ((SELECT n0 FROM tot) * CAST((SELECT n1 FROM tot)
                                                AS DOUBLE)), 6) AS ks
    FROM diffs
    """,
    category=CAT,
)
def dq_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT two-sample Kolmogorov–Smirnov statistic between two event
    slices (even vs odd event_id — the A/B-bucket hash split):
    D = max_v |F₀(v) − F₁(v)|, with the cent value where the max is
    attained. dq_psi_drift bins first and measures aggregate shift;
    KS is the binning-free supremum distance — the standard "did the
    distribution move" test a feature-monitoring gate runs per column.

    No CDF double exists: |F₀−F₁| is compared via the integer
    cross-multiplication |f₀·n₁ − f₁·n₀| and divided by n₀·n₁ ONCE in
    the 1-row final projection (rounded 6); the argmax-v carries a
    min-v tie-break (§2.X rule 2). The per-value counts are a
    map-combined distributed aggregate; the CDF window then runs over
    the DISTINCT-VALUE relation (≤ |cent domain| rows — bounded by
    the metric's range, not the table), the ts_yoy_growth
    aggregated-relation rule. For genuinely unbounded domains the
    upgrade path is the win_quantile_bin_global two-pass: range
    bucket boundaries first, per-bucket offsets broadcast back.
    """
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.select(
        F.round(F.col("value") * 100).cast("bigint").alias("v"),
        (F.col("event_id") % 2).alias("side"),
    )
    counts = tagged.groupBy("v").agg(
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias("c1"),
    )
    w = Window.orderBy("v")
    cdf = counts.select(
        "v",
        F.sum("c0").over(w).alias("f0"),
        F.sum("c1").over(w).alias("f1"),
        F.sum("c0").over(Window.partitionBy()).alias("n0"),
        F.sum("c1").over(Window.partitionBy()).alias("n1"),
    )
    diffs = cdf.select(
        "v",
        "n0",
        "n1",
        F.abs(F.col("f0") * F.col("n1") - F.col("f1") * F.col("n0")).alias(
            "d_num"
        ),
    )
    best = diffs.groupBy().agg(
        F.max("n0").alias("n0"),
        F.max("n1").alias("n1"),
        F.max(
            F.struct(
                F.col("d_num").alias("d"), (-F.col("v")).alias("nv")
            )
        ).alias("m"),
    )
    return best.select(
        "n0",
        "n1",
        F.col("m.d").alias("d_num"),
        (-F.col("m.nv")).alias("at_v"),
        F.round(
            F.col("m.d").cast("double")
            / (F.col("n0") * F.col("n1").cast("double")),
            6,
        ).alias("ks"),
    )


# Declarative row-level data-quality rules over the lineitem feed —
# (rule id, violation predicate as SQL text usable by BOTH engines).
DQ_RULES: list[tuple[str, str]] = [
    ("quantity_positive", "NOT (l_quantity >= 1)"),
    ("discount_band", "NOT (l_discount >= 0.0 AND l_discount <= 0.10)"),
    ("tax_band", "NOT (l_tax >= 0.0 AND l_tax <= 0.08)"),
    ("price_positive", "NOT (l_extendedprice > 0)"),
    ("flag_domain", "l_returnflag NOT IN ('A', 'N', 'R')"),
    ("status_domain", "l_linestatus NOT IN ('O', 'F')"),
]


@op(
    "dq_rule_checks",
    oracle="""
    SELECT 'quantity_positive' AS rule,
           CAST(sum(CASE WHEN NOT (l_quantity >= 1) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_violations,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(CAST(sum(CASE WHEN NOT (l_quantity >= 1) THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS viol_rate
    FROM lineitem
    UNION ALL
    SELECT 'discount_band',
           CAST(sum(CASE WHEN NOT (l_discount >= 0.0 AND l_discount <= 0.10)
                         THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) AS BIGINT),
           round(CAST(sum(CASE WHEN NOT (l_discount >= 0.0
                                         AND l_discount <= 0.10)
                          THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
    FROM lineitem
    UNION ALL
    SELECT 'tax_band',
           CAST(sum(CASE WHEN NOT (l_tax >= 0.0 AND l_tax <= 0.08)
                         THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) AS BIGINT),
           round(CAST(sum(CASE WHEN NOT (l_tax >= 0.0 AND l_tax <= 0.08)
                          THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
    FROM lineitem
    UNION ALL
    SELECT 'price_positive',
           CAST(sum(CASE WHEN NOT (l_extendedprice > 0) THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(count(*) AS BIGINT),
           round(CAST(sum(CASE WHEN NOT (l_extendedprice > 0)
                          THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
    FROM lineitem
    UNION ALL
    SELECT 'flag_domain',
           CAST(sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
                         THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) AS BIGINT),
           round(CAST(sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
                          THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
    FROM lineitem
    UNION ALL
    SELECT 'status_domain',
           CAST(sum(CASE WHEN l_linestatus NOT IN ('O', 'F')
                         THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) AS BIGINT),
           round(CAST(sum(CASE WHEN l_linestatus NOT IN ('O', 'F')
                          THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
    FROM lineitem
    """,
    category=CAT,
)
def dq_rule_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative rule-based DQ gate (the Deequ/Great-Expectations
    check surface): a RULE TABLE of row-level violation predicates —
    domain bands, positivity, enum membership — evaluated over the
    feed in ONE scan, reporting per-rule violation count and rate.
    dq_profile describes columns; this PASSES JUDGMENT against a
    contract, which is what a load gate actually does (the reference
    loader's reject-row accounting generalized to named rules).

    All 6 rules compile to conditional-sum aggregates in a single
    map-combined pass (never 6 scans — the unpivot happens on the
    6-row RESULT, not the data); predicates are shared SQL text
    between engines (the rule table IS the contract artifact). At
    100 TB adding a rule costs one more sum column, not a pass; rates
    derive from integer counts in the 6-row projection (§2.X).
    """
    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for rule, pred in DQ_RULES:
        aggs.append(
            F.sum(F.when(F.expr(pred), 1).otherwise(0)).alias(f"v_{rule}")
        )
    aggs.append(F.count("*").alias("n_rows"))
    one = li.agg(*aggs)
    per_rule = []
    for rule, _ in DQ_RULES:
        per_rule.append(
            one.select(
                F.lit(rule).alias("rule"),
                F.col(f"v_{rule}").cast("bigint").alias("n_violations"),
                F.col("n_rows").cast("bigint").alias("n_rows"),
                F.round(
                    F.col(f"v_{rule}").cast("double") / F.col("n_rows"), 6
                ).alias("viol_rate"),
            )
        )
    out = per_rule[0]
    for p in per_rule[1:]:
        out = out.unionAll(p)
    return out


@op(
    "pipeline_dq_quarantine",
    oracle="""
    WITH feed AS (
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_orderkey % 31 = 0 THEN -l_quantity
                    ELSE l_quantity END AS l_quantity,
               CASE WHEN l_orderkey % 31 = 1 THEN 0.5
                    ELSE l_discount END AS l_discount,
               l_tax,
               CASE WHEN l_orderkey % 31 = 2 THEN 'X'
                    ELSE l_returnflag END AS l_returnflag,
               l_linestatus, l_extendedprice
        FROM lineitem
    ), judged AS (
        SELECT *,
               CASE WHEN NOT (l_quantity >= 1) THEN 'quantity_positive'
                    WHEN NOT (l_discount >= 0.0 AND l_discount <= 0.10)
                        THEN 'discount_band'
                    WHEN NOT (l_tax >= 0.0 AND l_tax <= 0.08) THEN 'tax_band'
                    WHEN NOT (l_extendedprice > 0) THEN 'price_positive'
                    WHEN l_returnflag NOT IN ('A', 'N', 'R')
                        THEN 'flag_domain'
                    WHEN l_linestatus NOT IN ('O', 'F') THEN 'status_domain'
                    ELSE 'clean' END AS disposition
        FROM feed
    )
    SELECT disposition,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS value_c
    FROM judged
    GROUP BY disposition
    """,
    category=CAT,
)
def pipeline_dq_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEVENTH capstone — the reference loader's reject-row path as one
    declarative plan: a feed with known defects (deterministically
    injected: negated quantities ≡0 mod 31, 50% discounts ≡1, unknown
    return flag ≡2 — the merge_cdc_apply self-derivation trick) runs
    the dq_rule_checks rule table ROW-LEVEL, each row attributed to
    its FIRST failing rule (the loader writes one reject reason, not
    all), clean rows pass through; the hashed relation is the
    quarantine accounting (rows / distinct orders / value at risk per
    disposition) every load report prints.

    One scan → one CASE chain (rule order is the attribution
    contract) → one map-combined aggregate; the quarantined ROWS
    themselves would fork to an error sink via the same disposition
    column (sink_partition_overwrite_dynamic shape) with zero extra
    passes. Value-at-risk in exact cents; rule predicates are the
    SAME shared SQL text as dq_rule_checks — gate and quarantine
    cannot disagree.
    """
    li = load_table(spark, sf_dir, "lineitem")
    feed = li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_orderkey") % 31 == 0, -F.col("l_quantity"))
        .otherwise(F.col("l_quantity"))
        .alias("l_quantity"),
        F.when(F.col("l_orderkey") % 31 == 1, F.lit(0.5))
        .otherwise(F.col("l_discount"))
        .alias("l_discount"),
        "l_tax",
        F.when(F.col("l_orderkey") % 31 == 2, F.lit("X"))
        .otherwise(F.col("l_returnflag"))
        .alias("l_returnflag"),
        "l_linestatus",
        "l_extendedprice",
    )
    first_fail = (
        F.when(~(F.col("l_quantity") >= 1), "quantity_positive")
        .when(
            ~((F.col("l_discount") >= 0.0) & (F.col("l_discount") <= 0.10)),
            "discount_band",
        )
        .when(~((F.col("l_tax") >= 0.0) & (F.col("l_tax") <= 0.08)), "tax_band")
        .when(~(F.col("l_extendedprice") > 0), "price_positive")
        .when(~F.col("l_returnflag").isin("A", "N", "R"), "flag_domain")
        .when(~F.col("l_linestatus").isin("O", "F"), "status_domain")
        .otherwise("clean")
    )
    return feed.groupBy(first_fail.alias("disposition")).agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
            "value_c"
        ),
    )


# Join-key columns audited for skew: (table, key column)
_SKEW_KEYS = [
    ("lineitem", "l_orderkey"),
    ("lineitem", "l_partkey"),
    ("orders", "o_custkey"),
]


def _skew_oracle() -> str:
    parts = []
    for t, k in _SKEW_KEYS:
        parts.append(f"""
        SELECT '{t}.{k}' AS key_col, n_keys, max_rows, med_rows,
               round(CAST(max_rows AS DOUBLE) / med_rows, 4) AS skew_ratio,
               hot_key
        FROM (
            WITH per_key AS (
                SELECT {k} AS key, CAST(count(*) AS BIGINT) AS rows_k
                FROM {t} GROUP BY {k}
            ), hist AS (
                SELECT rows_k, CAST(count(*) AS BIGINT) AS n_at
                FROM per_key GROUP BY rows_k
            ), tot AS (
                SELECT CAST(sum(n_at) AS BIGINT) AS n_keys FROM hist
            ), med AS (
                SELECT min(rows_k) AS med_rows
                FROM (SELECT rows_k,
                             sum(n_at) OVER (ORDER BY rows_k) AS cum
                      FROM hist) c CROSS JOIN tot
                WHERE cum >= (n_keys + 1) // 2
            )
            SELECT n_keys,
                   (SELECT max(rows_k) FROM per_key) AS max_rows,
                   med_rows,
                   (SELECT min(key) FROM per_key
                    WHERE rows_k = (SELECT max(rows_k) FROM per_key))
                       AS hot_key
            FROM tot CROSS JOIN med
        )""")
    return " UNION ALL ".join(parts)


@op("dq_join_key_skew", oracle=_skew_oracle(), category=CAT)
def dq_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key SKEW advisor: for each audited fact join key, the
    per-key row-count distribution summary (key count, max rows,
    EXACT lower-median rows, max/median skew ratio, the hottest key)
    — the diagnostic that decides when join_skew_salted /
    agg_salted_skew / AQE skew splitting is worth its salt,
    productized instead of ad-hoc'd (the number a perf engineer
    computes by hand before every big-join fix).

    The exact median costs no global sort: per-key counts collapse to
    a count-of-counts HISTOGRAM (≤ |distinct row-counts| rows — tiny
    by construction since counts concentrate), the cumulative window
    runs over that aggregated relation, and lower-median = smallest
    count with cum ≥ ⌈n/2⌉ — all integers (§2.X: one rounded double,
    the ratio). Hot key carries a min-key tie-break. One
    map-combined agg per audited key, no row data moved.
    """
    frames = []
    for t, k in _SKEW_KEYS:
        tbl = load_table(spark, sf_dir, t)
        per_key = tbl.groupBy(F.col(k).alias("key")).agg(
            F.count("*").alias("rows_k")
        )
        hist = per_key.groupBy("rows_k").agg(F.count("*").alias("n_at"))
        w = Window.orderBy("rows_k")
        cum = hist.select(
            "rows_k",
            F.sum("n_at").over(w).alias("cum"),
            F.sum("n_at").over(Window.partitionBy()).alias("n_keys"),
        )
        med = (
            # (n+1) div 2 in INTEGER division: the double form x.5
            # silently raises the threshold by one on even n (caught
            # live on agg_mad_robust's even-count stream)
            cum.filter(F.col("cum") >= F.expr("(n_keys + 1) div 2"))
            .groupBy("n_keys")
            .agg(F.min("rows_k").alias("med_rows"))
        )
        hot = per_key.groupBy().agg(
            F.max(
                F.struct(
                    F.col("rows_k").alias("r"), (-F.col("key")).alias("nk")
                )
            ).alias("m")
        ).select(
            F.col("m.r").alias("max_rows"),
            (-F.col("m.nk")).alias("hot_key"),
        )
        frames.append(
            med.crossJoin(hot).select(
                F.lit(f"{t}.{k}").alias("key_col"),
                F.col("n_keys").cast("bigint").alias("n_keys"),
                F.col("max_rows").cast("bigint").alias("max_rows"),
                F.col("med_rows").cast("bigint").alias("med_rows"),
                F.round(
                    F.col("max_rows").cast("double") / F.col("med_rows"), 4
                ).alias("skew_ratio"),
                F.col("hot_key").cast("bigint").alias("hot_key"),
            )
        )
    out = frames[0]
    for fdf in frames[1:]:
        out = out.unionAll(fdf)
    return out


@op(
    "dq_header_detail_reconcile",
    oracle="""
    WITH lines AS (
        SELECT l_orderkey,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS lines_c
        FROM lineitem GROUP BY l_orderkey
    ), joined AS (
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS header_c,
               coalesce(lines_c, 0) AS lines_c
        FROM orders LEFT JOIN lines ON l_orderkey = o_orderkey
    ), scored AS (
        SELECT *,
               round(abs(CAST(header_c - lines_c AS DOUBLE))
                     / header_c, 6) AS rel_diff
        FROM joined
    )
    SELECT CASE WHEN lines_c = 0 THEN 'no_lines'
                WHEN header_c = lines_c THEN 'exact'
                WHEN rel_diff <= 0.01 THEN 'within_1pct'
                WHEN rel_diff <= 0.05 THEN 'within_5pct'
                ELSE 'divergent' END AS bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(abs(header_c - lines_c)) AS BIGINT) AS abs_gap_c
    FROM scored GROUP BY 1
    """,
    category=CAT,
)
def dq_header_detail_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HEADER↔DETAIL reconciliation: order-header totals vs the sum of
    their line amounts, bucketed by relative gap (exact / ≤1% / ≤5% /
    divergent / no-lines) with the absolute cent gap per bucket — the
    invoice-vs-line-items audit every finance close runs, and the
    fastest detector of partial loads (a missing line batch shows up
    as a bucket shift long before anyone reads a row; dq_referential
    finds orphaned KEYS, this finds orphaned MONEY).

    One lines rollup on orderkey (the only fact shuffle — bucketed
    away at 100 TB), LEFT join so line-less headers are their own
    bucket (not silently 'divergent'), exact integer gaps; the ONLY
    double is the relative-diff ratio, rounded BEFORE the bucket CASE
    reads it (§2.X flag rule).
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lines = li.groupBy("l_orderkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("bigint")
        ).alias("lines_c")
    )
    joined = o.join(lines, o.o_orderkey == lines.l_orderkey, "left").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("header_c"),
        F.coalesce("lines_c", F.lit(0)).alias("lines_c"),
    )
    scored = joined.withColumn(
        "rel_diff",
        F.round(
            F.abs((F.col("header_c") - F.col("lines_c")).cast("double"))
            / F.col("header_c"),
            6,
        ),
    )
    bucket = (
        F.when(F.col("lines_c") == 0, "no_lines")
        .when(F.col("header_c") == F.col("lines_c"), "exact")
        .when(F.col("rel_diff") <= 0.01, "within_1pct")
        .when(F.col("rel_diff") <= 0.05, "within_5pct")
        .otherwise("divergent")
    )
    return scored.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.abs(F.col("header_c") - F.col("lines_c"))).alias("abs_gap_c"),
    )


# Numeric measure columns for the correlation matrix (lineitem),
# with their integer scaling (per-mille for rates, cents for price).
_CORR_COLS = [
    ("l_quantity", 1),
    # whole DOLLARS, not cents: Σ(cents²) over 600k rows is 2.2·10¹⁹ —
    # past BIGINT (caught by the sf0.1 typed gate); dollars buy 10⁴×
    # headroom and correlation is scale-invariant up to the stated
    # rounding grain
    ("l_extendedprice", 1),
    ("l_discount", 1000),
    ("l_tax", 1000),
]


def _corr_matrix_oracle() -> str:
    scaled = ", ".join(
        f"CAST(round({c} * {m}) AS BIGINT) AS x{i}"
        for i, (c, m) in enumerate(_CORR_COLS)
    )
    rows = []
    for i, (ci, _) in enumerate(_CORR_COLS):
        for j, (cj, _) in enumerate(_CORR_COLS):
            if i >= j:
                continue
            rows.append(f"""
    SELECT '{ci}' AS col_a, '{cj}' AS col_b,
           round((CAST(n AS DOUBLE) * sxy{i}{j}
                  - CAST(sx{i} AS DOUBLE) * sx{j})
                 / sqrt(CAST(n AS DOUBLE) * sxx{i}
                        - CAST(sx{i} AS DOUBLE) * sx{i})
                 / sqrt(CAST(n AS DOUBLE) * sxx{j}
                        - CAST(sx{j} AS DOUBLE) * sx{j}), 4) AS pearson_r
    FROM moments""")
    mom_cols = ["CAST(count(*) AS BIGINT) AS n"]
    for i in range(len(_CORR_COLS)):
        mom_cols.append(f"CAST(sum(x{i}) AS BIGINT) AS sx{i}")
        mom_cols.append(f"CAST(sum(x{i} * x{i}) AS BIGINT) AS sxx{i}")
    for i in range(len(_CORR_COLS)):
        for j in range(len(_CORR_COLS)):
            if i < j:
                mom_cols.append(
                    f"CAST(sum(x{i} * x{j}) AS BIGINT) AS sxy{i}{j}"
                )
    return (
        f"WITH scaled AS (SELECT {scaled} FROM lineitem), "
        f"moments AS (SELECT {', '.join(mom_cols)} FROM scaled)"
        + " UNION ALL ".join(rows)
    )


@op("dq_corr_matrix", oracle=_corr_matrix_oracle(), category=CAT)
def dq_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric-profile CORRELATION MATRIX: Pearson r for every pair of
    the 4 lineitem measures in ONE scan — the column-relationship
    panel every data-prep/EDA tool ships beside dq_profile's
    per-column stats (win_rolling_corr tracks ONE pair over time;
    this is the all-pairs snapshot that finds redundant or derived
    columns — an |r|≈1 pair is a modeling leak or a copy).

    The agg_regression integer-moment protocol widened to a matrix:
    each measure is integer-scaled (cents / per-mille), one
    map-combined aggregate emits the 15-number moment state (n, 4×Σx,
    4×Σx², 6×Σxy), and all 6 r values derive in the 1-row projection
    — adding a 5th column costs 5 more sums, never another scan.
    Beyond ~10¹⁰ rows the Σx² terms need DECIMAL(38) state
    (agg_skew_kurtosis contract, documented there).
    """
    li = load_table(spark, sf_dir, "lineitem")
    scaled = li.select(
        *[
            F.round(F.col(c) * m).cast("bigint").alias(f"x{i}")
            for i, (c, m) in enumerate(_CORR_COLS)
        ]
    )
    aggs = [F.count("*").alias("n")]
    for i in range(len(_CORR_COLS)):
        aggs.append(F.sum(F.col(f"x{i}")).alias(f"sx{i}"))
        aggs.append(
            F.sum(F.col(f"x{i}") * F.col(f"x{i}")).alias(f"sxx{i}")
        )
    for i in range(len(_CORR_COLS)):
        for j in range(len(_CORR_COLS)):
            if i < j:
                aggs.append(
                    F.sum(F.col(f"x{i}") * F.col(f"x{j}")).alias(
                        f"sxy{i}{j}"
                    )
                )
    moments = scaled.agg(*aggs)
    outs = []
    nd = F.col("n").cast("double")
    for i, (ci, _) in enumerate(_CORR_COLS):
        for j, (cj, _) in enumerate(_CORR_COLS):
            if i >= j:
                continue
            num = nd * F.col(f"sxy{i}{j}") - F.col(f"sx{i}").cast(
                "double"
            ) * F.col(f"sx{j}")
            den_i = F.sqrt(
                nd * F.col(f"sxx{i}")
                - F.col(f"sx{i}").cast("double") * F.col(f"sx{i}")
            )
            den_j = F.sqrt(
                nd * F.col(f"sxx{j}")
                - F.col(f"sx{j}").cast("double") * F.col(f"sx{j}")
            )
            outs.append(
                moments.select(
                    F.lit(ci).alias("col_a"),
                    F.lit(cj).alias("col_b"),
                    F.round(num / den_i / den_j, 4).alias("pearson_r"),
                )
            )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


SEQGAP_BUCKET = 1000


@op(
    "dq_sequence_gaps",
    oracle="""
    WITH received AS (
        SELECT event_id AS id FROM events
        WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 2) <> '00'
    ), seq AS (
        SELECT id, lead(id) OVER (ORDER BY id) AS nxt FROM received
    )
    SELECT CAST(id + 1 AS BIGINT) AS gap_start,
           CAST(nxt - 1 AS BIGINT) AS gap_end,
           CAST(nxt - id - 1 AS BIGINT) AS missing_cnt
    FROM seq
    WHERE nxt > id + 1
    ORDER BY gap_start
    """,
    category=CAT,
)
def dq_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surrogate-key continuity audit: every missing id RANGE in a
    received event feed — the upstream-loss detector for sequenced
    sources (CDC LSNs, Kafka offsets, auto-increment keys: a gap in
    the key space is dropped data even when row counts look
    plausible; dq_header_detail_reconcile catches count drift, this
    names the exact missing ranges to re-request). The degraded feed
    is derived deterministically (ids whose md5 starts '00' are
    'lost', ~1/256) so the audit has real findings to report.

    Scale shape: the naive form is lead(id) over ONE global sort of
    every id — the partition-less window §2.X bans. Here ids bucket
    by id div 1000 (SEQGAP_BUCKET): within-bucket gaps come from a
    PARTITIONED lead, and cross-bucket gaps from an ordered window
    over the per-bucket (min, max) summary — ≤|keyspace|/1000 rows,
    the only global sort. Provably ≡ the naive lead (each
    consecutive-received pair is either intra-bucket or spans the
    summary), which is exactly what the oracle runs. Whole-bucket
    losses fall out of the summary join-free.
    """
    ev = load_table(spark, sf_dir, "events")
    received = ev.select(F.col("event_id").alias("id")).filter(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 2) != "00"
    )
    b = received.withColumn("bkt", (F.col("id") / SEQGAP_BUCKET).cast("bigint"))
    # intra-bucket gaps: partitioned lead
    wb = Window.partitionBy("bkt").orderBy("id")
    intra = (
        b.withColumn("nxt", F.lead("id").over(wb))
        .filter(F.col("nxt") > F.col("id") + 1)
        .select(
            (F.col("id") + 1).alias("gap_start"),
            (F.col("nxt") - 1).alias("gap_end"),
            (F.col("nxt") - F.col("id") - 1).alias("missing_cnt"),
        )
    )
    # cross-bucket gaps: ordered window over the tiny per-bucket summary
    summ = b.groupBy("bkt").agg(F.min("id").alias("mn"), F.max("id").alias("mx"))
    ws = Window.orderBy("bkt")
    cross = (
        summ.withColumn("nxt_mn", F.lead("mn").over(ws))
        .filter(F.col("nxt_mn") > F.col("mx") + 1)
        .select(
            (F.col("mx") + 1).alias("gap_start"),
            (F.col("nxt_mn") - 1).alias("gap_end"),
            (F.col("nxt_mn") - F.col("mx") - 1).alias("missing_cnt"),
        )
    )
    return intra.unionAll(cross).orderBy("gap_start")


# The schema contract: canonical (table, column, type) triples the feed
# SHOULD have. Deliberately one migration behind the live feed --
# events.session_id was dropped upstream (-> 'missing') and events.props
# added without a contract update (-> 'unexpected') -- so every status
# the audit can emit is exercised on real metadata.
SCHEMA_CONTRACT: list[tuple[str, str, str]] = [
    ("events", "event_id", "int64"),
    ("events", "ts", "timestamp"),
    ("events", "user_id", "int64"),
    ("events", "event_type", "utf8"),
    ("events", "value", "float64"),
    ("events", "session_id", "int64"),
    ("embeddings", "vec_id", "int64"),
    ("embeddings", "embedding", "list<float32>"),
    ("embeddings", "label", "int32"),
]

_CONTRACT_SQL_ROWS = ", ".join(
    f"('{t}', '{c}', '{ty}')" for t, c, ty in SCHEMA_CONTRACT
)


@op(
    "dq_schema_contract",
    oracle=f"""
    WITH actual_raw AS (
        SELECT 'events' AS tbl, column_name AS col, column_type AS ty
        FROM (DESCRIBE events)
        UNION ALL
        SELECT 'embeddings', column_name, column_type
        FROM (DESCRIBE embeddings)
    ), actual AS (
        SELECT tbl, col,
               CASE ty WHEN 'BIGINT' THEN 'int64'
                       WHEN 'INTEGER' THEN 'int32'
                       WHEN 'DOUBLE' THEN 'float64'
                       WHEN 'VARCHAR' THEN 'utf8'
                       WHEN 'TIMESTAMP' THEN 'timestamp'
                       WHEN 'FLOAT[]' THEN 'list<float32>'
                       ELSE lower(ty) END AS actual_type
        FROM actual_raw
    ), expected AS (
        SELECT * FROM (VALUES {_CONTRACT_SQL_ROWS}) v(tbl, col, expected_type)
    )
    SELECT coalesce(e.tbl, a.tbl) AS tbl,
           coalesce(e.col, a.col) AS col,
           e.expected_type, a.actual_type,
           CASE WHEN e.col IS NULL THEN 'unexpected'
                WHEN a.col IS NULL THEN 'missing'
                WHEN e.expected_type = a.actual_type THEN 'ok'
                ELSE 'type_drift' END AS status
    FROM expected e
    FULL OUTER JOIN actual a ON a.tbl = e.tbl AND a.col = e.col
    ORDER BY tbl, col
    """,
    category=CAT,
)
def dq_schema_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-contract audit: the feed's LIVE schema (engine
    DESCRIBE, not a hardcoded copy) full-outer-joined against the
    declared contract, every column judged ok / type_drift /
    missing / unexpected — the pre-load gate that catches upstream
    migrations before they corrupt a 100 TB backfill
    (dq_rule_checks audits VALUES against rules; this audits the
    METADATA, which breaks first: a silently-widened int or a
    renamed column fails every downstream assumption at once). The
    shipped contract deliberately lags the feed by one migration so
    all four statuses are exercised.

    Both engines introspect their OWN catalog (Spark DESCRIBE of
    the scan relation vs DuckDB DESCRIBE of the parquet view) and
    fold physical type names onto one canonical vocabulary
    (int64/utf8/timestamp/... — absorbing dialect spellings AND
    Spark's timestamp vs timestamp_ntz parquet split); agreement is
    therefore evidence the canonicalization itself is faithful, not
    just the join. O(columns) metadata rows end to end — no data is
    scanned at any scale.
    """
    rows = []
    for t in ("events", "embeddings"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"igis_sc_{t}")
        rows.append(
            spark.sql(f"DESCRIBE igis_sc_{t}").selectExpr(
                f"'{t}' AS tbl", "col_name AS col", "data_type AS ty"
            )
        )
    actual_raw = rows[0].unionAll(rows[1])
    actual = actual_raw.select(
        "tbl",
        "col",
        F.when(F.col("ty") == "bigint", "int64")
        .when(F.col("ty") == "int", "int32")
        .when(F.col("ty") == "double", "float64")
        .when(F.col("ty") == "string", "utf8")
        .when(F.col("ty").isin("timestamp", "timestamp_ntz"), "timestamp")
        .when(F.col("ty") == "array<float>", "list<float32>")
        .otherwise(F.lower(F.col("ty")))
        .alias("actual_type"),
    )
    expected = spark.createDataFrame(
        SCHEMA_CONTRACT, "tbl string, col string, expected_type string"
    )
    e, a = expected.alias("e"), actual.alias("a")
    return (
        e.join(
            a,
            (F.col("a.tbl") == F.col("e.tbl")) & (F.col("a.col") == F.col("e.col")),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("e.tbl"), F.col("a.tbl")).alias("tbl"),
            F.coalesce(F.col("e.col"), F.col("a.col")).alias("col"),
            "expected_type",
            "actual_type",
            F.when(F.col("e.col").isNull(), "unexpected")
            .when(F.col("a.col").isNull(), "missing")
            .when(F.col("expected_type") == F.col("actual_type"), "ok")
            .otherwise("type_drift")
            .alias("status"),
        )
        .orderBy("tbl", "col")
    )


@op(
    "pipeline_experiment_readout",
    oracle="""
    WITH assigned AS (
        SELECT DISTINCT user_id,
               CASE WHEN substr(md5('exp1:' || CAST(user_id AS VARCHAR)),
                                1, 1) < '8'
                    THEN 'A' ELSE 'B' END AS arm
        FROM events
    ), pc AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_purch
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), metric AS (
        SELECT a.user_id, a.arm,
               CASE WHEN coalesce(pc.n_purch, 0) >= 14 THEN 1 ELSE 0 END
                   AS converted
        FROM assigned a LEFT JOIN pc ON pc.user_id = a.user_id
    ), arms AS (
        SELECT
          CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
          CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
          CAST(sum(CASE WHEN arm = 'A' THEN converted ELSE 0 END)
               AS BIGINT) AS conv_a,
          CAST(sum(CASE WHEN arm = 'B' THEN converted ELSE 0 END)
               AS BIGINT) AS conv_b
        FROM metric
    )
    SELECT n_a, n_b, conv_a, conv_b,
           round(conv_a * 1.0 / n_a, 9) AS rate_a,
           round(conv_b * 1.0 / n_b, 9) AS rate_b,
           CAST((1000000 * (conv_a * n_b - conv_b * n_a))
                // (conv_b * n_a) AS BIGINT) AS lift_ppm,
           round((n_a - n_b) * (n_a - n_b) * 1.0 / (n_a + n_b), 9)
               AS srm_chi2,
           (n_a - n_b) * (n_a - n_b) * 1000 <= 3841 * (n_a + n_b) AS srm_ok,
           round((conv_a * 1.0 / n_a - conv_b * 1.0 / n_b)
                 / sqrt(((conv_a + conv_b) * 1.0 / (n_a + n_b))
                        * (1.0 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)), 9) AS z,
           CASE WHEN (n_a - n_b) * (n_a - n_b) * 1000 > 3841 * (n_a + n_b)
                THEN 'invalid_srm'
                WHEN abs(round((conv_a * 1.0 / n_a - conv_b * 1.0 / n_b)
                     / sqrt(((conv_a + conv_b) * 1.0 / (n_a + n_b))
                            * (1.0 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
                            * (1.0 / n_a + 1.0 / n_b)), 9)) >= 1.96
                THEN 'significant' ELSE 'inconclusive' END AS verdict
    FROM arms
    """,
    category=CAT,
)
def pipeline_experiment_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone 9 — the A/B experiment readout, gate-first: hash-based
    50/50 assignment → per-arm conversion → SAMPLE-RATIO-MISMATCH
    chi-square BEFORE any lift is believed → two-proportion z →
    one verdict string. The SRM gate is the part real experiment
    platforms learned the hard way: a biased splitter (bot filtering,
    logging loss) makes any lift meaningless, so the readout refuses
    itself ('invalid_srm') before reporting significance —
    agg_ab_test_lift and agg_ab_sample_size are the bookends, this
    is the full governance loop in one relation.

    Assignment is md5-bucketed ('exp1:' salt, first hex nibble <'8')
    — §2.X rule 5's reproducible RNG, and exactly how production
    bucketing works (stable across re-runs and machines). The
    conversion metric is 'power buyer' (≥14 purchases): binary
    has-purchased saturates at 100 % on a dense feed, which zeroes
    the pooled variance and the z with it — the degenerate-metric
    trap this op documents by construction. Equal-split SRM
    collapses algebraically to (nA−nB)²/n, tested EXACTLY by
    cross-multiplication against χ²₀.₀₅ = 3.841 (·1000 both sides —
    no float in the gate); lift in integer ppm; the z is the one
    mirrored float expression, rounded at 9, and the verdict
    compares the ROUNDED z so both engines branch identically.
    """
    ev = load_table(spark, sf_dir, "events")
    assigned = ev.select("user_id").distinct().select(
        "user_id",
        F.when(
            F.substring(
                F.md5(F.concat(F.lit("exp1:"), F.col("user_id").cast("string"))),
                1,
                1,
            )
            < "8",
            "A",
        )
        .otherwise("B")
        .alias("arm"),
    )
    pc = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("n_purch"))
    )
    metric = assigned.join(pc, "user_id", "left").select(
        "arm",
        F.when(F.coalesce(F.col("n_purch"), F.lit(0)) >= 14, 1)
        .otherwise(0)
        .alias("converted"),
    )
    arms = metric.agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when(F.col("arm") == "A", F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("conv_a"),
        F.sum(F.when(F.col("arm") == "B", F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("conv_b"),
    )
    na, nb, ca, cb = (F.col(k) for k in ("n_a", "n_b", "conv_a", "conv_b"))
    pool = (ca + cb) * 1.0 / (na + nb)
    z = F.round(
        (ca * 1.0 / na - cb * 1.0 / nb)
        / F.sqrt(pool * (1.0 - pool) * (1.0 / na + 1.0 / nb)),
        9,
    )
    srm_lhs = (na - nb) * (na - nb) * 1000
    srm_rhs = 3841 * (na + nb)
    return arms.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(ca * 1.0 / na, 9).alias("rate_a"),
        F.round(cb * 1.0 / nb, 9).alias("rate_b"),
        F.floor((1000000 * (ca * nb - cb * na)) / (cb * na))
        .cast("bigint")
        .alias("lift_ppm"),
        F.round((na - nb) * (na - nb) * 1.0 / (na + nb), 9).alias("srm_chi2"),
        (srm_lhs <= srm_rhs).alias("srm_ok"),
        z.alias("z"),
        F.when(srm_lhs > srm_rhs, "invalid_srm")
        .when(F.abs(z) >= 1.96, "significant")
        .otherwise("inconclusive")
        .alias("verdict"),
    )


DUP_PAY_WINDOW_DAYS = 7


@op(
    "dq_duplicate_payments",
    oracle=f"""
    WITH payments AS (
        SELECT o_orderkey AS k, o_custkey AS ck,
               CAST(round(o_totalprice * 100) AS BIGINT) AS amount_c,
               CAST(o_orderdate AS DATE) AS d
        FROM orders
        UNION ALL
        SELECT o_orderkey + 1000000000, o_custkey,
               CAST(round(o_totalprice * 100) AS BIGINT),
               CAST(o_orderdate + INTERVAL 1 DAY AS DATE)
        FROM orders
        WHERE o_orderkey % 97 = 0
    )
    SELECT a.ck, a.amount_c, a.k AS k1, b.k AS k2, a.d AS d1, b.d AS d2,
           CAST(date_diff('day', a.d, b.d) AS BIGINT) AS day_gap
    FROM payments a JOIN payments b
      ON a.ck = b.ck AND a.amount_c = b.amount_c AND a.k < b.k
     AND abs(date_diff('day', a.d, b.d)) <= {DUP_PAY_WINDOW_DAYS}
    ORDER BY a.ck, a.amount_c, k1, k2
    """,
    category=CAT,
)
def dq_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment audit: same payer, same exact amount, within
    {DUP_PAY_WINDOW_DAYS} days — the classic AP/billing recovery
    analytic (double-submitted invoices and retried charges are the
    top recovery-audit finding; the (payer, amount) equi-key plus a
    narrow date window is how every audit firm blocks the search).
    The feed is the order book with deterministically INJECTED
    re-submissions (orderkey % 97, surrogate +10⁹ key, +1 day — the
    pipeline_dq_quarantine injected-dirt pattern), so the audit has
    a known answer set to be held against: clean data proving an
    audit finds nothing proves nothing.

    The join is EQUI on (payer, cents) — Spark plans a hash join,
    and the date-window predicate only filters within equal-amount
    groups (per-key group sizes are the natural-duplicate rate,
    tiny by construction at any scale — this is why the blocking
    key matters: date-range-first would be a range join). Exact
    cents, integer day gaps, total (k1 < k2) ordering.
    """
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").alias("ck"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("amount_c"),
        F.to_date("o_orderdate").alias("d"),
    )
    injected = (
        o.filter(F.col("o_orderkey") % 97 == 0)
        .select(
            (F.col("o_orderkey") + 1000000000).alias("k"),
            F.col("o_custkey").alias("ck"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("amount_c"),
            F.date_add(F.to_date("o_orderdate"), 1).alias("d"),
        )
    )
    payments = base.unionAll(injected)
    a, b = payments.alias("a"), payments.alias("b")
    return (
        a.join(
            b,
            (F.col("a.ck") == F.col("b.ck"))
            & (F.col("a.amount_c") == F.col("b.amount_c"))
            & (F.col("a.k") < F.col("b.k"))
            & (
                F.abs(F.datediff(F.col("b.d"), F.col("a.d")))
                <= DUP_PAY_WINDOW_DAYS
            ),
        )
        .select(
            F.col("a.ck").alias("ck"),
            F.col("a.amount_c").alias("amount_c"),
            F.col("a.k").alias("k1"),
            F.col("b.k").alias("k2"),
            F.col("a.d").alias("d1"),
            F.col("b.d").alias("d2"),
            F.datediff(F.col("b.d"), F.col("a.d")).cast("bigint").alias("day_gap"),
        )
        .orderBy("ck", "amount_c", "k1", "k2")
    )


def _gate_family_sql() -> str:
    """Compose the release-gate oracle from the SIBLING ops' own oracle
    strings (registry lookups — the twins can't drift apart)."""
    from insight_gp_import_spark.registry import REGISTRY

    sc = REGISTRY["dq_schema_contract"].oracle
    sg = REGISTRY["dq_sequence_gaps"].oracle
    dp = REGISTRY["dq_duplicate_payments"].oracle
    return f"""
    WITH sc AS ({sc}), sg AS ({sg}), dp AS ({dp})
    SELECT 'duplicate_payments' AS family,
           CAST((SELECT count(*) FROM dp) AS BIGINT) AS n_issues,
           false AS blocking,
           CASE WHEN (SELECT count(*) FROM dp) = 0 THEN 'pass'
                ELSE 'warn' END AS verdict
    UNION ALL
    SELECT 'schema_contract',
           CAST((SELECT count(*) FROM sc WHERE status <> 'ok') AS BIGINT),
           true,
           CASE WHEN (SELECT count(*) FROM sc WHERE status <> 'ok') = 0
                THEN 'pass' ELSE 'block' END
    UNION ALL
    SELECT 'sequence_gaps',
           CAST((SELECT count(*) FROM sg) AS BIGINT),
           true,
           CASE WHEN (SELECT count(*) FROM sg) = 0 THEN 'pass'
                ELSE 'block' END
    ORDER BY family
    """


@op(
    "pipeline_release_gate",
    oracle=_gate_family_sql(),
    category=CAT,
)
def pipeline_release_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone 10 — the feed release gate: three audit families
    (schema contract, key-sequence continuity, duplicate payments)
    collapsed to one verdict table a scheduler can branch on —
    per family: issue count, blocking flag, pass/warn/block. This is
    the op a real loader runs FIRST each batch; everything else in
    the engine executes only if this relation says so (metadata-tier
    schema breaks BLOCK; data-loss gaps BLOCK; duplicate-payment
    findings WARN — recovery is downstream's job, not load's).

    Composition is the point, twice over: the Spark side CALLS the
    three registered sibling operators and aggregates their outputs
    (one implementation, reused), and the ORACLE is assembled from
    those siblings' own oracle strings as CTEs (registry lookups at
    decoration time) — neither side can drift from its components.
    Family outputs are issue COUNTS, so the gate costs three
    already-bounded audits + a 3-row union.
    """
    sc = dq_schema_contract(spark, sf_dir)
    sg = dq_sequence_gaps(spark, sf_dir)
    dp = dq_duplicate_payments(spark, sf_dir)
    n_sc = sc.filter(F.col("status") != "ok").agg(
        F.count("*").cast("bigint").alias("n_issues")
    )
    n_sg = sg.agg(F.count("*").cast("bigint").alias("n_issues"))
    n_dp = dp.agg(F.count("*").cast("bigint").alias("n_issues"))

    def fam(name: str, n_df: DataFrame, blocking: bool, fail: str) -> DataFrame:
        return n_df.select(
            F.lit(name).alias("family"),
            "n_issues",
            F.lit(blocking).alias("blocking"),
            F.when(F.col("n_issues") == 0, "pass")
            .otherwise(fail)
            .alias("verdict"),
        )

    return (
        fam("duplicate_payments", n_dp, False, "warn")
        .unionAll(fam("schema_contract", n_sc, True, "block"))
        .unionAll(fam("sequence_gaps", n_sg, True, "block"))
        .orderBy("family")
    )


@op(
    "dq_decimal_fit_audit",
    oracle="""
    WITH checks AS (
        SELECT 'events.value' AS col,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN value <> round(value, 2)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_misfit
        FROM events
        UNION ALL
        SELECT 'lineitem.l_extendedprice', CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN l_extendedprice
                                  <> round(l_extendedprice, 2)
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'orders.o_totalprice', CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN o_totalprice <> round(o_totalprice, 2)
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM orders
    )
    SELECT col, n, n_misfit,
           CAST((n_misfit * 1000000) // n AS BIGINT) AS misfit_ppm,
           n_misfit = 0 AS cents_safe
    FROM checks ORDER BY col
    """,
    category=CAT,
)
def dq_decimal_fit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECIMAL(_,2)-fit audit: for each money-candidate double
    column, how many values carry sub-cent precision (x ≠
    round(x,2)) — the migration gate before 'store it as cents'
    (this engine's entire exact-money discipline assumes 2-dp
    inputs; on the price columns that holds — cents_safe — while
    events.value is a full-precision double where a cents cast
    would silently destroy data: the audit DOCUMENTS which columns
    the cents contract covers instead of assuming it, which is the
    difference between a convention and a checked invariant).

    The comparison x <> round(x, 2) is double-vs-double on
    identically computed bits — exact in both engines by IEEE
    determinism, no epsilon needed (and an epsilon would be WRONG:
    the question is representability, not closeness). One
    map-combined aggregate per column, three scans (at 100 TB run
    it per-column on ingest samples — same relation).
    """
    ev = load_table(spark, sf_dir, "events")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")

    def check(df: DataFrame, col: str, label: str) -> DataFrame:
        return df.agg(
            F.lit(label).alias("col"),
            F.count("*").cast("bigint").alias("n"),
            F.sum(
                F.when(F.col(col) != F.round(F.col(col), 2), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_misfit"),
        )

    checks = (
        check(ev, "value", "events.value")
        .unionAll(check(li, "l_extendedprice", "lineitem.l_extendedprice"))
        .unionAll(check(o, "o_totalprice", "orders.o_totalprice"))
    )
    return checks.select(
        "col",
        "n",
        "n_misfit",
        F.expr("(n_misfit * 1000000) div n").cast("bigint").alias("misfit_ppm"),
        (F.col("n_misfit") == 0).alias("cents_safe"),
    ).orderBy("col")


# FK-candidate pairs to profile: (child_table.column, parent_table.column)
# including a deliberate NEGATIVE (suppkey is NOT a part FK) so the
# verdict logic is exercised both ways.
FK_CANDIDATES = (
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_suppkey", "part", "p_partkey"),
)
FK_VERDICT_PPM = 999000  # >= 99.9 % inclusion = FK candidate


def _fk_pair_sql(ct: str, cc: str, pt: str, pc: str) -> str:
    return f"""
    SELECT '{ct}.{cc}' AS child, '{pt}.{pc}' AS parent,
           CAST((SELECT count(DISTINCT {cc}) FROM {ct}) AS BIGINT)
               AS n_child_keys,
           CAST((SELECT count(*) FROM
                    (SELECT DISTINCT c.{cc} AS k FROM {ct} c) x
                 WHERE EXISTS (SELECT 1 FROM {pt} p WHERE p.{pc} = x.k))
               AS BIGINT) AS n_included
    """


@op(
    "dq_fk_inclusion_profile",
    oracle=f"""
    WITH pairs AS (
        {" UNION ALL ".join(_fk_pair_sql(*c) for c in FK_CANDIDATES)}
    )
    SELECT child, parent, n_child_keys, n_included,
           CAST((n_included * 1000000) // n_child_keys AS BIGINT)
               AS inclusion_ppm,
           (n_included * 1000000) // n_child_keys >= {FK_VERDICT_PPM}
               AS fk_candidate
    FROM pairs ORDER BY child, parent
    """,
    category=CAT,
)
def dq_fk_inclusion_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key DISCOVERY by inclusion coefficient: for each
    candidate (child column, parent column) pair, the share of
    distinct child keys that exist in the parent — the schema-
    profiling primitive for feeds that arrive WITHOUT declared
    constraints (dq_referential AUDITS a known FK; this one FINDS
    them: ≥99.9 % inclusion is how profilers like Metanome's SPIDER
    nominate FKs, and the candidate list includes a deliberate
    non-FK pair — l_suppkey vs p_partkey — so both verdicts are
    exercised, not just the happy path).

    Each pair costs one distinct-build + one semi-join membership
    count (EXISTS — never a row-multiplying inner join against a
    non-unique parent); counts are BIGINT and the inclusion share
    is integer ppm, with the verdict threshold applied to the SAME
    integer the report shows. |pairs| is the candidate list, not
    the schema square — at discovery scale you prune candidates by
    type/name first (stated), same plan per survivor.
    """
    tbls = {
        "lineitem": load_table(spark, sf_dir, "lineitem"),
        "orders": load_table(spark, sf_dir, "orders"),
        "part": load_table(spark, sf_dir, "part"),
        "supplier": load_table(spark, sf_dir, "supplier"),
        "customer": load_table(spark, sf_dir, "customer"),
    }
    outs = []
    for ct, cc, pt, pc in FK_CANDIDATES:
        child_keys = tbls[ct].select(F.col(cc).alias("k")).distinct()
        parent_keys = tbls[pt].select(F.col(pc).alias("k")).distinct()
        stats = child_keys.agg(
            F.count("*").cast("bigint").alias("n_child_keys")
        ).crossJoin(
            child_keys.join(parent_keys, "k", "left_semi").agg(
                F.count("*").cast("bigint").alias("n_included")
            )
        )
        outs.append(
            stats.select(
                F.lit(f"{ct}.{cc}").alias("child"),
                F.lit(f"{pt}.{pc}").alias("parent"),
                "n_child_keys",
                "n_included",
            )
        )
    pairs = outs[0]
    for o_ in outs[1:]:
        pairs = pairs.unionAll(o_)
    return pairs.select(
        "child",
        "parent",
        "n_child_keys",
        "n_included",
        F.expr("(n_included * 1000000) div n_child_keys")
        .cast("bigint")
        .alias("inclusion_ppm"),
        (
            F.expr("(n_included * 1000000) div n_child_keys")
            >= FK_VERDICT_PPM
        ).alias("fk_candidate"),
    ).orderBy("child", "parent")


FP_PREFIX_HEX = 8  # 32-bit fingerprint prefix under audit


@op(
    "dq_fingerprint_collisions",
    oracle=f"""
    WITH fp AS (
        SELECT substr(md5(text), 1, {FP_PREFIX_HEX}) AS f FROM documents
    ), stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT f) AS BIGINT) AS n_distinct
        FROM fp
    )
    SELECT n, n_distinct,
           CAST(n - n_distinct AS BIGINT) AS observed_collisions,
           round(n * (n - 1.0) / 2.0 / 4294967296.0, 9)
               AS expected_collisions,
           n - n_distinct
               <= 3 + 3 * round(n * (n - 1.0) / 2.0 / 4294967296.0, 9)
               AS within_birthday_bound
    FROM stats
    """,
    category=CAT,
)
def dq_fingerprint_collisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint collision audit: observed collisions of the
    {FP_PREFIX_HEX}-hex (32-bit) content-hash prefix vs the birthday
    expectation n(n−1)/2·2⁻³² — the safety check for every truncated
    fingerprint in the engine (text_fingerprint, dedup keys, LSH
    band hashes all TRUNCATE hashes for shuffle width; truncation is
    fine exactly as long as the birthday arithmetic says so, and
    'observed ≫ expected' is how you catch a broken hash or an
    adversarial corpus — the audit that tells you when to widen to
    64-bit, which at 100 TB doc counts is a when, not an if).

    Observed collisions are exact integers (n − distinct); the
    expectation is one closed-form float rounded at 9; the verdict
    allows 3 + 3× the expectation (a crude Poisson upper tail,
    stated as such — the +3 floor keeps the small-n bound honest
    where the expectation rounds to 0). Compare happens on the
    ROUNDED expectation so both engines branch identically.
    """
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(F.substring(F.md5("text"), 1, FP_PREFIX_HEX).alias("f"))
    stats = fp.agg(
        F.count("*").cast("bigint").alias("n"),
        F.countDistinct("f").cast("bigint").alias("n_distinct"),
    )
    expected = F.round(
        F.col("n") * (F.col("n") - 1.0) / 2.0 / 4294967296.0, 9
    )
    return stats.select(
        "n",
        "n_distinct",
        (F.col("n") - F.col("n_distinct")).cast("bigint").alias(
            "observed_collisions"
        ),
        expected.alias("expected_collisions"),
        (
            F.col("n") - F.col("n_distinct") <= 3 + 3 * expected
        ).alias("within_birthday_bound"),
    )


RARE_LEVEL_PPM = 1000  # levels under 0.1 % of their column are 'rare'


@op(
    "dq_rare_categories",
    oracle=f"""
    WITH levels AS (
        SELECT 'orders.o_orderpriority' AS col, o_orderpriority AS level,
               CAST(count(*) AS BIGINT) AS n
        FROM orders GROUP BY 2
        UNION ALL
        SELECT 'part.p_brand', p_brand, CAST(count(*) AS BIGINT)
        FROM part GROUP BY 2
        UNION ALL
        SELECT 'part.p_type', p_type, CAST(count(*) AS BIGINT)
        FROM part GROUP BY 2
    ), tot AS (
        SELECT col, CAST(sum(n) AS BIGINT) AS t FROM levels GROUP BY col
    )
    SELECT l.col,
           CAST(count(*) AS BIGINT) AS n_levels,
           CAST(sum(CASE WHEN l.n * 1000000 < {RARE_LEVEL_PPM} * t.t
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
           CAST(sum(CASE WHEN l.n * 1000000 < {RARE_LEVEL_PPM} * t.t
                         THEN l.n ELSE 0 END) AS BIGINT) AS rare_rows,
           CAST(min(l.n) AS BIGINT) AS smallest_level_rows
    FROM levels l JOIN tot t ON t.col = l.col
    GROUP BY l.col ORDER BY l.col
    """,
    category=CAT,
)
def dq_rare_categories(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rare-level audit: per categorical column, how many levels fall
    under 0.1 % share and how many rows they cover — the
    feature-hygiene smell detector (rare levels are where one-hot
    encoders explode, target encoders overfit, GROUP BYs grow
    unbounded, and privacy re-identification hides; a column whose
    level count grows with data volume is a high-cardinality id
    wearing a category's clothes, and `n_levels` vs `n_rare` is the
    five-second read that catches it — dq_profile counts distincts,
    this classifies their TAIL).

    The rare test is an exact cross-multiplication per level
    (n·10⁶ < threshold·total — no share float); per-column level
    tables are dim-sized rollups UNIONed, then one ≤|columns|
    aggregate. At discovery scale the level table per column is the
    same relation a dictionary encoder already builds (stated).
    """
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")

    def levels(df: DataFrame, col: str, label: str) -> DataFrame:
        return df.groupBy(F.col(col).alias("level")).agg(
            F.count("*").cast("bigint").alias("n")
        ).select(F.lit(label).alias("col"), "level", "n")

    lv = (
        levels(o, "o_orderpriority", "orders.o_orderpriority")
        .unionAll(levels(p, "p_brand", "part.p_brand"))
        .unionAll(levels(p, "p_type", "part.p_type"))
    )
    tot = lv.groupBy("col").agg(F.sum("n").cast("bigint").alias("t"))
    rare = F.col("n") * 1000000 < RARE_LEVEL_PPM * F.col("t")
    return (
        lv.join(tot, "col")
        .groupBy("col")
        .agg(
            F.count("*").cast("bigint").alias("n_levels"),
            F.sum(F.when(rare, 1).otherwise(0)).cast("bigint").alias("n_rare"),
            F.sum(F.when(rare, F.col("n")).otherwise(0))
            .cast("bigint")
            .alias("rare_rows"),
            F.min("n").cast("bigint").alias("smallest_level_rows"),
        )
        .orderBy("col")
    )


@op(
    "dq_future_leakage_audit",
    oracle="""
    WITH versions AS (
        -- derived segment history: customers re-segment when their
        -- key crosses era boundaries (deterministic 2-version feed)
        SELECT c_custkey AS ck, c_mktsegment AS seg,
               DATE '1995-01-01' AS valid_from
        FROM customer
        UNION ALL
        SELECT c_custkey,
               CASE WHEN c_custkey % 3 = 0 THEN 'MACHINERY'
                    ELSE c_mktsegment END,
               DATE '1999-01-01'
        FROM customer
    ), probes AS (
        SELECT o_orderkey AS ok, o_custkey AS ck,
               CAST(o_orderdate AS DATE) AS od
        FROM orders
    ), pit AS (
        SELECT p.ok,
               max_by(v.seg, v.valid_from) AS pit_seg
        FROM probes p JOIN versions v
          ON v.ck = p.ck AND v.valid_from <= p.od
        GROUP BY p.ok
    ), naive AS (
        SELECT p.ok, max_by(v.seg, v.valid_from) AS naive_seg
        FROM probes p JOIN versions v ON v.ck = p.ck
        GROUP BY p.ok
    )
    SELECT CAST(count(*) AS BIGINT) AS n_probes,
           CAST(sum(CASE WHEN n.naive_seg <> t.pit_seg THEN 1 ELSE 0 END)
                AS BIGINT) AS n_leaked,
           CAST((sum(CASE WHEN n.naive_seg <> t.pit_seg THEN 1 ELSE 0 END)
                 * 1000000) // count(*) AS BIGINT) AS leakage_ppm
    FROM pit t JOIN naive n ON n.ok = t.ok
    """,
    category=CAT,
)
def dq_future_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Future-leakage audit: every order joined to its customer's
    segment BOTH ways — point-in-time (version valid at order date)
    and the naive latest-version join — counting where they differ.
    That count IS the training-label contamination a feature
    pipeline ships when it skips PIT discipline (the difference is
    invisible in schemas and row counts, inflates offline metrics,
    and collapses online — the reason feature stores exist;
    join_point_in_time IMPLEMENTS the correct join, this op
    MEASURES what the shortcut would have cost on this feed: every
    pre-1999 order of a re-segmented customer leaks).

    The version history is the deterministic two-era fixture (the
    bitemporal pattern); both joins are max_by over valid_from
    (PIT adds the ≤ order-date predicate — the entire difference is
    that one range condition, which is the lesson); counts integer,
    leakage in ppm. Probe volume passes each join once.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    v1 = c.select(
        F.col("c_custkey").alias("ck"),
        F.col("c_mktsegment").alias("seg"),
        F.lit("1995-01-01").cast("date").alias("valid_from"),
    )
    v2 = c.select(
        F.col("c_custkey").alias("ck"),
        F.when(F.col("c_custkey") % 3 == 0, "MACHINERY")
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
        F.lit("1999-01-01").cast("date").alias("valid_from"),
    )
    versions = v1.unionAll(v2)
    probes = o.select(
        F.col("o_orderkey").alias("ok"),
        F.col("o_custkey").alias("pck"),
        F.to_date("o_orderdate").alias("od"),
    )
    pit = (
        probes.join(
            versions,
            (versions.ck == F.col("pck"))
            & (F.col("valid_from") <= F.col("od")),
        )
        .groupBy("ok")
        .agg(F.expr("max_by(seg, valid_from)").alias("pit_seg"))
    )
    naive = (
        probes.join(versions, versions.ck == F.col("pck"))
        .groupBy("ok")
        .agg(F.expr("max_by(seg, valid_from)").alias("naive_seg"))
    )
    j = pit.join(naive, "ok")
    return j.agg(
        F.count("*").cast("bigint").alias("n_probes"),
        F.sum(
            F.when(F.col("naive_seg") != F.col("pit_seg"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_leaked"),
        F.expr(
            "(sum(CASE WHEN naive_seg <> pit_seg THEN 1 ELSE 0 END)"
            " * 1000000) div count(*)"
        )
        .cast("bigint")
        .alias("leakage_ppm"),
    )


@op(
    "dq_capture_recapture",
    oracle=f"""
    WITH clean AS (
        SELECT c_custkey AS ck, c_name AS nm, c_nationkey AS nk,
               CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
        FROM customer
    ), dirty AS (
        SELECT c_custkey AS ck,
               CASE WHEN c_custkey % 5 = 0 THEN c_name || 'X'
                    ELSE c_name END AS nm,
               c_nationkey AS nk,
               CAST(round(c_acctbal * 100) AS BIGINT)
                   + (c_custkey * 7919) % 21 - 10 AS bal_c
        FROM customer
    ), by_blocking AS (
        -- detector A: nation blocking + exact-name match
        SELECT c.ck FROM clean c JOIN dirty d
          ON d.nk = c.nk AND d.ck = c.ck AND d.nm = c.nm
    ), by_band AS (
        -- detector B: balance-band blocking (bal div 500) + tolerant name
        SELECT c.ck FROM clean c JOIN dirty d
          ON d.ck = c.ck
         AND d.bal_c // 500 = c.bal_c // 500
         AND (d.nm = c.nm OR d.nm = c.nm || 'X')
    ), stats AS (
        SELECT
          CAST((SELECT count(*) FROM by_blocking) AS BIGINT) AS n_a,
          CAST((SELECT count(*) FROM by_band) AS BIGINT) AS n_b,
          CAST((SELECT count(*) FROM by_blocking a
                WHERE EXISTS (SELECT 1 FROM by_band b WHERE b.ck = a.ck))
               AS BIGINT) AS n_both,
          CAST((SELECT count(*) FROM clean) AS BIGINT) AS n_true
    )
    SELECT n_a, n_b, n_both, n_true,
           CAST((n_a * n_b) // n_both AS BIGINT) AS lincoln_petersen_est,
           CAST((((n_a * n_b) // n_both) * 1000000) // n_true AS BIGINT)
               AS est_vs_truth_ppm
    FROM stats
    """,
    category=CAT,
)
def dq_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture–recapture (Lincoln–Petersen) applied to dedup QA: two
    INDEPENDENT duplicate detectors — nation-blocked exact-name and
    balance-band tolerant-name — each find a subset of the true
    duplicate pairs; N̂ = |A|·|B|/|A∩B| estimates the TOTAL
    duplicate population from their overlap, exactly how ecologists
    count fish and census bureaus estimate undercount. For dedup
    operations this answers the unanswerable-looking question 'how
    many duplicates did we MISS?' without ground truth — and because
    THIS fixture has ground truth (the surrogate construction), the
    estimator itself is validated: est_vs_truth_ppm near 10⁶ is
    Lincoln–Petersen working; its bias when detector overlap is
    correlated is the stated caveat (the detectors here differ by
    blocking key AND matching rule precisely to de-correlate).

    Both detector sets are equi-joins on the shared fixture
    (per-pair truth by key identity keeps sets small); counts and
    the estimate are pure BIGINT with `div`. One ≤|customers| pass
    per detector.
    """
    c = load_table(spark, sf_dir, "customer")
    clean = c.select(
        F.col("c_custkey").alias("ck"),
        F.col("c_name").alias("nm"),
        F.col("c_nationkey").alias("nk"),
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal_c"),
    )
    dirty = c.select(
        F.col("c_custkey").alias("dck"),
        F.when(
            F.col("c_custkey") % 5 == 0, F.concat(F.col("c_name"), F.lit("X"))
        )
        .otherwise(F.col("c_name"))
        .alias("dnm"),
        F.col("c_nationkey").alias("dnk"),
        (
            F.round(F.col("c_acctbal") * 100).cast("bigint")
            + (F.col("c_custkey") * 7919) % 21
            - 10
        ).alias("dbal_c"),
    )
    by_a = clean.join(
        dirty,
        (F.col("dnk") == F.col("nk"))
        & (F.col("dck") == F.col("ck"))
        & (F.col("dnm") == F.col("nm")),
    ).select("ck")
    by_b = clean.join(
        dirty,
        (F.col("dck") == F.col("ck"))
        & (F.expr("dbal_c div 500") == F.expr("bal_c div 500"))
        & (
            (F.col("dnm") == F.col("nm"))
            | (F.col("dnm") == F.concat(F.col("nm"), F.lit("X")))
        ),
    ).select("ck")
    n_a = by_a.agg(F.count("*").cast("bigint").alias("n_a"))
    n_b = by_b.agg(F.count("*").cast("bigint").alias("n_b"))
    n_both = by_a.join(by_b, "ck", "left_semi").agg(
        F.count("*").cast("bigint").alias("n_both")
    )
    n_true = clean.agg(F.count("*").cast("bigint").alias("n_true"))
    return (
        n_a.crossJoin(F.broadcast(n_b))
        .crossJoin(F.broadcast(n_both))
        .crossJoin(F.broadcast(n_true))
        .select(
            "n_a",
            "n_b",
            "n_both",
            "n_true",
            F.expr("(n_a * n_b) div n_both")
            .cast("bigint")
            .alias("lincoln_petersen_est"),
            F.expr("(((n_a * n_b) div n_both) * 1000000) div n_true")
            .cast("bigint")
            .alias("est_vs_truth_ppm"),
        )
    )


HLL_BOUND_PCT = 10  # 2x the default rsd (0.05) - the ~95% confidence band


@op(
    "dq_hll_error_bound",
    oracle=f"""
    SELECT 'events.user_id' AS col,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
           true AS approx_within_bound
    FROM events
    UNION ALL
    SELECT 'lineitem.l_partkey',
           CAST(count(DISTINCT l_partkey) AS BIGINT), true
    FROM lineitem
    UNION ALL
    SELECT 'orders.o_custkey',
           CAST(count(DISTINCT o_custkey) AS BIGINT), true
    FROM orders
    ORDER BY col
    """,
    category=CAT,
)
def dq_hll_error_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog error, measured against exact: for each key
    column, `approx_count_distinct` must land within {HLL_BOUND_PCT} %
    of the true distinct count (2× the default rsd 0.05 — the ~95 %
    band; a 4 % bound FAILED here with a measured 6.7 % miss on
    o_custkey, itself the lesson: 'rsd' is a standard deviation,
    not a maximum) — the validation that LICENSES
    agg_approx_distinct and every capacity estimate built on it
    (sketch error bounds are probabilistic claims about the
    ALGORITHM; whether THIS engine's implementation at THIS rsd
    honors them on THIS key distribution is an empirical question —
    the same assumption-into-measurement move as dq_hash_uniformity,
    aimed at the other sketch).

    Law-style oracle: the approx VALUE is engine-specific and can
    never hash-match DuckDB's sketch, so the declared relation
    carries the exact count (independently recomputed by DuckDB)
    plus the bound VERDICT as a law column — Spark computes
    |approx − exact|·100 ≤ {HLL_BOUND_PCT}·exact with integer
    arithmetic and must arrive at `true`; a sketch regression
    breaks the hash. Both counts come from ONE aggregate per column
    (shared scan).
    """
    ev = load_table(spark, sf_dir, "events")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")

    def check(df: DataFrame, col: str, label: str) -> DataFrame:
        return df.agg(
            F.lit(label).alias("col"),
            F.countDistinct(col).cast("bigint").alias("exact_distinct"),
            F.approx_count_distinct(col).cast("bigint").alias("approx"),
        ).select(
            "col",
            "exact_distinct",
            (
                F.abs(F.col("approx") - F.col("exact_distinct")) * 100
                <= HLL_BOUND_PCT * F.col("exact_distinct")
            ).alias("approx_within_bound"),
        )

    return (
        check(ev, "user_id", "events.user_id")
        .unionAll(check(li, "l_partkey", "lineitem.l_partkey"))
        .unionAll(check(o, "o_custkey", "orders.o_custkey"))
        .orderBy("col")
    )


QSK_ACCURACY = 1000  # approx_percentile accuracy: rank error <= n/accuracy


@op(
    "dq_quantile_sketch_bound",
    oracle=f"""
    WITH cents AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders
    ), ranked AS (
        SELECT v, CAST(row_number() OVER (ORDER BY v) AS BIGINT) AS rk,
               CAST(count(*) OVER () AS BIGINT) AS n
        FROM cents
    )
    SELECT CAST(max(n) AS BIGINT) AS n,
           CAST(max(CASE WHEN rk = (n + 1) // 2 THEN v END) AS BIGINT)
               AS exact_median_c,
           true AS sketch_within_rank_bound
    FROM ranked
    """,
    category=CAT,
)
def dq_quantile_sketch_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-sketch validation: `approx_percentile`'s median must
    sit within its DECLARED rank guarantee (|rank(v̂) − n/2| ≤
    n/accuracy) of the exact median — the dq_hll_error_bound move
    aimed at the OTHER sketch (Greenwald–Khanna's contract is a
    RANK bound, not a value bound: on a gappy distribution the
    returned value can sit far from the exact median in VALUE while
    being one rank away — checking ranks, not values, is the only
    honest test, and naive value-delta checks are the standard way
    this validation is done wrong).

    The rank of the sketch's answer is measured exactly (count of
    values ≤ v̂ — one aggregate over the same cents projection); the
    exact median itself comes from the count-histogram cumulative
    (distinct-value relation, never a fact-table window — r8);
    the verdict is integer arithmetic against n/accuracy; the
    declared relation carries the exact lower-median (selection
    device) plus the verdict law — the sketch VALUE itself is
    implementation-specific and never compared across engines.
    """
    o = load_table(spark, sf_dir, "orders")
    cents = o.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v")
    )
    approx = cents.agg(
        F.expr(f"approx_percentile(v, 0.5, {QSK_ACCURACY})")
        .cast("bigint")
        .alias("vhat")
    )
    # exact lower-median via the count-histogram trick (r8): the old
    # row_number over the raw cents was an unpartitioned window over
    # the FACT table; the cumulative window here runs over the
    # DISTINCT cent values (bounded by the price domain, the
    # dq_ks_drift rule) and min v with cum >= ceil(n/2) is the same
    # order statistic.
    hist = cents.groupBy("v").agg(F.count("*").alias("c"))
    cum = hist.select(
        "v",
        F.sum("c").over(Window.orderBy("v")).alias("cum"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    exact = cum.filter(F.col("cum") >= F.expr("(n + 1) div 2")).agg(
        F.max("n").cast("bigint").alias("n"),
        F.min("v").cast("bigint").alias("exact_median_c"),
    )
    rank_of_hat = (
        cents.crossJoin(F.broadcast(approx))
        .agg(
            F.sum(F.when(F.col("v") <= F.col("vhat"), 1).otherwise(0))
            .cast("bigint")
            .alias("rk_hat")
        )
    )
    return (
        exact.crossJoin(F.broadcast(rank_of_hat))
        .select(
            "n",
            "exact_median_c",
            (
                F.abs(F.col("rk_hat") * 2 - F.col("n"))
                * QSK_ACCURACY
                <= 2 * F.col("n")
            ).alias("sketch_within_rank_bound"),
        )
    )


@op(
    "dq_rollup_consistency",
    oracle="""
    WITH leaf AS (
        SELECT EXTRACT(year FROM o.o_orderdate) AS y, c.c_mktsegment AS seg,
               CAST(sum(round(o.o_totalprice * 100)) AS BIGINT) AS rev_c
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ), mid AS (
        SELECT EXTRACT(year FROM o_orderdate) AS y,
               CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS rev_c
        FROM orders GROUP BY 1
    ), top AS (
        SELECT CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS rev_c
        FROM orders
    ), leaf_up AS (
        SELECT y, CAST(sum(rev_c) AS BIGINT) AS rev_c FROM leaf GROUP BY y
    ), mid_check AS (
        SELECT CAST(count(*) AS BIGINT) AS n_years,
               CAST(sum(CASE WHEN l.rev_c = m.rev_c THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_consistent
        FROM leaf_up l JOIN mid m ON m.y = l.y
    )
    SELECT mc.n_years, mc.n_consistent,
           CAST((SELECT sum(rev_c) FROM mid) AS BIGINT) AS sum_mid_c,
           t.rev_c AS top_c,
           mc.n_consistent = mc.n_years
               AND (SELECT sum(rev_c) FROM mid) = t.rev_c AS lattice_ok
    FROM mid_check mc CROSS JOIN top t
    """,
    category=CAT,
)
def dq_rollup_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup-lattice additivity audit: leaf (year×segment) sums must
    equal their year parents, and year sums must equal the grand
    total — trivially true when the dimension mapping is a PARTITION
    of the fact, and exactly what breaks when it isn't (a
    many-to-many dim join double-counts, a null-key drop
    under-counts, and both corrupt every dashboard built above the
    leaf while each level still LOOKS plausible alone; finance
    calls reconciling the levels 'tie-out', and the audit is the
    automation of it — dq_header_detail_reconcile ties two TABLES,
    this ties one fact against ITSELF across grains).

    Three grains from the same cents expression (textually shared so
    the audit can't self-corrupt), per-year equality counted and the
    grand comparison exact — all BIGINT; one boolean verdict for
    the scheduler. The leaf grain is the only fact-sized pass.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cents = F.sum(F.round(F.col("o_totalprice") * 100)).cast("bigint")
    leaf = (
        o.join(c, c.c_custkey == o.o_custkey)
        .groupBy(F.year("o_orderdate").alias("y"), F.col("c_mktsegment"))
        .agg(cents.alias("rev_c"))
    )
    mid = o.groupBy(F.year("o_orderdate").alias("y")).agg(cents.alias("rev_c"))
    top = o.agg(cents.alias("rev_c"))
    leaf_up = leaf.groupBy("y").agg(F.sum("rev_c").cast("bigint").alias("rev_c"))
    mid_check = leaf_up.join(
        mid.withColumnRenamed("rev_c", "mid_c"), "y"
    ).agg(
        F.count("*").cast("bigint").alias("n_years"),
        F.sum(F.when(F.col("rev_c") == F.col("mid_c"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_consistent"),
    )
    sum_mid = mid.agg(F.sum("rev_c").cast("bigint").alias("sum_mid_c"))
    return (
        mid_check.crossJoin(F.broadcast(sum_mid))
        .crossJoin(F.broadcast(top.withColumnRenamed("rev_c", "top_c")))
        .select(
            "n_years",
            "n_consistent",
            "sum_mid_c",
            "top_c",
            (
                (F.col("n_consistent") == F.col("n_years"))
                & (F.col("sum_mid_c") == F.col("top_c"))
            ).alias("lattice_ok"),
        )
    )
