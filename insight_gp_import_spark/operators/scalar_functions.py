"""Scalar function families (SURVEY.md §2.G) — one themed query each.

These stay JVM-side (built-in ``pyspark.sql.functions``, whole-stage
codegen); the Python boundary is only crossed by §2.I UDF ops. Known
cross-engine divergences are shimmed in the *oracle* (dayofweek +1) or
avoided (stringified doubles/timestamps, double→int casts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from insight_gp_import_spark.registry import op
from insight_gp_import_spark.tables import load_table, spread_scan

CAT = "functions"


@op(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS uname,
           lower(c_mktsegment) AS lseg,
           trim(c_name || '  ') AS trimmed,
           substring(c_name, 1, 8) AS prefix,
           length(c_name) AS name_len,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
           replace(c_name, 'Customer', 'Cust') AS replaced,
           string_split(c_name, '#')[1] AS first_part,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           regexp_replace(c_name, '[0-9]', 'x', 'g') AS masked
    FROM customer
    """,
    category=CAT,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat/case/trim/substring/length/pad/replace/split/regexp family."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.trim(F.concat(F.col("c_name"), F.lit("  "))).alias("trimmed"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.length("c_name").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("replaced"),
        F.split(F.col("c_name"), "#").getItem(0).alias("first_part"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.regexp_replace("c_name", "[0-9]", "x").alias("masked"),
    )


@op(
    "fn_datetime",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)  AS yr,
           month(o_orderdate) AS mo,
           day(o_orderdate)   AS dy,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(o_orderdate AS DATE) + 30 AS plus30,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           dayofweek(o_orderdate) + 1 AS dow
    FROM orders
    """,
    category=CAT,
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/date_trunc/date_add/datediff/last_day/dayofweek.

    Oracle shim: DuckDB dayofweek is 0=Sunday, Spark is 1=Sunday →
    ``+1`` on the DuckDB side (probe-8).
    """
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("plus30"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate")).alias(
            "days_to_y2k"
        ),
        F.last_day("o_orderdate").alias("month_end"),
        F.dayofweek("o_orderdate").alias("dow"),
    )


@op(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice)  AS BIGINT) AS price_ceil,
           ROUND(abs(l_discount - 0.05), 2) AS disc_dev,
           ROUND(sqrt(l_extendedprice), 4) AS price_sqrt,
           ROUND(pow(l_quantity, 2), 4) AS qty_sq,
           ROUND(exp(l_discount), 6) AS disc_exp,
           ROUND(ln(l_extendedprice), 6) AS price_ln,
           ROUND(log10(l_extendedprice), 6) AS price_log10,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           l_orderkey % 7 AS key_mod
    FROM lineitem
    """,
    category=CAT,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """floor/ceil/abs/sqrt/pow/exp/ln/log10/sign/modulo family."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.round(F.abs(F.col("l_discount") - 0.05), 2).alias("disc_dev"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


@op(
    "fn_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 200000 THEN 'high'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'low' END AS price_band,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_filled,
           least(o_totalprice, 150000.0)    AS capped,
           greatest(o_totalprice, 50000.0)  AS floored
    FROM orders
    """,
    category=CAT,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif / least / greatest."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 200000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")
        ).alias("status_filled"),
        F.least(F.col("o_totalprice"), F.lit(150000.0)).alias("capped"),
        F.greatest(F.col("o_totalprice"), F.lit(50000.0)).alias("floored"),
    )


@op(
    "fn_cast_try",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
           TRY_CAST(o_orderstatus AS INTEGER) AS bad_int,
           TRY_CAST('12.5' AS DOUBLE) AS good_double,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(o_custkey AS DOUBLE) AS cust_double
    FROM orders
    """,
    category=CAT,
)
def fn_cast_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cast + try_cast between string/int/double/date.

    Deliberately excluded (engine-divergent, SURVEY §2.G): double→string
    (format differs), double→int (Spark truncates, DuckDB rounds),
    timestamp→string.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderkey").cast("string").cast("bigint").alias("key_roundtrip"),
        F.col("o_orderstatus").try_cast("int").alias("bad_int"),
        F.lit("12.5").try_cast("double").alias("good_double"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.col("o_custkey").cast("double").alias("cust_double"),
    )


@op(
    "fn_array",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_toks,
           list_contains(string_split(text, ' '), 'join') AS has_join,
           array_to_string(list_slice(list_sort(list_distinct(string_split(text, ' '))), 1, 5), ',')
               AS first5_distinct
    FROM documents
    """,
    category=CAT,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array size/contains/distinct/sort/slice; serialized via array_join
    before hashing (§2.X rule 3 — never emit raw arrays)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_toks"),
        F.array_contains(toks, "join").alias("has_join"),
        F.array_join(F.slice(F.sort_array(F.array_distinct(toks)), 1, 5), ",").alias(
            "first5_distinct"
        ),
    )


@op(
    "fn_struct_map",
    oracle="""
    SELECT c_custkey,
           (struct_pack(id := c_custkey, seg := c_mktsegment)).seg AS seg_from_struct,
           c_mktsegment AS seg_from_map,
           ROUND((struct_pack(bal := c_acctbal)).bal, 2) AS bal_from_struct
    FROM customer
    """,
    category=CAT,
)
def fn_struct_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """struct/map construction + field access, projected back to scalars
    (raw structs/maps never appear in hashed output — §2.X rule 3).

    The map round-trip is semantically the identity, which is exactly
    what the oracle states for ``seg_from_map``.
    """
    c = load_table(spark, sf_dir, "customer")
    s = F.struct(
        F.col("c_custkey").alias("id"), F.col("c_mktsegment").alias("seg")
    )
    m = F.create_map(F.lit("seg"), F.col("c_mktsegment"))
    return c.select(
        "c_custkey",
        s.getField("seg").alias("seg_from_struct"),
        F.element_at(m, "seg").alias("seg_from_map"),
        F.round(
            F.struct(F.col("c_acctbal").alias("bal")).getField("bal"), 2
        ).alias("bal_from_struct"),
    )


@op(
    "fn_json",
    oracle="""
    SELECT event_type,
           COUNT(*) AS cnt,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
    FROM events
    GROUP BY event_type
    """,
    category=CAT,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9: JSON path extraction from events.props + aggregate (probe-10)."""
    # r12: per-row JSON parsing is the whole cost here, and the
    # one-row-group scan serialized it on one core; spread_scan fans
    # it out (0.49 s → 0.39 s at sf0.1; no-op at production split
    # counts). The exchange carries only (event_type, props).
    ev = spread_scan(
        load_table(spark, sf_dir, "events").select("event_type", "props")
    )
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


@op(
    "fn_hash",
    oracle="""
    SELECT doc_id, md5(text) AS text_md5, sha256(text) AS text_sha256
    FROM documents
    """,
    category=CAT,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 / sha2-256 content addressing — the dedup key primitives
    (engine-portable, unlike Spark-internal hash/xxhash64)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2(F.col("text"), 256).alias("text_sha256"),
    )


@op(
    "fn_bitwise",
    oracle="""
    SELECT event_id, event_id & 255 AS b_and, event_id | 4096 AS b_or,
           xor(event_id, 170) AS b_xor, event_id << 3 AS b_shl,
           event_id >> 2 AS b_shr, bit_count(event_id) AS b_pop
    FROM events WHERE event_id < 64
    """,
    category=CAT,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: and/or/xor, shifts, popcount — the primitives
    the SimHash/LSH banding operators build on, exercised directly.
    DuckDB spells xor as a function, Spark as ``^``; everything else
    maps operator-for-operator on bigints."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 64)
    return ev.select(
        "event_id",
        F.col("event_id").bitwiseAND(F.lit(255)).alias("b_and"),
        F.col("event_id").bitwiseOR(F.lit(4096)).alias("b_or"),
        F.col("event_id").bitwiseXOR(F.lit(170)).alias("b_xor"),
        F.shiftleft("event_id", 3).alias("b_shl"),
        F.shiftright("event_id", 2).alias("b_shr"),
        F.bit_count("event_id").alias("b_pop"),
    )


@op(
    "fn_regexp_extract_all",
    oracle="""
    SELECT doc_id,
           array_to_string(regexp_extract_all(text, '[a-z]{4,}'), ',') AS words,
           CAST(len(regexp_extract_all(text, '[a-z]{4,}')) AS INT) AS n_words
    FROM documents
    WHERE doc_id % 97 = 0
    """,
    category=CAT,
)
def fn_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-match regex extraction — regexp_extract_all pulls EVERY
    match as an array (the scalar fn_string family covers only
    first-match extract). Pattern stays in the Java∩RE2 common dialect
    (§2.G rule); match order is left-to-right in both engines, so the
    serialized join is deterministic without a sort. Array serialized
    via array_join before hashing (§2.X rule 3)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 97 == 0
    )
    words = F.expr("regexp_extract_all(text, '[a-z]{4,}', 0)")
    return docs.select(
        "doc_id",
        F.array_join(words, ",").alias("words"),
        F.size(words).alias("n_words"),
    )


@op(
    "fn_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
           CAST(json_extract_string(props, '$.missing') AS INTEGER) AS k_missing,
           (json_extract(props, '$.k') IS NOT NULL) AS has_k
    FROM events WHERE event_id < 2000
    """,
    category=CAT,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT ingestion: `parse_json` once into a binary
    semi-structured VARIANT column, then typed `variant_get` path
    extraction — the modern replacement for per-path get_json_object
    re-parsing (fn_json is the classic twin). One parse serves N path
    reads; at 100 TB the parse cost dominates, so VARIANT's
    parse-once/read-many is the schema-on-read hot path. Missing paths
    yield NULL via try_variant_get (never an error), mirroring the
    loader's tolerant-parse posture.

    The VARIANT value itself never reaches the hashed output (§2.X
    rule 3 — it's an engine-internal binary); only typed scalar
    extractions do, which DuckDB twins with json_extract."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    v = F.parse_json("props")
    withv = ev.select("event_id", v.alias("v"))
    return withv.select(
        "event_id",
        F.try_variant_get(F.col("v"), "$.k", "int").alias("k_int"),
        F.try_variant_get(F.col("v"), "$.missing", "int").alias("k_missing"),
        F.try_variant_get(F.col("v"), "$.k", "int").isNotNull().alias("has_k"),
    )


@op(
    "fn_array_hof",
    oracle="""
    WITH t AS (
        SELECT doc_id, list_transform(string_split(text, ' '), x -> length(x)) AS lens
        FROM documents
    )
    SELECT doc_id,
           CAST(coalesce(list_sum(list_filter(lens, x -> x > 5)), 0) AS BIGINT)
               AS long_len_sum,
           (len(list_filter(lens, x -> x > 15)) > 0) AS has_very_long,
           (len(list_filter(lens, x -> x >= 1)) = len(lens)) AS all_nonempty,
           CAST(list_max(lens) AS BIGINT) AS max_len
    FROM t
    """,
    category=CAT,
)
def fn_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lambda higher-order functions — transform / filter / exists /
    forall / aggregate as the CONTRACT surface (they power half the
    corpus ops internally; this op pins their semantics directly).
    HOFs run inside whole-stage codegen on the JVM — the idiom that
    keeps per-token logic out of Python UDFs entirely (§ UDFs are the
    slow path). DuckDB twins via list_transform/list_filter/list_sum;
    exists/forall phrased as filter-length identities (engine-neutral
    formulation of the same predicate calculus). Two dialect traps
    pinned by this op: DuckDB list_sum([]) is NULL where Spark's
    aggregate(…, 0, +) yields its init (coalesce in the oracle), and
    DuckDB strlen is BYTES where Spark length() is CHARS (use
    length() both sides — the corpus is not pure ASCII)."""
    d = load_table(spark, sf_dir, "documents")
    lens = F.transform(F.split("text", " "), lambda x: F.length(x))
    return d.select(
        "doc_id",
        F.aggregate(
            F.filter(lens, lambda x: x > 5),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("long_len_sum"),
        F.exists(lens, lambda x: x > 15).alias("has_very_long"),
        F.forall(lens, lambda x: x >= 1).alias("all_nonempty"),
        F.array_max(lens).cast("bigint").alias("max_len"),
    )


@op(
    "fn_collation",
    oracle="""
    WITH cased AS (
        SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                    ELSE lower(c_mktsegment) END AS seg
        FROM customer
    )
    SELECT lower(seg) AS seg_ci, CAST(count(*) AS BIGINT) AS n
    FROM cased GROUP BY lower(seg)
    """,
    category=CAT,
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collation (Spark 4, SPARK-46830): UTF8_LCASE makes
    comparisons, GROUP BY, and joins case-insensitive AT THE TYPE
    LEVEL — no lower() wrapped around every predicate, and (unlike
    the lower() rewrite) the collation survives into pushed filters
    and join keys. The op manufactures case variance (even keys
    upper, odd lower), groups under UTF8_LCASE, and the counts must
    equal the explicit lower() grouping (the oracle). The projected
    group key is normalized with lower() because a collated GROUP BY
    keeps an arbitrary representative casing per group — the one
    nondeterminism collation introduces (§2.X rule 2) — and is cast
    back to UTF8_BINARY because collation PROPAGATES through
    functions into the result schema (a schema-contract effect the
    declared-type gate catches)."""
    c = load_table(spark, sf_dir, "customer")
    cased = c.select(
        F.when(F.col("c_custkey") % 2 == 0, F.upper("c_mktsegment"))
        .otherwise(F.lower("c_mktsegment"))
        .alias("seg")
    )
    cased.createOrReplaceTempView("igis_collate_cased")
    return spark.sql("""
        SELECT CAST(lower(sc) AS STRING COLLATE UTF8_BINARY) AS seg_ci,
               count(*) AS n
        FROM (SELECT seg COLLATE UTF8_LCASE AS sc FROM igis_collate_cased)
        GROUP BY sc
    """)


@op(
    "fn_try_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 7 = 0 THEN NULL
                ELSE CAST(o_custkey AS DOUBLE) / (o_orderkey % 7) END AS safe_div,
           CASE WHEN o_orderkey % 7 = 0 THEN NULL
                ELSE o_custkey // (o_orderkey % 7) END AS safe_int_div,
           try_cast(o_orderstatus AS INTEGER) AS bad_num,
           try_cast('  42 ' AS INTEGER) AS spaced_num
    FROM orders
    """,
    category=CAT,
)
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The try_* arithmetic family under ANSI mode (Spark 4 default):
    division by zero, overflow, and bad parses yield NULL instead of
    killing the job — the row-level tolerance a loader needs so one
    poisoned record quarantines itself rather than failing a 100 TB
    batch (the same posture as scan_csv_tolerant, at expression
    granularity). Non-try arithmetic under ANSI THROWS on these
    inputs (win_rolling_corr hit exactly that with corr()); try_*
    is the sanctioned escape hatch.

    Oracle dialect note: DuckDB has no try_divide and its division
    semantics differ at the poles, so the oracle states the intended
    relation with explicit CASE guards — which is precisely the
    semantics try_divide implements."""
    o = load_table(spark, sf_dir, "orders")
    divisor = F.col("o_orderkey") % 7
    return o.select(
        "o_orderkey",
        F.try_divide(F.col("o_custkey").cast("double"), divisor).alias("safe_div"),
        F.when(
            divisor != 0, F.expr("o_custkey div (o_orderkey % 7)")
        ).alias("safe_int_div"),
        F.col("o_orderstatus").try_cast("int").alias("bad_num"),
        F.lit("  42 ").try_cast("int").alias("spaced_num"),
    )


@op(
    "fn_url_parse",
    oracle="""
    WITH urls AS (
        SELECT doc_id,
               'https://' || source || '.example.com/docs/' || lang || '/'
                   || doc_id || '?ref=' || source || '&v=' || (doc_id % 10)
                   AS url
        FROM documents
    )
    SELECT doc_id, url,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '[?&]ref=([^&]*)', 1) AS ref,
           regexp_extract(url, '[?&]v=([^&]*)', 1) AS v
    FROM urls
    """,
    category=CAT,
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition via the built-in ``parse_url`` — HOST, PATH,
    and per-parameter QUERY extraction, the log-analytics staple (the
    reference's domain ships Tableau http_requests logs whose URI
    column gets exactly this treatment downstream).

    URLs are synthesized deterministically from document attributes
    (the corpus has no URL column), then parsed back with Spark's
    parse_url — a JVM expression, codegen'd, zero UDFs. The oracle
    decomposes the same strings with anchored regexps, so the
    hash-match proves parse_url's HOST/PATH/QUERY(key) semantics
    against an independent spelling rather than mirroring the same
    builtin. Scan-stage only; at 100 TB this fuses into the scan like
    every fn_* family op.
    """
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("lang"), F.lit("/"), F.col("doc_id").cast("string"),
        F.lit("?ref="), F.col("source"),
        F.lit("&v="), (F.col("doc_id") % 10).cast("string"),
    )
    urls = docs.select("doc_id", url.alias("url"))
    return urls.select(
        "doc_id",
        "url",
        F.expr("parse_url(url, 'HOST')").alias("host"),
        F.expr("parse_url(url, 'PATH')").alias("path"),
        F.expr("parse_url(url, 'QUERY', 'ref')").alias("ref"),
        F.expr("parse_url(url, 'QUERY', 'v')").alias("v"),
    )


@op(
    "fn_luhn_check",
    oracle="""
    WITH nums AS (
        SELECT o_orderkey,
               lpad(CAST((o_orderkey * 37) % 1000000000 AS VARCHAR), 10, '0')
                   || CAST(o_orderkey % 10 AS VARCHAR) AS numstr
        FROM orders
    ), digits AS (
        SELECT o_orderkey, numstr,
               list_transform(generate_series(1, len(numstr)), i ->
                   CASE WHEN (len(numstr) - i) % 2 = 1
                        THEN CASE WHEN 2 * CAST(substr(numstr, i, 1) AS INTEGER) > 9
                                  THEN 2 * CAST(substr(numstr, i, 1) AS INTEGER) - 9
                                  ELSE 2 * CAST(substr(numstr, i, 1) AS INTEGER) END
                        ELSE CAST(substr(numstr, i, 1) AS INTEGER) END) AS contrib
        FROM nums
    )
    SELECT o_orderkey, numstr,
           (list_aggregate(contrib, 'sum') % 10 = 0) AS is_valid
    FROM digits
    """,
    category=CAT,
)
def fn_luhn_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn mod-10 validation via the builtin ``luhn_check`` (Spark
    3.5+) over deterministically synthesized 11-digit account-number
    strings — the checksum gate every ingest pipeline runs on card/
    account-shaped columns before loading (the validation sibling of
    text_pii_mask's detection).

    The oracle does NOT mirror the builtin (DuckDB has none): it
    implements Luhn from the definition — right-aligned positions,
    every second digit doubled with 9-subtraction, sum divisible by
    10 — so the hash-match proves Spark's builtin AGAINST the
    published algorithm, the fn_url_parse independence pattern. Pure
    scan-stage integer/string work, zero UDFs; the mix of valid and
    invalid inputs comes free from the key-derived last digit.
    """
    o = load_table(spark, sf_dir, "orders")
    numstr = F.concat(
        F.lpad(((F.col("o_orderkey") * 37) % 1000000000).cast("string"), 10, "0"),
        (F.col("o_orderkey") % 10).cast("string"),
    )
    return o.select(
        "o_orderkey",
        numstr.alias("numstr"),
        F.expr("luhn_check(numstr)").alias("is_valid"),
    ).select("o_orderkey", "numstr", "is_valid")


@op(
    "fn_mask",
    oracle="""
    SELECT o_orderkey,
           regexp_replace(regexp_replace(regexp_replace(
               'ACC-' || lpad(CAST(o_orderkey % 100000000 AS VARCHAR), 8, '0')
                      || '-' || o_orderstatus,
               '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
               AS masked_full,
           'ACC-****' || substr(lpad(CAST(o_orderkey % 100000000 AS VARCHAR),
                                     8, '0'), 5, 4)
               || '-' || o_orderstatus AS masked_last4
    FROM orders
    """,
    category=CAT,
)
def fn_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data masking via the ``mask`` builtin (Spark 3.4+): full
    char-class masking (upper→X, lower→x, digit→n) plus the
    show-last-4 display pattern — the redaction step a warehouse
    applies before handing account-shaped columns to analysts
    (fn_luhn_check validates them, this hides them; text_pii_mask is
    the regex-detection cousin for free text).

    The account string is key-derived (corpus has no PII — by
    construction, which is the point of the synthetic fixture). The
    oracle spells masking as chained char-class regexp_replace —
    independent of the builtin, the fn_url_parse pattern. Scan-stage,
    zero UDFs.
    """
    o = load_table(spark, sf_dir, "orders")
    acc = F.concat(
        F.lit("ACC-"),
        F.lpad((F.col("o_orderkey") % 100000000).cast("string"), 8, "0"),
        F.lit("-"),
        F.col("o_orderstatus"),
    )
    last4 = F.concat(
        F.lit("ACC-****"),
        F.substring(
            F.lpad((F.col("o_orderkey") % 100000000).cast("string"), 8, "0"),
            5, 4,
        ),
        F.lit("-"),
        F.col("o_orderstatus"),
    )
    return o.select(
        "o_orderkey",
        F.expr(
            "mask(concat('ACC-', lpad(CAST(o_orderkey % 100000000 AS STRING), 8, '0'),"
            " '-', o_orderstatus))"
        ).alias("masked_full"),
        last4.alias("masked_last4"),
    )


@op(
    "fn_array_sort_comparator",
    oracle="""
    WITH arrs AS (
        SELECT doc_id, string_split(text, ' ')[1:8] AS toks FROM documents
    )
    SELECT doc_id,
           array_to_string(
               list_transform(
                   list_sort(list_transform(
                       toks, x -> lpad(CAST(length(x) AS VARCHAR), 3, '0') || x)),
                   k -> substr(k, 4)),
               ' ') AS by_len_then_alpha,
           array_to_string(list_reverse_sort(toks), ' ') AS desc_alpha
    FROM arrs
    """,
    category=CAT,
)
def fn_array_sort_comparator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_sort with a CUSTOM COMPARATOR lambda (length first, then
    lexicographic) plus a descending sort — the HOF surface beyond
    fn_array_hof's map/filter/reduce: user-defined orderings without
    leaving the JVM.

    Dialect note worth the op: DuckDB has no comparator lambdas, so
    the oracle expresses the same ordering as a SCHWARTZIAN TRANSFORM
    (decorate with a zero-padded sortable key → sort → strip). The
    hash-match therefore proves Spark's comparator semantics against
    the decorate-sort-undecorate spelling — two genuinely different
    formulations of one ordering, the strongest oracle form this
    family has. Results serialize via array_to_string (§2.X rule 3:
    no raw arrays in hashed output). Scan-stage, zero shuffles.
    """
    docs = load_table(spark, sf_dir, "documents")
    arrs = docs.select(
        "doc_id", F.expr("slice(split(text, ' '), 1, 8)").alias("toks")
    )
    return arrs.select(
        "doc_id",
        F.expr(
            "array_join(array_sort(toks, (l, r) -> "
            "CASE WHEN length(l) < length(r) THEN -1 "
            "     WHEN length(l) > length(r) THEN 1 "
            "     WHEN l < r THEN -1 WHEN l > r THEN 1 ELSE 0 END), ' ')"
        ).alias("by_len_then_alpha"),
        F.expr(
            "array_join(reverse(array_sort(toks)), ' ')"
        ).alias("desc_alpha"),
    )


@op(
    "fn_date_format",
    oracle="""
    SELECT o_orderkey,
           strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d') AS iso_day,
           strftime(CAST(o_orderdate AS TIMESTAMP), '%Y/%m') AS slash_month,
           strftime(CAST(o_orderdate AS TIMESTAMP), '%j') AS day_of_year,
           strftime(CAST(o_orderdate AS TIMESTAMP), '%H:%M:%S') AS clock
    FROM orders
    """,
    category=CAT,
)
def fn_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp-to-string formatting parity: Spark's Java-style
    ``date_format`` patterns (yyyy-MM-dd, DDD, HH:mm:ss) vs DuckDB's
    C-style strftime (%Y-%m-%d, %j, %H:%M:%S) — the report/filename
    rendering layer of every export job (the reference's archive
    paths are exactly such formatted-date strings).

    The two engines use DIFFERENT pattern languages for the same
    rendering, so the hash-match proves the OUTPUT conventions line
    up — zero-padded day-of-year is the classic mismatch (Java 'D'
    pads to nothing, '%j' pads to 3; this op pins the padded 'DDD'
    spelling). NTZ input keeps every field zone-independent. Pure
    scan-stage string work.
    """
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(d, "yyyy-MM-dd").alias("iso_day"),
        F.date_format(d, "yyyy/MM").alias("slash_month"),
        F.date_format(d, "DDD").alias("day_of_year"),
        F.date_format(d, "HH:mm:ss").alias("clock"),
    )


WB_LO, WB_HI, WB_N = 0, 500000, 20


@op(
    "fn_width_bucket",
    oracle=f"""
    SELECT o_orderkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           CAST(CASE
             WHEN round(o_totalprice * 100) < {WB_LO} THEN 0
             WHEN round(o_totalprice * 100) >= {WB_HI} THEN {WB_N} + 1
             ELSE 1 + CAST(round(o_totalprice * 100) - {WB_LO} AS BIGINT)
                      * {WB_N} // ({WB_HI} - {WB_LO})
           END AS BIGINT) AS bucket
    FROM orders
    """,
    category=CAT,
)
def fn_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width bucketing via the ``width_bucket`` builtin (SQL
    standard, Spark 3.1+): order totals into {WB_N} fixed price bands
    with the standard under/overflow buckets 0 and {WB_N}+1 — the
    histogramming primitive dashboards and partition-strategy
    analyses share (agg_histogram derives its buckets from the data;
    width_bucket pins them a priori, which is what makes results
    comparable ACROSS runs and datasets).

    The oracle implements the bucket function from its DEFINITION in
    pure integer arithmetic (DuckDB lacks the builtin) — the
    fn_luhn_check independence pattern: Spark's builtin is proven
    against the spec, not mirrored. Integer-cents input keeps every
    boundary exact (width_bucket on doubles has the usual edge
    hazards — the reason the op feeds it cents).
    """
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    return o.select(
        "o_orderkey",
        cents.alias("cents"),
        F.expr(
            f"CAST(width_bucket(CAST(round(o_totalprice * 100) AS BIGINT),"
            f" {WB_LO}, {WB_HI}, {WB_N}) AS BIGINT)"
        ).alias("bucket"),
    )


@op(
    "fn_explode_outer",
    oracle="""
    WITH digs AS (
        SELECT doc_id, regexp_extract_all(text, '[a-z]{8,}') AS ds
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN len(ds) = 0 THEN NULL ELSE unnest_d END AS long_word,
           CAST(len(ds) AS BIGINT) AS n_runs
    FROM (
        SELECT doc_id, ds, unnest(ds) AS unnest_d FROM digs
        WHERE len(ds) > 0
        UNION ALL
        SELECT doc_id, ds, NULL FROM digs WHERE len(ds) = 0
    )
    """,
    category=CAT,
)
def fn_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OUTER explode semantics: long words (≥8 letters)
    extracted per document, exploded row-per-run — but documents with
    NO matches (~1 in 5 docs here) survive as a single
    NULL row instead of vanishing (plain explode DROPS them,
    and a corpus audit that loses the no-match population
    under-reports by exactly the rows it most wanted to count).
    udtf_explode exercises inner explode; the _outer variant is the
    LEFT-JOIN-shaped row expansion every "extract and keep everyone"
    query needs.

    explode_outer is a JVM generator in the scan stage (zero
    shuffles, no UDF); the oracle spells the same semantics as
    unnest ∪ the empty-side complement — an independent formulation,
    so a dropped or duplicated no-match doc fails the hash. n_runs
    rides along to make the empty/non-empty split self-evident in
    the output.
    """
    d = load_table(spark, sf_dir, "documents")
    digs = d.select(
        "doc_id",
        F.expr("regexp_extract_all(text, '[a-z]{8,}', 0)").alias("ds"),
    )
    return digs.select(
        "doc_id",
        F.explode_outer("ds").alias("long_word"),
        F.size("ds").cast("bigint").alias("n_runs"),
    )


@op(
    "fn_listagg",
    oracle="""
    SELECT o_orderstatus,
           string_agg(o_orderpriority, '|' ORDER BY o_orderpriority)
               AS priorities,
           CAST(count(*) AS BIGINT) AS n_prio
    FROM (SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders)
    GROUP BY o_orderstatus
    """,
    category=CAT,
)
def fn_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG (SQL:2016, new in Spark 4.0) — ordered, delimited
    string aggregation: the distinct priorities seen per order
    status as one '|'-joined column, the denormalized summary cell
    every report and CSV export wants (agg_collect_sorted builds the
    same thing from array primitives; this is the STANDARD-SQL
    spelling a migrating Oracle/Snowflake/BigQuery user types, now
    executable verbatim).

    WITHIN GROUP (ORDER BY …) is mandatory under §2.X: an unordered
    LISTAGG is nondeterministic across partitions and would never
    hash-match — the deterministic form is also the only form worth
    migrating. The distinct pre-collapse keeps the cell bounded by
    the value domain, not the row count (an unbounded LISTAGG cell is
    an anti-pattern at 100 TB — bound it or use arrays), and
    sidesteps Spark 4.1's DISTINCT-inside-LISTAGG analyzer bug
    (ClassCastException on the WITHIN-GROUP sort order — found
    live; the pre-collapsed form is also the better plan).
    """
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("igis_orders_la")
    return spark.sql(
        """
        SELECT o_orderstatus,
               listagg(o_orderpriority, '|')
                   WITHIN GROUP (ORDER BY o_orderpriority) AS priorities,
               CAST(count(*) AS BIGINT) AS n_prio
        FROM (SELECT DISTINCT o_orderstatus, o_orderpriority
              FROM igis_orders_la)
        GROUP BY o_orderstatus
        """
    )


@op(
    "fn_uuid5_surrogate",
    oracle="""
    WITH h AS (
        SELECT c_custkey,
               md5('igis:customer:' || CAST(c_custkey AS VARCHAR)) AS hx
        FROM customer
    )
    SELECT c_custkey,
           substr(hx, 1, 8) || '-' || substr(hx, 9, 4) || '-5'
               || substr(hx, 14, 3) || '-'
               || CASE substr(hx, 17, 1)
                      WHEN '0' THEN '8' WHEN '1' THEN '9'
                      WHEN '2' THEN 'a' WHEN '3' THEN 'b'
                      WHEN '4' THEN '8' WHEN '5' THEN '9'
                      WHEN '6' THEN 'a' WHEN '7' THEN 'b'
                      WHEN '8' THEN '8' WHEN '9' THEN '9'
                      WHEN 'a' THEN 'a' WHEN 'b' THEN 'b'
                      WHEN 'c' THEN '8' WHEN 'd' THEN '9'
                      WHEN 'e' THEN 'a' ELSE 'b' END
               || substr(hx, 18, 3) || '-' || substr(hx, 21, 12)
               AS surrogate_uuid
    FROM h
    """,
    category=CAT,
)
def fn_uuid5_surrogate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Name-based (UUIDv5-style) SURROGATE KEYS: a stable UUID per
    customer derived from a namespace + natural key via md5, with the
    version nibble forced to 5 and the variant nibble folded into
    [89ab] — the deterministic identifier contract cross-system
    entity resolution needs (Spark's uuid() is RANDOM: §2.X bans it,
    and a re-run would re-key every row — exactly the bug stable
    surrogates exist to prevent; same registry-wide principle as
    corpus_split_hash's content-hash splits, applied to KEYS).

    Pure string projection in the scan stage (md5 + substr + one
    16-way CASE for the variant fold — both engines share every
    piece); zero shuffles, and the key is reproducible on any
    cluster, any engine, any day — which is the entire point.
    """
    c = load_table(spark, sf_dir, "customer")
    hx = F.md5(
        F.concat(F.lit("igis:customer:"), F.col("c_custkey").cast("string"))
    )
    h = c.select("c_custkey", hx.alias("hx"))
    variant = (
        F.when(F.substring("hx", 17, 1).isin("0", "4", "8", "c"), "8")
        .when(F.substring("hx", 17, 1).isin("1", "5", "9", "d"), "9")
        .when(F.substring("hx", 17, 1).isin("2", "6", "a", "e"), "a")
        .otherwise("b")
    )
    return h.select(
        "c_custkey",
        F.concat(
            F.substring("hx", 1, 8), F.lit("-"),
            F.substring("hx", 9, 4), F.lit("-5"),
            F.substring("hx", 14, 3), F.lit("-"),
            variant,
            F.substring("hx", 18, 3), F.lit("-"),
            F.substring("hx", 21, 12),
        ).alias("surrogate_uuid"),
    )


@op(
    "fn_slugify",
    oracle="""
    SELECT p_partkey,
           p_name,
           trim(BOTH '-' FROM regexp_replace(regexp_replace(lower(p_name),
                '[^a-z0-9]+', '-', 'g'), '-+', '-', 'g')) AS slug,
           CAST(len(trim(BOTH '-' FROM regexp_replace(regexp_replace(
                lower(p_name), '[^a-z0-9]+', '-', 'g'), '-+', '-', 'g')))
               AS BIGINT) AS slug_len
    FROM part
    """,
    category=CAT,
)
def fn_slugify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLUGIFY: part names → URL/filename-safe slugs (lowercase,
    non-alphanumeric runs collapsed to single hyphens, edges
    trimmed) — the id-from-title transform every content pipeline,
    catalog URL, and artifact naming scheme carries
    (fn_uuid5_surrogate keys on an OPAQUE hash; the slug is the
    HUMAN-readable sibling, and production systems emit both).

    Pure regexp projection in the scan stage; the two-stage replace
    (class→hyphen, then hyphen-run collapse) plus edge trim is
    spelled identically in both engines (Spark regexp_replace is
    global by default, DuckDB needs the explicit 'g' — the §2.G
    dialect note, exercised here in the other direction from
    text_pii_mask).
    """
    p = load_table(spark, sf_dir, "part")
    slug = F.expr(
        "trim(BOTH '-' FROM regexp_replace(regexp_replace(lower(p_name),"
        " '[^a-z0-9]+', '-'), '-+', '-'))"
    )
    return p.select(
        "p_partkey",
        "p_name",
        slug.alias("slug"),
        F.length(slug).cast("bigint").alias("slug_len"),
    )


AES_KEY = "0123456789abcdef"  # 16-byte demo key; a real deployment injects it


@op(
    "fn_aes_roundtrip",
    oracle="""
    SELECT doc_id,
           text AS decrypted,
           CAST((strlen(text) // 16 + 1) * 16 AS BIGINT) AS ct_len
    FROM documents
    ORDER BY doc_id
    """,
    category=CAT,
)
def fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption surface: AES-ECB/PKCS encrypt →
    decrypt roundtrip over document text plus the predicted
    ciphertext length — the at-rest PII protection primitive
    (text_pii_mask REDACTS irreversibly; encryption is the
    reversible sibling for columns that must round-trip through an
    untrusted store and come back bit-exact).

    The oracle is the IDENTITY relation: decrypt(encrypt(x)) must
    equal the source column byte-for-byte (UTF-8 multilingual text
    included), and ct_len must equal the PKCS#7 prediction
    (⌊bytes/16⌋+1)·16 — so DuckDB needs no AES at all, the roundtrip
    LAW is what's checked. ECB is chosen BECAUSE it is deterministic
    (GCM's random IV breaks both re-runs and the hash gate — the
    §2.X no-rand rule applied to crypto; real pipelines wanting
    semantic security pay nondeterminism knowingly). Pure projection
    in the scan stage, zero shuffles, JVM-native codegen.
    """
    docs = load_table(spark, sf_dir, "documents")
    enc = F.expr(f"aes_encrypt(text, '{AES_KEY}', 'ECB', 'PKCS')")
    dec = F.expr(
        f"CAST(aes_decrypt(aes_encrypt(text, '{AES_KEY}', 'ECB', 'PKCS'),"
        f" '{AES_KEY}', 'ECB', 'PKCS') AS STRING)"
    )
    return docs.select(
        "doc_id",
        dec.alias("decrypted"),
        F.octet_length(enc).cast("bigint").alias("ct_len"),
    ).orderBy("doc_id")


TS_FORMATS = ("yyyy/MM/dd HH:mm:ss", "dd-MM-yyyy HH:mm:ss", "yyyyMMdd'T'HHmmss")


@op(
    "fn_timestamp_parse_multi",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey % 3 AS INTEGER) AS fmt_id,
           o_orderdate AS parsed,
           true AS roundtrip_ok
    FROM orders ORDER BY o_orderkey
    """,
    category=CAT,
)
def fn_timestamp_parse_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-format timestamp ingestion waterfall: each order's date
    is FORMATTED into one of three source conventions (slash, dashed
    day-first, compact ISO-basic — chosen per row) and then parsed
    back through a `coalesce(try_to_timestamp(s, f₁), …)` chain —
    the standard tolerant-ingest pattern for feeds where every
    upstream system stamps dates its own way (try_to_timestamp
    returns NULL instead of erroring per format, so the chain falls
    through to the right parser; a single-format to_timestamp either
    crashes the batch or silently nulls two-thirds of it).

    Law-style oracle (fn_aes_roundtrip pattern): format∘parse must
    be the IDENTITY on every row and the declared relation IS the
    identity — DuckDB reimplements nothing. The parsed value is cast
    back to TIMESTAMP_NTZ (to_timestamp yields LTZ; the loader pins
    UTC so the cast is value-preserving — the ADVICE.md hazard
    handled at the op). Pure scan-stage projection, zero shuffles.
    """
    o = load_table(spark, sf_dir, "orders")
    fmt_id = (F.col("o_orderkey") % 3).cast("int")
    s = (
        F.when(fmt_id == 0, F.date_format("o_orderdate", TS_FORMATS[0]))
        .when(fmt_id == 1, F.date_format("o_orderdate", TS_FORMATS[1]))
        .otherwise(F.date_format("o_orderdate", TS_FORMATS[2]))
    )
    parsed = F.coalesce(
        *[F.try_to_timestamp(s, F.lit(f)) for f in TS_FORMATS]
    ).cast("timestamp_ntz")
    return o.select(
        "o_orderkey",
        fmt_id.alias("fmt_id"),
        parsed.alias("parsed"),
        (parsed == F.col("o_orderdate")).alias("roundtrip_ok"),
    ).orderBy("o_orderkey")


NATSORT_PAD = 8


@op(
    "fn_natural_sort_key",
    oracle=f"""
    WITH srcs AS (SELECT DISTINCT source FROM documents),
    keyed AS (
        SELECT source,
               regexp_replace(
                   regexp_replace(source, '(\\d+)',
                                  '{"0" * NATSORT_PAD}\\1', 'g'),
                   '0*(\\d{{{NATSORT_PAD}}})', '\\1', 'g') AS nat_key
        FROM srcs
    )
    SELECT source, nat_key,
           CAST(row_number() OVER (ORDER BY source) AS BIGINT) AS lex_rank,
           CAST(row_number() OVER (ORDER BY nat_key) AS BIGINT)
               AS natural_rank
    FROM keyed
    ORDER BY source
    """,
    category=CAT,
)
def fn_natural_sort_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Natural (numeric-aware) sort keys: every digit run zero-padded
    to {NATSORT_PAD} so 'src2' sorts before 'src10' — the versioned-
    name ordering fix (lexical order interleaves src1, src10, src11,
    src2 …; every file listing, partition list and shard manifest
    with embedded numbers hits this, and BOTH rank columns are
    emitted so the disagreement between lexical and natural order IS
    the visible finding).

    The key is a pure regexp projection (scan-stage, shuffle-free);
    rank windows run over the distinct-source dim. Neither engine
    has replace-with-callback, so the padding is the classic
    two-step regexp chain (prefix every digit run with {NATSORT_PAD}
    zeros, then keep each run's last {NATSORT_PAD} chars) — written
    once per dialect and hash-proven equal; runs longer than
    {NATSORT_PAD} digits are the stated precision bound.
    """
    docs = load_table(spark, sf_dir, "documents")
    srcs = docs.select("source").distinct()
    # Spark: no callback replace — pad digit runs via two-step:
    # prefix every digit run with zeros to >= PAD chars, then trim
    # each run to its LAST {NATSORT_PAD} chars.
    pad = "0" * NATSORT_PAD
    keyed = srcs.select(
        "source",
        F.regexp_replace(
            F.regexp_replace(F.col("source"), r"(\d+)", pad + r"$1"),
            r"0*(\d{" + str(NATSORT_PAD) + r"})",
            r"$1",
        ).alias("nat_key"),
    )
    return keyed.select(
        "source",
        "nat_key",
        F.row_number().over(Window.orderBy("source")).cast("bigint").alias("lex_rank"),
        F.row_number()
        .over(Window.orderBy("nat_key"))
        .cast("bigint")
        .alias("natural_rank"),
    ).orderBy("source")


SPARK_BARS = "▁▂▃▄▅▆▇█"


@op(
    "fn_text_sparkline",
    oracle=f"""
    WITH hourly AS (
        SELECT event_type AS et,
               CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS hr,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ), bounds AS (
        SELECT et, CAST(min(c) AS BIGINT) AS lo, CAST(max(c) AS BIGINT) AS hi
        FROM hourly GROUP BY et
    ), lvl AS (
        SELECT h.et, h.hr,
               substr('{SPARK_BARS}',
                      CAST(1 + CASE WHEN b.hi = b.lo THEN 0
                               ELSE ((h.c - b.lo) * 7) // (b.hi - b.lo)
                               END AS INTEGER), 1) AS bar
        FROM hourly h JOIN bounds b ON b.et = h.et
    )
    SELECT et, string_agg(bar, '' ORDER BY hr) AS sparkline,
           CAST(count(*) AS BIGINT) AS n_hours
    FROM lvl GROUP BY et ORDER BY et
    """,
    category=CAT,
)
def fn_text_sparkline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode sparklines: each event type's 24-hour volume profile
    rendered as a ▁▂▃▄▅▆▇█ string — the terminal-dashboard /
    alert-message rendering primitive (a pager line carrying
    '▂▁▁▂▅█▇▆' communicates the WHOLE shape where a number cannot;
    ts_seasonality_profile emits the same data as rows — this is
    its presentation form, and shipping it as a QUERY keeps chart
    and data from drifting).

    Levels are exact integer buckets ((c−lo)·7 div (hi−lo), the
    flat-profile hi=lo branch stated), so the glyph choice can never
    disagree between engines; glyph pick is a 1-char substr into a
    multibyte literal — exercising CHARACTER (not byte) substring
    semantics in both engines, which is its own portability check.
    Assembly is an ORDERED string_agg / array_join over the 24-row
    per-type frame.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.col("event_type").alias("et"), F.hour("ts").alias("hr")
    ).agg(F.count("*").cast("bigint").alias("c"))
    bounds = hourly.groupBy("et").agg(
        F.min("c").cast("bigint").alias("lo"),
        F.max("c").cast("bigint").alias("hi"),
    )
    lvl = hourly.join(bounds, "et").select(
        "et",
        "hr",
        F.substring(
            F.lit(SPARK_BARS),
            (
                1
                + F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
                    F.expr("((c - lo) * 7) div (hi - lo)")
                )
            ).cast("int"),
            1,
        ).alias("bar"),
    )
    return (
        lvl.groupBy("et")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct(F.col("hr"), F.col("bar")))
                ).getField("bar"),
                "",
            ).alias("sparkline"),
            F.count("*").cast("bigint").alias("n_hours"),
        )
        .orderBy("et")
    )


@op(
    "fn_base64_roundtrip",
    oracle="""
    SELECT doc_id,
           text AS decoded,
           CAST(4 * ((strlen(text) + 2) // 3) AS BIGINT) AS b64_len
    FROM documents ORDER BY doc_id
    """,
    category=CAT,
)
def fn_base64_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """base64 encode→decode roundtrip plus the RFC 4648 length law
    (4·⌈n/3⌉ with padding) — the binary-over-text transport
    primitive (every JSON/CSV hop that must carry bytes uses it;
    the roundtrip law is what certifies the pair, and the LENGTH
    law catches the classic integration bug — a peer emitting
    UNPADDED base64 that decodes fine locally and breaks fixed-
    width consumers downstream).

    Law-style oracle (fn_aes_roundtrip pattern): decode(encode(x))
    must be the identity on UTF-8 multilingual text and the encoded
    octet length must equal the closed form — DuckDB reimplements
    neither codec. NOTE Spark's base64() inserts RFC 2045 line
    breaks at 76 chars in some lineages — measuring octet_length on
    the UNchunked value (replace newline first) is part of the law,
    stated here because it IS the portability trap. Pure scan-stage
    projection.
    """
    docs = load_table(spark, sf_dir, "documents")
    enc = F.regexp_replace(
        F.base64(F.col("text").cast("binary")), "[\\r\\n]", ""
    )
    dec = F.unbase64(enc).cast("string")
    return docs.select(
        "doc_id",
        dec.alias("decoded"),
        F.octet_length(enc).cast("bigint").alias("b64_len"),
    ).orderBy("doc_id")


@op(
    "fn_split_regex_vs_literal",
    oracle="""
    WITH paths AS (
        SELECT n.n_nationkey AS nk,
               r.r_name || '.' || n.n_name AS dotted
        FROM nation n JOIN region r ON r.r_regionkey = n.n_regionkey
    )
    SELECT nk, dotted,
           string_split(dotted, '.')[1] AS region_part,
           string_split(dotted, '.')[2] AS nation_part,
           CAST(len(string_split(dotted, '.')) AS INTEGER) AS n_parts
    FROM paths ORDER BY nk
    """,
    category=CAT,
)
def fn_split_regex_vs_literal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The split-on-dot trap, demonstrated and defused: Spark's
    `split` takes a REGEX (an unescaped '.' matches every character
    and shreds the string into empties) while DuckDB's
    `string_split` takes a LITERAL — one of the most-filed real-world
    Spark bugs because the two-argument call LOOKS identical across
    engines and differs silently. The op builds dotted
    'REGION.nation' paths and splits them correctly on BOTH sides —
    Spark with the escaped `\\.` pattern, DuckDB with the literal —
    and the hash match is the proof the escaping is right (an
    unescaped Spark pattern yields 26 empty parts and fails the
    gate instantly, which is this op's regression value).

    Pure scan-stage projection over the broadcast-joined dims;
    n_parts is published so the degenerate-split failure mode is
    visible as a number, not just a wrong string.
    """
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    paths = n.join(F.broadcast(r), r.r_regionkey == n.n_regionkey).select(
        F.col("n_nationkey").alias("nk"),
        F.concat(F.col("r_name"), F.lit("."), F.col("n_name")).alias("dotted"),
    )
    parts = F.split(F.col("dotted"), r"\.")
    return paths.select(
        "nk",
        "dotted",
        parts.getItem(0).alias("region_part"),
        parts.getItem(1).alias("nation_part"),
        F.size(parts).cast("int").alias("n_parts"),
    ).orderBy("nk")


# Haversine band thresholds, precomputed in Q-space (integer micro-units
# of the haversine kernel h = sin²(Δφ/2)+cosφ₁cosφ₂sin²(Δλ/2)) so band
# membership is an INTEGER compare in both engines:
#   q_T = floor(sin²(d_km / (2R)) · 10⁶ + 0.5)  for d ∈ {1000,2500,5000,10000}
HAV_R_KM = 6371.0088
HAV_QT = {1000: 6147, 2500: 38004, 5000: 146237, 10000: 499407}


@op(
    "fn_haversine",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey,
        ((c_custkey * 37) % 18000) / 100.0 - 90.0 AS lat1,
        ((c_custkey * 73) % 36000) / 100.0 - 180.0 AS lon1,
        ((c_nationkey * 41 + 7) % 18000) / 100.0 - 90.0 AS lat2,
        ((c_nationkey * 97 + 13) % 36000) / 100.0 - 180.0 AS lon2
      FROM customer),
    hq AS (
      SELECT c_custkey,
        CAST(floor((sin(radians(lat2 - lat1) / 2) ^ 2
          + cos(radians(lat1)) * cos(radians(lat2))
            * sin(radians(lon2 - lon1) / 2) ^ 2) * 1000000 + 0.5)
          AS BIGINT) AS q
      FROM pts),
    banded AS (
      SELECT q, CASE WHEN q < {HAV_QT[1000]} THEN '0_under_1000km'
                     WHEN q < {HAV_QT[2500]} THEN '1_1000_2500km'
                     WHEN q < {HAV_QT[5000]} THEN '2_2500_5000km'
                     WHEN q < {HAV_QT[10000]} THEN '3_5000_10000km'
                     ELSE '4_over_10000km' END AS band
      FROM hq)
    SELECT band, CAST(count(*) AS BIGINT) AS n,
           CAST(min(q) AS BIGINT) AS min_q, CAST(max(q) AS BIGINT) AS max_q,
           round(2 * {HAV_R_KM} * asin(sqrt(min(q) / 1000000.0)), 3) AS km_min,
           round(2 * {HAV_R_KM} * asin(sqrt(max(q) / 1000000.0)), 3) AS km_max
    FROM banded GROUP BY band ORDER BY band
    """,
    category=CAT,
)
def fn_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trig family themed query: great-circle (haversine) distance
    banding between key-derived coordinate pairs — radians/sin/cos/
    sqrt/asin exercised end-to-end, the geo-distance primitive behind
    shipping-radius and nearest-facility analytics (join_spatial_grid
    buckets by coordinates; this measures the sphere distance itself).

    Cross-engine trig determinism (the reason a naive version can't
    hash-match): libm sin/cos differ between engines in the last ulp,
    so per-row floats are quantized the instant trig output exists —
    the haversine KERNEL h∈[0,1] goes to integer micro-units q =
    floor(h·10⁶+0.5) (quantization step dwarfs any ulp disagreement;
    ts_periodogram_quantized's trick), band edges are PRECOMPUTED
    integer literals in q-space (membership = integer compare, never
    a float compare), and asin/sqrt run only per BAND on the already-
    agreed integer min/max (5 calls, not 10⁵; round-3 km display
    absorbs their ulp). Counts/min/max are exact; everything is one
    scan + one 5-group aggregate, no shuffle beyond the rollup.
    Coordinates are key-derived exact rationals (integer % then /100),
    bit-identical in any engine.
    """
    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey",
        (((F.col("c_custkey") * 37) % 18000) / 100.0 - 90.0).alias("lat1"),
        (((F.col("c_custkey") * 73) % 36000) / 100.0 - 180.0).alias("lon1"),
        (((F.col("c_nationkey") * 41 + 7) % 18000) / 100.0 - 90.0).alias("lat2"),
        (((F.col("c_nationkey") * 97 + 13) % 36000) / 100.0 - 180.0).alias("lon2"),
    )
    half_dlat = F.radians(F.col("lat2") - F.col("lat1")) / 2
    half_dlon = F.radians(F.col("lon2") - F.col("lon1")) / 2
    h = (
        F.sin(half_dlat) * F.sin(half_dlat)
        + F.cos(F.radians("lat1"))
        * F.cos(F.radians("lat2"))
        * F.sin(half_dlon)
        * F.sin(half_dlon)
    )
    hq = pts.select(
        "c_custkey", F.floor(h * 1000000 + 0.5).cast("bigint").alias("q")
    )
    band = (
        F.when(F.col("q") < HAV_QT[1000], "0_under_1000km")
        .when(F.col("q") < HAV_QT[2500], "1_1000_2500km")
        .when(F.col("q") < HAV_QT[5000], "2_2500_5000km")
        .when(F.col("q") < HAV_QT[10000], "3_5000_10000km")
        .otherwise("4_over_10000km")
    )
    def km(qcol):
        return F.round(
            2 * HAV_R_KM * F.asin(F.sqrt(qcol / 1000000.0)), 3
        )
    return (
        hq.select(F.col("q"), band.alias("band"))
        .groupBy("band")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min("q").cast("bigint").alias("min_q"),
            F.max("q").cast("bigint").alias("max_q"),
        )
        .select(
            "band", "n", "min_q", "max_q",
            km(F.col("min_q")).alias("km_min"),
            km(F.col("max_q")).alias("km_max"),
        )
        .orderBy("band")
    )


TZ_ZONES = ("Asia/Tokyo", "America/New_York", "Europe/Berlin")


@op(
    "fn_timezone_convert",
    oracle=f"""
    WITH z AS (SELECT unnest({list(TZ_ZONES)}) AS zone),
    local_ts AS (
        SELECT z.zone,
               extract(hour FROM (CAST(e.ts AS TIMESTAMP)
                       AT TIME ZONE 'UTC' AT TIME ZONE z.zone)) AS local_hour,
               CAST(e.ts AS DATE) AS utc_day,
               CAST((CAST(e.ts AS TIMESTAMP)
                     AT TIME ZONE 'UTC' AT TIME ZONE z.zone) AS DATE)
                   AS local_day
        FROM events e CROSS JOIN z)
    SELECT zone, CAST(local_hour AS INT) AS local_hour,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN local_day <> utc_day THEN 1 ELSE 0 END)
                AS BIGINT) AS n_day_shifted
    FROM local_ts GROUP BY 1, 2 ORDER BY 1, 2
    """,
    category=CAT,
)
def fn_timezone_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone conversion family (from_utc_timestamp over IANA
    zones): hour-of-day activity histograms per market timezone plus
    the count of events whose LOCAL calendar day differs from the UTC
    day — the date-boundary shift that silently corrupts every 'daily'
    metric the moment a dashboard is read in local time (a Tokyo
    morning is still UTC yesterday; ~37% of events here shift days in
    at least one zone, measured not assumed).

    Cross-engine parity is a tzdata statement: Spark's
    from_utc_timestamp and DuckDB's double AT TIME ZONE hop resolve
    through the same IANA database (probed equal on all three zones
    before declaring; a tzdata VERSION skew between engines would
    hash-fail — which is exactly what you want a portability gate to
    catch, because it would corrupt real dashboards the same way).
    Plan: zone list is a 3-row broadcast cross join evaluated in the
    scan stage; integer counts only.
    """
    ev = load_table(spark, sf_dir, "events")
    zones = spark.createDataFrame([(z,) for z in TZ_ZONES], "zone string")
    local = ev.crossJoin(F.broadcast(zones)).select(
        "zone",
        F.hour(F.from_utc_timestamp("ts", F.col("zone"))).alias("local_hour"),
        F.to_date("ts").alias("utc_day"),
        F.to_date(F.from_utc_timestamp("ts", F.col("zone"))).alias("local_day"),
    )
    return (
        local.groupBy("zone", "local_hour")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(
                F.when(F.col("local_day") != F.col("utc_day"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_day_shifted"),
        )
        .select("zone", F.col("local_hour").cast("int").alias("local_hour"),
                "n", "n_day_shifted")
        .orderBy("zone", "local_hour")
    )
