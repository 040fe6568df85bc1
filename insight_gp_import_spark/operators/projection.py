"""Projection / filter / predicate operators (SURVEY.md §2.B).

The reference's load path projects and casts CSV columns into typed
table columns; the analytic equivalents here are declarative selects
and filters that Catalyst pushes down into the parquet scan (verify
with ``.explain``: PushedFilters + pruned ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from insight_gp_import_spark.registry import op
from insight_gp_import_spark.tables import load_table

CAT = "projection"


@op(
    "project_compute",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 4) AS disc_price,
           ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge
    FROM lineitem
    """,
    category=CAT,
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select + alias + arithmetic derived columns.

    Rounding width matters per-row: price(2dp) × (1-disc(2dp)) has
    exactly 4 decimal digits, so round(…,4) is tie-free in both engines.
    round(…,2) would land on .xx5 half-ulp ties where Spark and DuckDB
    disagree (observed locally) — per-row rounds must use the expression's
    exact decimal width; only *aggregated* doubles tolerate coarser
    rounding (§2.X rule 1).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "disc_price"
        ),
        F.round(
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax")),
            6,
        ).alias("charge"),
    )


@op(
    "filter_compound",
    oracle="""
    SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 2) AS price
    FROM orders
    WHERE (o_orderstatus = 'F' AND o_totalprice > 150000)
       OR (o_orderstatus = 'O' AND NOT o_totalprice >= 50000)
    """,
    category=CAT,
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT with numeric + string comparisons (pushed to the scan)."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 150000))
        | ((F.col("o_orderstatus") == "O") & ~(F.col("o_totalprice") >= 50000))
    ).select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("price"),
    )


@op(
    "filter_in_between_like",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, ROUND(c_acctbal, 2) AS acctbal
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
      AND c_acctbal BETWEEN 1000 AND 8000
      AND c_name LIKE '%1%'
    """,
    category=CAT,
)
def filter_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """isin / between / like predicates."""
    c = load_table(spark, sf_dir, "customer")
    return c.filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
        & F.col("c_acctbal").between(1000, 8000)
        & F.col("c_name").like("%1%")
    ).select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("acctbal"),
    )


@op(
    "filter_null_semantics",
    oracle="""
    SELECT o_orderkey,
           nullif(o_orderstatus, 'P') IS NULL AS was_p,
           nullif(o_orderstatus, 'P') IS NOT DISTINCT FROM 'F' AS eq_f
    FROM orders
    WHERE nullif(o_orderstatus, 'P') IS NULL OR nullif(o_orderstatus, 'P') = 'F'
    """,
    category=CAT,
)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS [NOT] NULL + null-safe equality (<=> ≡ IS NOT DISTINCT FROM).

    The corpus has no NULLs, so they are introduced with nullif —
    the same trick both engines share.
    """
    o = load_table(spark, sf_dir, "orders")
    status_n = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return o.filter(status_n.isNull() | (status_n == "F")).select(
        "o_orderkey",
        status_n.isNull().alias("was_p"),
        status_n.eqNullSafe(F.lit("F")).alias("eq_f"),
    )


@op(
    "distinct_project",
    oracle="""
    SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
    """,
    category=CAT,
)
def distinct_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT on a projection (partial-dedup before shuffle)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_nationkey", "c_mktsegment").distinct()


@op(
    "sample_deterministic",
    oracle="""
    SELECT l_orderkey, l_linenumber, ROUND(l_quantity, 2) AS qty
    FROM lineitem
    WHERE substring(md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)), 1, 1) < '4'
    """,
    category=CAT,
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-portable deterministic ~25% sample.

    Never ``df.sample`` in oracled ops — RNG streams differ across
    engines (§2.X rule 5). md5 of the composite key is identical
    everywhere (probe-2) and keeps the sample stable at any scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    key = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit("-"),
        F.col("l_linenumber").cast("string"),
    )
    return li.filter(F.substring(F.md5(key), 1, 1) < "4").select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_quantity", 2).alias("qty"),
    )


STRATUM_N = 20  # docs kept per language


@op(
    "sample_stratified",
    oracle=f"""
    SELECT lang, doc_id, n_chars
    FROM documents
    QUALIFY row_number() OVER (
        PARTITION BY lang
        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
    ) <= {STRATUM_N}
    """,
    category=CAT,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: exactly min(N, |stratum|) docs
    per language — the balanced-corpus subsampling step of a training
    pipeline (uniform sampling reproduces the majority-language skew;
    per-stratum quotas don't).

    md5-of-key ordering gives an unbiased-but-reproducible pick
    (§2.X rule 5: never df.sample / rand in oracled ops); doc_id
    tie-break makes the window total. One shuffle on lang; at scale
    swap row_number for a per-partition heap via the same window —
    Spark already stops consuming each partition after N rows here
    (WindowGroupLimit pushes the limit into the sort).
    """
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("lang", "doc_id", "n_chars")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= STRATUM_N)
        .drop("rk")
    )


RESERVOIR_K = 50
_HEX16 = "0123456789abcdef"


@op(
    "sample_weighted_reservoir",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, n_chars,
               md5('wres:' || CAST(doc_id AS VARCHAR)) AS hx
        FROM documents
    ), scored AS (
        SELECT doc_id, n_chars,
               -- exact 16-bit uniform in (0,1]: (k+1)/65536
               round(pow((({" + ".join(
                   f"(strpos('{_HEX16}', substr(hx, {i + 1}, 1)) - 1) * {16 ** (3 - i)}"
                   for i in range(4))}) + 1) / 65536.0,
                   1.0 / n_chars), 9) AS wkey
        FROM keyed
    )
    SELECT doc_id, n_chars, wkey
    FROM scored
    ORDER BY wkey DESC, doc_id
    LIMIT {RESERVOIR_K}
    """,
    category=CAT,
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED sampling without replacement (Efraimidis–Spirakis
    A-Res): each doc scored u^(1/w) with u a content-hash uniform and
    w = n_chars, top-{RESERVOIR_K} by score — inclusion probability
    proportional to length, the standard char-budget-fair corpus
    sample (sample_deterministic draws UNIFORMLY, so a 50-char doc
    and a 5000-char doc are equally likely and short docs dominate
    any token budget; A-Res is the one-pass distributed fix, and
    md5-for-RNG makes it reproducible per §2.X rule 5).

    u = (k16+1)/2¹⁶ — an EXACT dyadic rational in (0,1], never 0 so
    the pow is total; the only cross-engine hazard is pow's last ulp,
    killed by rounding the key at 9 BEFORE the rank with the doc_id
    tie-break (rule 2). One scan projection + TakeOrdered — no
    shuffle beyond the K-selection, the reservoir property that makes
    this THE weighted sampler at 100 TB.
    """
    d = load_table(spark, sf_dir, "documents")
    hx = F.md5(F.concat(F.lit("wres:"), F.col("doc_id").cast("string")))
    digs = [
        (F.instr(F.lit(_HEX16), F.substring(hx, i + 1, 1)) - 1)
        * (16 ** (3 - i))
        for i in range(4)
    ]
    u = (digs[0] + digs[1] + digs[2] + digs[3] + 1) / F.lit(65536.0)
    wkey = F.round(F.pow(u, 1.0 / F.col("n_chars")), 9)
    return (
        d.select("doc_id", "n_chars", wkey.alias("wkey"))
        .orderBy(F.desc("wkey"), "doc_id")
        .limit(RESERVOIR_K)
    )


_SYS_HEX = "0123456789abcdef"
SYS_STRIDE = 10


@op(
    "sample_systematic",
    oracle=f"""
    WITH keyed AS (
      SELECT event_id,
             md5('sys:' || CAST(event_id AS VARCHAR)) AS mk FROM events),
    b AS (SELECT *, strpos('{_SYS_HEX}', substr(mk, 1, 1)) - 1 AS bucket
          FROM keyed),
    rn AS (SELECT *, row_number() OVER (PARTITION BY bucket
                                        ORDER BY mk, event_id) AS r FROM b)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_sampled,
           CAST(min(event_id) AS BIGINT) AS first_id,
           CAST(sum(event_id) AS BIGINT) AS id_checksum
    FROM rn WHERE r % {SYS_STRIDE} = 1
    GROUP BY bucket ORDER BY bucket
    """,
    category=CAT,
)
def sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic (every k-th) sampling in hash order — the fourth
    sampling design next to Bernoulli (sample_deterministic),
    stratified (sample_stratified) and weighted reservoir: EXACTLY
    ⌈n/k⌉ rows per bucket by construction (Bernoulli's rate is only
    an expectation — its realized size varies; auditors and fixed-
    budget evals want the guarantee), unbiased because the order is a
    salted md5, i.e. independent of every payload attribute.

    Distributed shape: the stride needs ROW POSITION, which is only
    well-defined under an order — so the corpus is bucketed by the
    hash's first nibble (16 shuffle-partition-friendly groups) and
    the row_number window runs PER BUCKET (never a global
    single-partition window — the §2.X plan rule); each bucket
    yields its own every-k-th rows, preserving the exact-count and
    independence properties per bucket. Summarized per bucket with
    an id checksum so the driver hash certifies the SELECTED SET,
    not just its size.
    """
    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(
        "event_id",
        F.md5(F.concat(F.lit("sys:"), F.col("event_id").cast("string"))).alias(
            "mk"
        ),
    )
    b = keyed.select(
        "event_id",
        "mk",
        (F.instr(F.lit(_SYS_HEX), F.substring("mk", 1, 1)) - 1).alias("bucket"),
    )
    w = Window.partitionBy("bucket").orderBy("mk", "event_id")
    rn = b.select("*", F.row_number().over(w).alias("r"))
    return (
        rn.filter(F.col("r") % SYS_STRIDE == 1)
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_sampled"),
            F.min("event_id").cast("bigint").alias("first_id"),
            F.sum("event_id").cast("bigint").alias("id_checksum"),
        )
        .select(F.col("bucket").cast("bigint").alias("bucket"),
                "n_sampled", "first_id", "id_checksum")
        .orderBy("bucket")
    )
