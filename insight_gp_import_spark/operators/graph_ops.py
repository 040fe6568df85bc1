"""Graph operators over relationally-derived edge sets (SURVEY.md §2.K).

The engine's graph surface follows the Pregel-on-relations model
(Malewicz et al., SIGMOD'10, as Spark expresses it): an edge DataFrame
plus iterated join-aggregate supersteps — no graph library, no RDDs.
dedup_cluster / dedup_cluster_bigstar (connected components) live with
the dedup family; this module holds the ranking side.

Determinism protocol for iterative float algorithms: we DON'T iterate
floats. Ranks are fixed-point integers (micro-rank, scale 10¹²) and
every superstep is integer division + integer sums — bit-identical in
any engine and any aggregation order, which is how the DuckDB oracle
can hash-match a 3-superstep walk exactly (§2.X taken to its logical
end; real web-scale systems use fixed-point for the same reason —
float PageRank is not associative-reduction-safe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from insight_gp_import_spark.registry import op
from insight_gp_import_spark.tables import load_table

CAT = "graph"

PR_SCALE = 10**12  # total rank mass, in micro-rank units
PR_ITERS = 3
PR_TOP_K = 20
# damping 0.85 as the exact rational 17/20
PR_D_NUM, PR_D_DEN = 17, 20


def _pr_iter_sql(prev: str, t: int) -> str:
    """One fixed-point PageRank superstep as a DuckDB CTE body."""
    return f"""
        SELECT e.dst AS node,
               (3 * {PR_SCALE}) // (20 * (SELECT nn FROM n_nodes))
               + ({PR_D_NUM} * CAST(sum(r.rank // r.deg) AS BIGINT)) // {PR_D_DEN}
                   AS rank
        FROM edges e
        JOIN (SELECT p.node, p.rank, d.deg
              FROM {prev} p JOIN deg d ON p.node = d.node) r
          ON e.src = r.node
        GROUP BY e.dst
    """


@op(
    "graph_pagerank_unrolled",
    oracle=f"""
    WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM d a JOIN d b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ),
    edges AS (SELECT src, dst FROM pairs),
    deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
            FROM edges GROUP BY src),
    n_nodes AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM deg),
    r0 AS (SELECT node, {PR_SCALE} // (SELECT nn FROM n_nodes) AS rank
           FROM deg),
    r1 AS ({_pr_iter_sql("r0", 1)}),
    r2 AS ({_pr_iter_sql("r1", 2)}),
    r3 AS ({_pr_iter_sql("r2", 3)})
    SELECT node, rank
    FROM r3
    ORDER BY rank DESC, node
    LIMIT {PR_TOP_K}
    """,
    category=CAT,
)
def graph_pagerank_unrolled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the co-purchase part graph, {PR_ITERS} supersteps,
    top-{PR_TOP_K} hubs — "which parts anchor the basket graph", the
    ranking twin of dedup_cluster's component labelling.

    Edges are the symmetric distinct co-purchase pairs (self-join on
    l_orderkey: expansion is quadratic in ORDER SIZE only, as in
    join_copurchase_pairs). Each superstep is one join-aggregate built
    into a SINGLE unrolled plan — the loop runs at plan-build time in
    Python, the DATA never leaves the engine and nothing is collected.

    Fixed-point arithmetic end to end: ranks are micro-rank BIGINTs
    (scale 10¹²), the damped update is
        r' = (3·S)/(20·N) + (17·Σ(r/deg))/20
    in pure integer division — no float exists at ANY step, so the
    result is bit-identical regardless of engine, partitioning, or
    aggregation order (float PageRank can't hash-match across engines;
    fixed-point is also the production answer at 100 TB, where
    non-associative float reduction makes runs unreproducible).

    Scale shape: edges partition by src once and every superstep
    reuses that partitioning for the join (one shuffle per superstep
    on dst for the aggregate); degree and N are computed once. For
    many more supersteps, localCheckpoint every ~5 to cut lineage —
    the dedup_cluster pattern.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("deg")
    )
    n_nodes = deg.agg(F.count("*").alias("nn"))
    ranks = deg.crossJoin(F.broadcast(n_nodes)).select(
        "node", F.expr(f"{PR_SCALE} div nn").alias("rank")
    )
    for _ in range(PR_ITERS):
        contrib = (
            edges.join(
                ranks.join(deg, "node").select(
                    F.col("node").alias("src"),
                    F.expr("rank div deg").alias("c"),
                )
            , "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("s"))
        )
        ranks = contrib.crossJoin(F.broadcast(n_nodes)).select(
            "node",
            F.expr(
                f"(3 * {PR_SCALE}) div (20 * nn)"
                f" + ({PR_D_NUM} * s) div {PR_D_DEN}"
            ).alias("rank"),
        )
    return ranks.orderBy(F.desc("rank"), "node").limit(PR_TOP_K)
