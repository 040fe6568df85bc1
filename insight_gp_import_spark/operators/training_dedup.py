"""Scale-path dedup and similarity-search operators: SimHash, embedding
cosine near-dup, and IVF-style ANN.

Together with llm.py's exact/jaccard/minhash family this completes the
dedup toolbox a training-data pipeline needs:

- exact (hash groupBy)           → llm.dedup_exact
- token-set jaccard, exact       → llm.dedup_near_jaccard
- MinHash+LSH (set similarity)   → llm.dedup_near_minhash
- SimHash (weighted fingerprint) → dedup_simhash (here)
- embedding cosine               → dedup_embed_cosine (here)
- ANN search                     → ann_ivf_topk (here) vs brute-force
                                   llm.sim_search_topk
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from insight_gp_import_spark.operators.llm import (
    QUERY_VEC_ID,
    TOPK,
    _dot,
    _fetch_query_vector,
    _lit_vec_sql,
    _norm,
)
from insight_gp_import_spark.registry import op
from insight_gp_import_spark.tables import load_table

CAT = "training-dedup"

SIMHASH_BITS = 64
SIMHASH_BANDS = 4  # 16 bits per band
SIMHASH_MAX_HAMMING = 3


@op("dedup_simhash", oracle=None, category=CAT)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (rows-only: xxhash64 has no DuckDB twin).

    Per doc: 64-bit fingerprint where bit b = sign of Σ_tokens ±1
    (the sign taken from bit b of xxhash64(token)). Near-dups =
    fingerprints within Hamming distance ≤ 3, found by LSH banding on
    16-bit quarters (any identical quarter → candidate; a pair with
    hamming ≤ 3 differs in ≤ 3 quarters, so ≥ 1 matches — banding is
    LOSSLESS at this threshold, unlike MinHash banding).

    One exploded-token aggregation computes all 64 bit-sums map-side
    (partial agg); candidates self-join on (band, 16-bit chunk); the
    final filter is one xor+bit_count. All JVM builtins.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    # Σ ±1 per bit: (h >> b & 1)*2-1, aggregated per doc in one pass
    bitsums = toks.groupBy("doc_id").agg(
        *[
            F.sum(F.shiftright("h", b).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"s{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    # fingerprint = Σ (s_b > 0) << b, assembled as a long
    fp = None
    for b in range(SIMHASH_BITS):
        bit = F.when(F.col(f"s{b}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, b)
        fp = term if fp is None else fp + term
    sigs = bitsums.select("doc_id", fp.alias("simhash"))
    chunks = sigs.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF))
                    for i in range(SIMHASH_BANDS)
                ]
            )
        ).alias("band", "chunk"),
    )
    l, r = chunks.alias("l"), chunks.alias("r")
    cand = (
        l.join(r, ["band", "chunk"])
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("d1"),
            F.col("r.doc_id").alias("d2"),
            F.col("l.simhash").alias("h1"),
            F.col("r.simhash").alias("h2"),
        )
        .dropDuplicates(["d1", "d2"])
    )
    hamming = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .select("d1", "d2", "hamming")
    )


EMBED_DUP_THRESHOLD = 0.4  # random synthetic embeddings: max pair sim ~0.51


@op(
    "dedup_embed_cosine",
    oracle=f"""
    SELECT a.vec_id AS v1, b.vec_id AS v2,
           round(CAST(list_cosine_similarity(a.embedding, b.embedding)
                      AS DOUBLE), 4) AS sim
    FROM embeddings a
    JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE)
          > {EMBED_DUP_THRESHOLD}
    """,
    category=CAT,
)
def dedup_embed_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (semantic dedup): all pairs with
    cosine > threshold. Norms are precomputed per vector BEFORE the
    self-join so each pair costs one dot product. The quadratic join is
    the exact baseline; at 100 TB the same verify step runs only on LSH
    or IVF-bucket candidates instead of all pairs."""
    emb = load_table(spark, sf_dir, "embeddings")
    sides = emb.select("vec_id", "embedding", _norm("embedding").alias("nrm"))
    a = sides.select(
        F.col("vec_id").alias("v1"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = sides.select(
        F.col("vec_id").alias("v2"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    return (
        a.join(b, F.col("v1") < F.col("v2"))
        .withColumn("sim", _dot("ea", "eb") / (F.col("na") * F.col("nb")))
        .filter(F.col("sim") > EMBED_DUP_THRESHOLD)
        .select("v1", "v2", F.round("sim", 4).alias("sim"))
    )


N_CENTROIDS = 16
N_PROBE = 4


def _ivf_assign(emb: DataFrame) -> DataFrame:
    """Assign every vector to its nearest coarse centroid.

    Centroids here are the first N_CENTROIDS corpus vectors — the
    deterministic stand-in for an offline k-means (the assignment /
    probe machinery is identical). Broadcast centroids; one window to
    pick the argmax-cosine cluster per vector.
    """
    cents = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("cv"),
        _norm("embedding").alias("cn"),
    )
    vecs = emb.select(
        "vec_id", "label", "embedding", _norm("embedding").alias("vn")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("csim"), "centroid_id")
    return (
        vecs.crossJoin(F.broadcast(cents))
        .withColumn("csim", _dot("embedding", "cv") / (F.col("vn") * F.col("cn")))
        .withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") == 1)
        .select("vec_id", "label", "embedding", "vn", "centroid_id")
    )


@op("ann_ivf_topk", oracle=None, category=CAT)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate nearest-neighbor top-k (rows-only; the
    recall-vs-brute-force contract is unit-tested instead of oracled).

    Scale path for sim_search_topk: vectors are bucketed by nearest
    coarse centroid (inverted file); the query probes only its
    N_PROBE closest centroids' buckets, scanning ~N_PROBE/N_CENTROIDS
    of the corpus. At 100 TB the assignment is precomputed at ingest
    and the probe is a partition-pruned scan (bucket = partition key),
    so query cost is independent of corpus size growth across buckets.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    assigned = _ivf_assign(emb)
    qvec = _fetch_query_vector(sf_dir, QUERY_VEC_ID)
    qn = sum(x * x for x in qvec) ** 0.5
    cents = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("cv"),
        _norm("embedding").alias("cn"),
    )
    probe_ids = [
        r.centroid_id
        for r in cents.withColumn(
            "qsim",
            F.expr(
                f"aggregate(zip_with(cv, {_lit_vec_sql(qvec)},"
                " (p, q) -> cast(p as double) * cast(q as double)),"
                " 0.0D, (acc, v) -> acc + v)"
            )
            / (F.col("cn") * F.lit(qn)),
        )
        .orderBy(F.desc("qsim"), "centroid_id")
        .limit(N_PROBE)
        .collect()
    ]
    sim = F.expr(
        f"aggregate(zip_with(embedding, {_lit_vec_sql(qvec)},"
        " (p, q) -> cast(p as double) * cast(q as double)),"
        " 0.0D, (acc, v) -> acc + v)"
    ) / (F.col("vn") * F.lit(qn))
    return (
        assigned.filter(F.col("centroid_id").isin(probe_ids))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .withColumn("raw_sim", sim)
        .orderBy(F.desc("raw_sim"), "vec_id")
        .limit(TOPK)
        .select("vec_id", "label", F.round("raw_sim", 4).alias("sim"))
    )
