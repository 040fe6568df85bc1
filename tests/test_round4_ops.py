"""Structural-law unit tests for the round-4 operator additions.

The parity gates prove hash-equality with the DuckDB oracle; these
tests pin the PROPERTIES that make each op meaningful (exact-count
sampling law, normalization bounds, decomposition identity, output-mode
snapshot semantics) so a future refactor can't keep the hash green
while silently changing the contract the docstring sells.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from insight_gp_import_spark.registry import load_all_ops
from insight_gp_import_spark.tables import load_table

SF01 = "/root/testdata/sf0.01"

OPS = load_all_ops()


def test_sample_systematic_exact_count_law(spark):
    """Systematic sampling's selling point: exactly ceil(n_b/k) rows
    per bucket — not an expectation, a guarantee."""
    from insight_gp_import_spark.operators.projection import (
        _SYS_HEX,
        SYS_STRIDE,
    )

    out = {r["bucket"]: r["n_sampled"]
           for r in OPS["sample_systematic"].fn(spark, SF01).collect()}
    ev = load_table(spark, SF01, "events")
    sizes = {
        r["bucket"]: r["n"]
        for r in ev.select(
            (
                F.instr(
                    F.lit(_SYS_HEX),
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("sys:"), F.col("event_id").cast("string")
                            )
                        ),
                        1,
                        1,
                    ),
                )
                - 1
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(out) == set(sizes)
    for b, n in sizes.items():
        assert out[b] == math.ceil(n / SYS_STRIDE), (b, n, out[b])


def test_hits_scores_normalized_and_paired(spark):
    rows = OPS["graph_hits_bipartite"].fn(spark, SF01).collect()
    assert len(rows) == 20
    sides = {r["side"] for r in rows}
    assert sides == {"part", "supplier"}
    for r in rows:
        # normalized fixed-point scores live in (0, SCALE]
        assert 0 < r["score"] <= 10**9


def test_haversine_bands_partition_all_customers(spark):
    rows = OPS["fn_haversine"].fn(spark, SF01).collect()
    n_customers = load_table(spark, SF01, "customer").count()
    assert sum(r["n"] for r in rows) == n_customers
    for r in rows:
        assert 0 <= r["min_q"] <= r["max_q"] <= 10**6
        assert 0.0 <= r["km_min"] <= r["km_max"]


def test_theil_decomposition_identity(spark):
    """T_overall = Σ s_g·T_g + Σ between_g — the additivity that is
    Theil's whole advantage over Gini (within quantization tolerance)."""
    rows = OPS["agg_theil_index"].fn(spark, SF01).collect()
    s_tot = sum(r["s_g"] for r in rows)
    overall = rows[0]["theil_overall"]
    recomposed = sum(
        (r["s_g"] / s_tot) * r["theil_within"] + r["between_term"] for r in rows
    )
    assert abs(recomposed - overall) < 1e-6, (recomposed, overall)
    assert overall >= 0


def test_allen_shares_sum_to_one(spark):
    rows = OPS["join_allen_interval_relations"].fn(spark, SF01).collect()
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-6
    assert {r["relation"] for r in rows} <= {
        "before", "meets", "equals", "starts", "started_by",
        "overlaps", "finished_by", "contains",
    }


def test_merge_schema_legacy_rows_all_null(spark):
    rows = {r["generation"]: r
            for r in OPS["scan_parquet_merge_schema"].fn(spark, SF01).collect()}
    assert rows["legacy"]["n_null_type"] == rows["legacy"]["n"]
    assert rows["current"]["n_null_type"] == 0


def test_complete_mode_snapshot_has_no_stale_rows(spark):
    """Complete mode's contract: the memory sink is exactly the final
    snapshot — one row per group, not one per (group, trigger)."""
    out = OPS["stream_complete_mode"].fn(spark, SF01)
    n_types = (
        load_table(spark, SF01, "events").select("event_type").distinct().count()
    )
    assert out.count() == n_types


def test_pandas_window_agg_covers_every_event(spark):
    out = OPS["udf_pandas_window_agg"].fn(spark, SF01)
    n_events = load_table(spark, SF01, "events").count()
    assert out.count() == n_events


def test_minhash_signatures_match_reference_md5(spark):
    """Regression lock for the HOF lambda-arity trap: PySpark treats
    `lambda t, s=s:` as the (element, index) two-arg form and the index
    Column silently overrides the default — signatures then depend on a
    session-global lambda counter. The fixed builder must produce
    exactly min(md5(f"{s}_{tok}")) per permutation."""
    import hashlib

    from pyspark.sql import functions as F

    from insight_gp_import_spark.operators.llm import (
        N_MINHASH,
        _doc_token_sets,
    )

    sets = _doc_token_sets(spark, SF01).filter("doc_id = 0")
    from insight_gp_import_spark.operators import llm

    # rebuild the op's own mh columns by calling the shared builder path
    arr = sets.collect()[0]["arr"]
    expected = {
        s: min(hashlib.md5(f"{s}_{t}".encode()).hexdigest() for t in arr)
        for s in range(N_MINHASH)
    }
    # replicate the (fixed) factory idiom used in minhash_pairs
    def perm(s):
        return lambda t: F.md5(F.concat(F.lit(f"{s}_"), t))

    row = sets.select(
        *[
            F.array_min(F.transform("arr", perm(s))).alias(f"m{s}")
            for s in range(N_MINHASH)
        ]
    ).collect()[0]
    for s in range(N_MINHASH):
        assert row[f"m{s}"] == expected[s], s


def test_lsh_codes_are_integer_exact(spark):
    """Bucket codes must come from exact BIGINT folds over quantized
    components — re-derive one vector's codes in pure Python and
    compare."""
    import math

    from pyspark.sql import functions as F

    from insight_gp_import_spark.operators import training_dedup as td
    from insight_gp_import_spark.tables import load_table

    emb = load_table(spark, SF01, "embeddings").filter("vec_id = 7")
    planes = td._lsh_planes()
    row = (
        emb.withColumn("lsh_qv", F.expr(td._LSH_QV_SQL))
        .select("embedding", *td._lsh_code_cols(planes))
        .collect()[0]
    )
    qq = [math.floor(float(x) * td.LSH_Q_SCALE + 0.5) for x in row["embedding"]]
    for t in range(td.LSH_TABLES):
        code = sum(
            (1 << b)
            for b in range(td.LSH_BITS)
            if sum(a * c for a, c in zip(qq, planes[t * td.LSH_BITS + b])) > 0
        )
        assert row[f"lsh_code{t}"] == code, t


def test_timezone_histograms_conserve_events(spark):
    """Every event lands in exactly one local-hour bucket per zone —
    a tzdata or conversion bug would lose or double-count rows."""
    rows = OPS["fn_timezone_convert"].fn(spark, SF01).collect()
    n_events = load_table(spark, SF01, "events").count()
    per_zone = {}
    for r in rows:
        per_zone[r["zone"]] = per_zone.get(r["zone"], 0) + r["n"]
    assert set(per_zone) == {"Asia/Tokyo", "America/New_York", "Europe/Berlin"}
    assert all(v == n_events for v in per_zone.values()), per_zone


def test_bigram_counts_are_tokens_minus_one(spark):
    """A doc with T tokens has exactly T-1 bigrams — shredded or
    duplicated pairs break the law."""
    out = {r["doc_id"]: r["n_bigrams"]
           for r in OPS["text_bigram_logprob"].fn(spark, SF01)
           .filter("doc_id < 20").collect()}
    toks = {
        r["doc_id"]: r["t"]
        for r in load_table(spark, SF01, "documents")
        .filter("doc_id < 20")
        .select("doc_id", F.size(F.split("text", " ")).alias("t"))
        .collect()
    }
    for d, t in toks.items():
        assert out[d] == t - 1, (d, t, out[d])
