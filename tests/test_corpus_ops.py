"""Invariants of the corpus-assembly ops that the oracle hash cannot
express: proportions, completeness, boundary conditions, and the
resampling expectation. All run on the real sf0.01 tables."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from insight_gp_import_spark.operators.corpus_ops import (
    BENCH_SOURCE,
    PACK_BUDGET,
)
from insight_gp_import_spark.registry import load_all_ops
from insight_gp_import_spark.tables import load_table

SF = "/root/testdata/sf0.01"
OPS = load_all_ops()


@pytest.fixture(scope="module")
def split(spark):
    return OPS["corpus_split_hash"].fn(spark, SF).cache()


def test_split_covers_every_doc_once(spark, split):
    n_docs = load_table(spark, SF, "documents").count()
    assert split.count() == n_docs
    assert split.select("doc_id").distinct().count() == n_docs


def test_split_proportions_near_13_1_2(spark, split):
    by = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = sum(by.values())
    # md5 is uniform; at n=500 allow generous binomial slack (±6 sigma)
    assert abs(by.get("train", 0) / n - 13 / 16) < 0.12
    assert by.get("val", 0) > 0 and by.get("test", 0) > 0


def test_shard_positions_are_dense_ranks(spark):
    df = OPS["corpus_shard_shuffle"].fn(spark, SF)
    agg = df.groupBy("shard").agg(
        F.count("*").alias("n"), F.max("pos").alias("mx"), F.min("pos").alias("mn")
    )
    bad = agg.filter((F.col("mx") != F.col("n")) | (F.col("mn") != 1)).count()
    assert bad == 0  # pos is exactly 1..n per shard: no gaps, no dupes


def test_pack_offsets_within_budget_and_monotone(spark):
    df = OPS["corpus_pack_sequences"].fn(spark, SF)
    assert df.filter((F.col("pack_offset") < 0) | (F.col("pack_offset") >= PACK_BUDGET)).count() == 0
    # per shard, total packed tokens == sum of doc tokens (nothing lost)
    tot = df.groupBy("shard").agg(
        F.sum("n_tokens").alias("toks"),
        F.max(F.col("pack_id") * PACK_BUDGET + F.col("pack_offset") + F.col("n_tokens")).alias("end"),
    )
    assert tot.filter(F.col("end") != F.col("toks")).count() == 0


def test_decontaminate_never_flags_benchmark_docs(spark):
    flagged = OPS["corpus_decontaminate"].fn(spark, SF)
    bench_ids = (
        load_table(spark, SF, "documents")
        .filter(F.col("source") == BENCH_SOURCE)
        .select("doc_id")
    )
    assert flagged.join(bench_ids, "doc_id", "left_semi").count() == 0


def test_apply_mix_copy_count_matches_expectation(spark):
    """Total resampled tokens per language must land within one doc of
    the uniform target total/|langs| — floor+bernoulli resampling is
    unbiased, and with a deterministic hash the realized count is fixed."""
    docs = load_table(spark, SF, "documents").select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n_tokens")
    )
    out = OPS["corpus_apply_mix"].fn(spark, SF)
    per_lang = (
        out.join(docs, ["doc_id", "lang"])
        .groupBy("lang")
        .agg(F.sum("n_tokens").alias("resampled_tokens"))
        .collect()
    )
    total = docs.agg(F.sum("n_tokens")).collect()[0][0]
    n_langs = docs.select("lang").distinct().count()
    target = total / n_langs
    for r in per_lang:
        # realized per-lang token mass within 20% of the uniform target
        # (quantization noise: docs are indivisible units)
        assert abs(r["resampled_tokens"] - target) / target < 0.20, r


def test_mix_weights_shares_sum_to_one(spark):
    w = OPS["corpus_mix_weights"].fn(spark, SF)
    s = w.agg(F.sum("actual_share")).collect()[0][0]
    assert abs(s - 1.0) < 1e-4


def test_cdc_merge_cardinality(spark):
    """|result| = |base| - |deletes| + |inserts|, and every action label
    matches its key-residue class."""
    base = load_table(spark, SF, "orders")
    n = base.count()
    n_del = base.filter(F.col("o_orderkey") % 13 == 0).count()
    n_ins = base.filter(F.col("o_orderkey") % 13 == 2).count()
    out = OPS["merge_cdc_apply"].fn(spark, SF).cache()
    assert out.count() == n - n_del + n_ins
    assert out.filter(F.col("cdc_action") == "insert").count() == n_ins
    assert out.filter((F.col("cdc_action") == "update") & (F.col("o_orderkey") % 13 != 1)).count() == 0


def test_incremental_merge_equals_full_recompute(spark):
    """The whole point of partial-state maintenance: merged(prior,
    delta) must equal the full-table aggregate exactly."""
    full = (
        load_table(spark, SF, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_total"),
            F.round(F.sum("o_totalprice") / F.count("*"), 4).alias("avg_total"),
        )
    )
    merged = OPS["agg_incremental_merge"].fn(spark, SF)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_snapshot_diff_only_added_and_changed_on_monotone_history(spark):
    out = OPS["snapshot_diff"].fn(spark, SF).cache()
    # orders history only grows: nothing can be 'removed'
    assert out.filter(F.col("action") == "removed").count() == 0
    assert out.filter((F.col("action") == "changed") & (F.col("old_orderkey") == F.col("new_orderkey"))).count() == 0
    assert out.count() > 0


def test_range_sorted_sink_is_globally_sorted(spark):
    [row] = OPS["sink_parquet_range_sorted"].fn(spark, SF).collect()
    assert row.globally_sorted, row
    assert row.rows_written == row.rows_source
    assert row.n_files > 1  # parallel write, not a coalesce(1) cheat


def test_dynamic_partition_overwrite_replaces_only_target(spark):
    [row] = OPS["sink_partition_overwrite_dynamic"].fn(spark, SF).collect()
    assert row.target_replaced, row
    assert row.others_intact, row
    assert row.days_preserved, row
