"""Unit/property tests for the LLM-pipeline ops that the oracle can't
fully grade: MinHash-LSH recall vs the exact jaccard ground truth, and
dedup idempotence (SURVEY.md §5.2.4).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from insight_gp_import_spark.registry import load_all_ops

SF = "/root/testdata/sf0.01"
OPS = load_all_ops()


def test_minhash_recall_vs_exact(spark):
    """LSH candidates, post-verified with exact jaccard, must recover
    most true near-dup pairs (precision is 1.0 by construction)."""
    exact = {
        (r.d1, r.d2) for r in OPS["dedup_near_jaccard"].fn(spark, SF).collect()
    }
    approx = {
        (r.d1, r.d2) for r in OPS["dedup_near_minhash"].fn(spark, SF).collect()
    }
    assert exact, "ground truth empty — fixture changed?"
    assert approx <= exact, "minhash emitted a non-duplicate pair (precision < 1)"
    recall = len(approx) / len(exact)
    assert recall >= 0.5, f"minhash recall {recall:.3f} too low"


def test_dedup_exact_idempotent(spark):
    """dedup(dedup(x)) == dedup(x): survivors contain no duplicate hash."""
    surv = OPS["dedup_exact"].fn(spark, SF)
    assert surv.groupBy("content_md5").count().filter(F.col("count") > 1).count() == 0


def test_dedup_exact_survivors_cover_all_content(spark):
    """Every distinct content hash has exactly one survivor."""
    from insight_gp_import_spark.tables import load_table

    docs = load_table(spark, SF, "documents")
    n_distinct = docs.select(F.md5("text")).distinct().count()
    assert OPS["dedup_exact"].fn(spark, SF).count() == n_distinct


def test_allpairs_jaccard_branch_equivalence(spark):
    """Round-9 vocab-gated verify: the three AllPairs representations
    (V<=64 bigint-mask collapse, kh-keyed fixed-width-bitmap verify,
    kh-keyed array_intersect verify) must produce the IDENTICAL pair
    relation — representation is a plan choice, never a result change.
    The sf0.01 corpus (V=31) naturally takes the mask branch; the other
    two are forced through the factored internals."""
    from insight_gp_import_spark.operators.llm import (
        _allpairs_candidates,
        _doc_token_sets,
        _expand_set_pairs,
        _jaccard_pairs_mask64,
        _jaccard_verify_arrays,
        _jaccard_verify_bitmap,
        _keyed_set_groups,
    )

    base = _doc_token_sets(spark, SF)
    vocab = sorted(
        r.tok for r in base.select(F.explode("arr").alias("tok")).distinct().collect()
    )
    assert len(vocab) <= 64, "fixture vocab grew past the mask branch"
    grp = _keyed_set_groups(base)
    # r13: _expand_set_pairs consumes the (kh, docs ARRAY) groups
    # directly (set-level attachment joins + in-JVM fan-out) instead of
    # an exploded (kh, doc_id) relation
    grp_docs = grp.select("kh", "docs")
    gs = grp.select("kh", "arr", "n")
    cand = _allpairs_candidates(gs)

    def rel(df):
        return {(r.d1, r.d2, r.jaccard) for r in df.collect()}

    mask = rel(_jaccard_pairs_mask64(base, vocab))
    bitmap = rel(
        _expand_set_pairs(_jaccard_verify_bitmap(cand, gs, vocab), grp_docs)
    )
    arrays = rel(_expand_set_pairs(_jaccard_verify_arrays(cand, gs), grp_docs))
    assert mask, "pair relation empty — fixture changed?"
    assert mask == bitmap
    assert mask == arrays


def test_set_identity_pipe_token_no_alias(spark):
    """Round-10 ADVICE regression: tokens are space-split, so '|' is a
    legal token byte — {'a|b','c'} and {'a','b','c'} are DIFFERENT sets
    (jaccard 1/4) whose old '|'-joined md5 keys collided, merging the
    groups and emitting a spurious jaccard-1.0 pair. _keyed_set_groups
    must keep them distinct in BOTH dedup formulations."""
    from insight_gp_import_spark.operators.llm import (
        allpairs_jaccard_pairs,
        minhash_pairs,
        token_sets_from_docs,
    )

    rows = [(1, "a|b c"), (2, "a b c")]
    # 63 unique filler tokens push V past 64 so allpairs takes the
    # kh-keyed branch (the mask64 branch was never alias-prone)
    rows += [(10 + i, f"filler{i:03d}") for i in range(63)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sets = token_sets_from_docs(docs)

    for fn in (minhash_pairs, allpairs_jaccard_pairs):
        pairs = {(r.d1, r.d2) for r in fn(sets).collect()}
        assert (1, 2) not in pairs, f"{fn.__name__} aliased pipe-token sets"


def test_knn_tile_topk_tie_merge_lossless(spark, monkeypatch):
    """r10 GEMM-tile kNN: per-tile top-k under (−sim, neighbor_id)
    must merge losslessly across tiles, including sim TIES at the
    k-boundary (duplicate corpus vectors) — ties resolve to the
    LOWEST neighbor ids, exactly like the full-pair window did."""
    import insight_gp_import_spark.operators.llm as llm

    monkeypatch.setattr(llm, "KNN_BLOCK", 2)  # force multi-tile merge
    dup = [1.0, 0.0]  # three identical corpus vectors -> 3-way tie
    rows_p = [(100, [1.0, 0.0])]
    rows_c = [(1, dup), (2, [0.0, 1.0]), (3, dup), (4, [0.6, 0.8]),
              (5, dup), (6, [0.9, 0.1])]
    probes = spark.createDataFrame(
        rows_p, "probe_id long, pv array<double>")
    corpus = spark.createDataFrame(
        rows_c, "neighbor_id long, cv array<double>")
    out = llm._knn_tile_topk(probes, corpus, 3)
    got = sorted(
        (r.probe_id, r.neighbor_id, round(r.raw_sim, 6))
        for r in out.collect()
    )
    # global top-3 = the three identical vectors (sim 1.0), lowest ids
    top3 = sorted(got, key=lambda t: (-t[2], t[1]))[:3]
    assert [(p, n) for p, n, _ in top3] == [(100, 1), (100, 3), (100, 5)]
    # every tile emitted <= k rows per probe and the tie trio is intact
    assert all(s <= 1.0 + 1e-12 for _, _, s in got)
    # r11 ADVICE item 2: bitwise-identical vector pairs must get
    # bitwise-identical raw_sim regardless of which tile computed them
    # (selection is GEMM, but emitted sims come from the shape-
    # independent einsum kernel)
    dup_sims = {r.raw_sim for r in out.collect() if r.neighbor_id in (1, 3, 5)}
    assert len(dup_sims) == 1


def test_knn_tile_topk_zero_norm_guard(spark, monkeypatch):
    """r11 ADVICE item 1: a zero-norm vector yields NaN cosine (0/0),
    which argsort would silently drop from the tile top-k AND which
    cannot round-trip Arrow (pandas NaN → null) to reproduce the
    NaN-greatest ordering the oracle uses — so the op must fail loudly
    on zero-norm embeddings instead of silently changing membership."""
    import pytest

    import insight_gp_import_spark.operators.llm as llm

    monkeypatch.setattr(llm, "KNN_BLOCK", 2)
    rows_p = [(100, [1.0, 0.0])]
    rows_c = [(1, [0.0, 0.0]), (2, [0.0, 1.0]), (3, [0.6, 0.8]),
              (4, [0.9, 0.1]), (5, [1.0, 0.0])]
    probes = spark.createDataFrame(
        rows_p, "probe_id long, pv array<double>")
    corpus = spark.createDataFrame(
        rows_c, "neighbor_id long, cv array<double>")
    with pytest.raises(Exception) as exc:
        llm._knn_tile_topk(probes, corpus, 2).collect()
    assert "zero-norm" in str(exc.value)
