"""Losslessness + effectiveness of the PPJoin positional filter in
``ngram_candidates`` (round 9).

The filter prunes candidate pairs whose smallest shared prefix gram
sits too late for the overlap bound 1 + min(n1 − min p1, n2 − min p2)
to reach the threshold's minimum overlap (Xiao et al., WWW'08). These
tests pin, against an independent pure-Python emulation over a crafted
corpus where the filter demonstrably FIRES (74 of 92 prefix candidates
pruned at the pinned seed):

  1. the Spark candidate set equals the emulation's positionally
     filtered set EXACTLY (semantics, not just an upper bound);
  2. every true pair (strict jaccard > 0.9, brute force) survives
     (losslessness — the property that lets the DuckDB oracle stay
     untouched);
  3. the full op returns exactly the brute-force true pairs.
"""

from __future__ import annotations

import itertools
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from insight_gp_import_spark.operators import training_dedup as td

SEED = 226
NGRAM_K = 3


def _crafted_texts() -> dict[int, str]:
    rng = random.Random(SEED)
    texts = {}
    # dense 7-letter alphabet so 60-char docs collide on rare grams
    # (that is what makes prefix candidates without true similarity)
    for d in range(1, 30):
        texts[d] = "".join(rng.choice("abcdefg") for _ in range(60))
    # four near-dup docs: one-char edits of bases (true pairs above
    # 0.9 come from these; at the pinned seed exactly 2 clear it)
    for i, (src, pos) in enumerate([(1, 30), (2, 5), (3, 55), (4, 20)]):
        t = list(texts[src])
        t[pos] = "z"
        texts[40 + i] = "".join(t)
    return texts


def _emulate(texts: dict[int, str]):
    """Pure-Python AllPairs+PPJoin emulation, independent of Spark."""
    grams = {
        d: sorted({t[i : i + NGRAM_K] for i in range(len(t) - NGRAM_K + 1)})
        for d, t in texts.items()
        if len(t) >= NGRAM_K
    }
    dfreq: dict[str, int] = {}
    for gs in grams.values():
        for g in gs:
            dfreq[g] = dfreq.get(g, 0) + 1
    order = {d: sorted(gs, key=lambda g: (dfreq[g], g)) for d, gs in grams.items()}
    pos = {d: {g: i + 1 for i, g in enumerate(o)} for d, o in order.items()}
    n = {d: len(gs) for d, gs in grams.items()}
    pl = {d: n[d] - ((9 * n[d] + 9) // 10) + 1 for d in grams}
    pref = {d: set(order[d][: pl[d]]) for d in grams}
    unfiltered, filtered, true = set(), set(), {}
    for a, b in itertools.combinations(sorted(grams), 2):
        sh = len(set(grams[a]) & set(grams[b]))
        if 10 * sh > 9 * (n[a] + n[b] - sh):
            true[(a, b)] = round(sh / (n[a] + n[b] - sh), 4)
        shared_pref = pref[a] & pref[b]
        if not shared_pref:
            continue
        if 10 * min(n[a], n[b]) < 9 * max(n[a], n[b]):
            continue
        unfiltered.add((a, b))
        mp1 = min(pos[a][g] for g in shared_pref)
        mp2 = min(pos[b][g] for g in shared_pref)
        o_min = 9 * (n[a] + n[b]) // 19 + 1
        if 1 + min(n[a] - mp1, n[b] - mp2) >= o_min:
            filtered.add((a, b))
    return unfiltered, filtered, true


@pytest.fixture(scope="module")
def crafted_sf(tmp_path_factory):
    texts = _crafted_texts()
    d = tmp_path_factory.mktemp("ngram_ppjoin")
    ids = sorted(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([texts[i] for i in ids], pa.string()),
                "lang": pa.array(["en"] * len(ids), pa.string()),
                "source": pa.array(["crafted"] * len(ids), pa.string()),
                "n_chars": pa.array([len(texts[i]) for i in ids], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d), texts


def test_positional_filter_matches_emulation_and_is_lossless(spark, crafted_sf):
    sf_dir, texts = crafted_sf
    unfiltered, filtered, true = _emulate(texts)
    # the fixture must actually exercise the filter, with headroom
    assert len(unfiltered) - len(filtered) >= 50, (len(unfiltered), len(filtered))
    assert true, "fixture lost its true pairs"
    assert set(true) <= filtered, "emulated filter dropped a true pair"

    cand = {
        (r.d1, r.d2)
        for r in td.ngram_candidates(spark, sf_dir)[0].collect()
    }
    assert cand == filtered

    got = {
        (r.d1, r.d2): r.jaccard
        for r in td.dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    assert got == true


def test_candidates_carry_exact_sizes(spark, crafted_sf):
    """cand's (n1, n2) — now emitted by the candidate aggregate instead
    of two post-hoc size joins — must be the exact distinct-gram
    counts the verify stage divides by."""
    sf_dir, texts = crafted_sf
    sizes = {
        d: len({t[i : i + NGRAM_K] for i in range(len(t) - NGRAM_K + 1)})
        for d, t in texts.items()
    }
    for r in td.ngram_candidates(spark, sf_dir)[0].collect():
        assert (r.n1, r.n2) == (sizes[r.d1], sizes[r.d2]), (r.d1, r.d2)
