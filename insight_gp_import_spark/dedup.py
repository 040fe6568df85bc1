"""Library-level dedup dispatch — the safe-by-default entry points.

The repo carries two formulations of each near-duplicate detector:

- an **exact** all-pairs/AllPairs twin, oracle-matched against DuckDB
  (``dedup_near_jaccard``, ``dedup_embed_cosine``) — correct at any
  size but candidate-quadratic, the ground-truth tier;
- a **banded/bucketed** plan (``dedup_near_minhash`` MinHash 8×4
  banding, ``dedup_embed_lsh`` signed-random-projection blocking)
  whose candidate volume scales with true duplication, not corpus² —
  the 100 TB tier, with recall unit-tested against the exact twin.

These functions make the banded tier the DEFAULT so a user at scale
cannot pick the quadratic plan by accident (round-4 verdict item 3);
the exact twin is an explicit ``exact=True`` opt-in. Both underlying
op registrations and their oracle declarations are unchanged — this
module only routes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def near_dup_pairs(docs: DataFrame, *, exact: bool = False) -> DataFrame:
    """Near-duplicate document pairs (token-set Jaccard > 0.8) from a
    ``(doc_id, text)`` frame.

    Default: banded MinHash candidates + exact-Jaccard verification
    (precision 1.0, recall unit-tested). ``exact=True``: AllPairs
    prefix-filtered exact search — every qualifying pair, but
    candidate volume degrades toward quadratic on hot-token corpora;
    reserve it for oracle/ground-truth runs.
    """
    from insight_gp_import_spark.operators.llm import (
        allpairs_jaccard_pairs,
        minhash_pairs,
        token_sets_from_docs,
    )

    sets = token_sets_from_docs(docs)
    return allpairs_jaccard_pairs(sets) if exact else minhash_pairs(sets)


def embed_dup_pairs(embeddings: DataFrame, *, exact: bool = False) -> DataFrame:
    """Semantic near-duplicate pairs (cosine > threshold) from a
    ``(vec_id, embedding)`` frame.

    Default: LSH bucket blocking + exact-cosine verification on
    candidates (precision 1.0 by construction). ``exact=True``:
    all-pairs cosine self-join — the quadratic ground-truth twin.
    """
    from insight_gp_import_spark.operators.training_dedup import (
        embed_allpairs_cosine,
        embed_lsh_pairs,
    )

    return embed_allpairs_cosine(embeddings) if exact else embed_lsh_pairs(embeddings)
