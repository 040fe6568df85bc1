"""Banded (scale-feasible) DuckDB oracle twins for the five dedup ops
whose registered naive oracles exceed the box at sf1 (r11 verdict
item 2; PARITY_r11.md: >79 GB spill / >104 GB RSS).

The registered oracles stay deliberately NAIVE — independence from the
Spark AllPairs/LSH plans is the point of the differential check — but
their all-token pair stages grow ~100x on the 10x corpus (hot tokens
stay shared across replicas, so the Σ cnt(tok)² join blows up). Each
twin here computes the IDENTICAL relation with a blocking step that is
exact by construction, never a heuristic:

- ``JACCARD_PAIRS_SQL_BANDED``: AllPairs prefix blocking (Bayardo
  WWW'07) over the set-collapsed token relation — a pair with
  J >= t must share a token within both prefixes of length
  n - ceil(t*n) + 1 under a common (df, tok) total order, so joining
  prefixes over-generates candidates and the exact list_intersect
  verification restores equality. Same set-collapse (gs/smap) and
  identical output expressions as the naive SQL.
- ``MINHASH_PAIRS_SQL_BANDED``: the same md5 minhash/band definitions,
  but the 32 per-(doc,token,seed) hash rows collapse to 32 aggregate
  COLUMNS over one scan of the token relation (min(md5('<s>_'||tok)))
  — the band hash md5(mh0||'|'||mh1||...) concatenates in seed order,
  byte-identical to the naive string_agg(mh, '|' ORDER BY s).
- ``NGRAM_JACCARD_SQL_BANDED``: identical candidate CTEs (the naive
  oracle already prefix-filters); the array-materializing verify is
  replaced by BIT algebra — bitstring_agg over dense gram ranks, with
  shared = bit_count(a & b). ``NGRAM_BITSTRING_BOUND`` must cover the
  gram vocabulary (measured 648 at sf1; bitstring_agg raises loudly on
  overflow, it can never silently wrap).
- ``CLUSTER_ORACLE_SQL_BANDED`` / ``SURVIVOR_QUALITY_SQL_BANDED``:
  the SAME unrolled min-label propagation tail (byte-identical — both
  render through training_dedup._cluster_oracle_sql /
  _survivor_quality_oracle_sql) over the banded pair CTE, so pair
  equivalence implies cluster equivalence.

Equivalence is additionally PROVEN empirically, not argued:
tests/test_certified_oracles.py runs naive vs banded row-identical at
sf0.01 (always) and sf0.1 (IGIS_PARITY_SF10=1); PARITY_r12.md records
the sf0.1 runs. tools/certify_oracle.py --banded mints sf1
certificates by RUNNING these twins while stamping the certificate
with the REGISTERED oracle's sql_sha256 plus the banded sha + an
explicit ``minted_via`` pointer, so the provenance is in the artifact.
"""

from __future__ import annotations

from insight_gp_import_spark.operators.llm import (
    JACCARD_THRESHOLD,
    N_BANDS,
    N_MINHASH,
)
from insight_gp_import_spark.operators.training_dedup import (
    NGRAM_K,
    NGRAM_T_DEN,
    NGRAM_T_NUM,
    _cc_labels_cte,
    _cluster_oracle_sql,
    _survivor_quality_oracle_sql,
)

# prefix blocking needs the threshold as an exact fraction (integer
# ceil, no float divergence): prefix = n - ceil(t*n) + 1 with
# ceil(a*n/b) = (a*n + b - 1) // b == (J_NUM*n + J_NUM) // J_DEN for
# b = J_DEN when gcd-reduced as below
J_NUM, J_DEN = 4, 5
assert J_NUM / J_DEN == JACCARD_THRESHOLD

JACCARD_PAIRS_SQL_BANDED = f"""
    WITH toks AS MATERIALIZED (
        SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ), sets AS MATERIALIZED (
        SELECT doc_id, list_sort(list(tok)) AS karr, count(*) AS n
        FROM toks GROUP BY doc_id
    ), gs AS MATERIALIZED (
        SELECT karr, n, min(doc_id) AS sid FROM sets GROUP BY karr, n
    ), smap AS MATERIALIZED (
        SELECT s.doc_id, g.sid FROM sets s JOIN gs g USING (karr, n)
    ), g_toks AS MATERIALIZED (
        SELECT sid, n, unnest(karr) AS tok FROM gs
    ), freq AS MATERIALIZED (
        SELECT tok, count(*) AS df FROM g_toks GROUP BY tok
    ), ranked AS MATERIALIZED (
        SELECT tok, row_number() OVER (ORDER BY df, tok) AS trank FROM freq
    ), pos AS MATERIALIZED (
        SELECT g.sid, g.n, g.tok,
               row_number() OVER (PARTITION BY g.sid ORDER BY r.trank) AS pos
        FROM g_toks g JOIN ranked r USING (tok)
    ), pref AS MATERIALIZED (
        SELECT sid, n, tok FROM pos
        WHERE pos <= n - (({J_NUM} * n + {J_NUM}) // {J_DEN}) + 1
    ), cand AS (
        SELECT DISTINCT a.sid AS s1, b.sid AS s2
        FROM pref a JOIN pref b USING (tok)
        WHERE a.sid < b.sid
          AND {J_DEN} * least(a.n, b.n) >= {J_NUM} * greatest(a.n, b.n)
    ), jac AS (
        SELECT c.s1, c.s2,
               len(list_intersect(a.karr, b.karr)) * 1.0
                 / (a.n + b.n - len(list_intersect(a.karr, b.karr))) AS j
        FROM cand c JOIN gs a ON a.sid = c.s1 JOIN gs b ON b.sid = c.s2
    ), good AS (
        SELECT s1, s2, j FROM jac WHERE j > {JACCARD_THRESHOLD}
    )
    SELECT least(m1.doc_id, m2.doc_id) AS d1,
           greatest(m1.doc_id, m2.doc_id) AS d2,
           round(j, 4) AS jaccard
    FROM good
    JOIN smap m1 ON good.s1 = m1.sid
    JOIN smap m2 ON good.s2 = m2.sid
    UNION ALL
    SELECT x.doc_id AS d1, y.doc_id AS d2, 1.0 AS jaccard
    FROM smap x JOIN smap y USING (sid)
    WHERE x.doc_id < y.doc_id
    """

_ROWS_PER_BAND = N_MINHASH // N_BANDS
_MIN_COLS = ",\n               ".join(
    f"min(md5('{s}_' || tok)) AS mh{s}" for s in range(N_MINHASH)
)
_BAND_ROWS = ",\n            ".join(
    "{'band': %d, 'bh': md5(%s)}"
    % (
        b,
        " || '|' || ".join(
            f"mh{s}"
            for s in range(b * _ROWS_PER_BAND, (b + 1) * _ROWS_PER_BAND)
        ),
    )
    for b in range(N_BANDS)
)

MINHASH_PAIRS_SQL_BANDED = f"""
    WITH toks AS MATERIALIZED (
        SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ), sets AS MATERIALIZED (
        SELECT doc_id, list_sort(list(tok)) AS arr, count(*) AS n
        FROM toks GROUP BY doc_id
    ), mins AS MATERIALIZED (
        SELECT doc_id,
               {_MIN_COLS}
        FROM toks GROUP BY doc_id
    ), bands AS MATERIALIZED (
        SELECT doc_id, b.band, b.bh
        FROM mins, LATERAL (SELECT unnest([
            {_BAND_ROWS}
        ], recursive := true)) b
    ), cand AS (
        SELECT DISTINCT l.doc_id AS d1, r.doc_id AS d2
        FROM bands l JOIN bands r ON l.band = r.band AND l.bh = r.bh
        WHERE l.doc_id < r.doc_id
    ), verified AS (
        SELECT c.d1, c.d2,
               len(list_intersect(s1.arr, s2.arr)) * 1.0
                 / (s1.n + s2.n - len(list_intersect(s1.arr, s2.arr))) AS j
        FROM cand c JOIN sets s1 ON s1.doc_id = c.d1
                    JOIN sets s2 ON s2.doc_id = c.d2
    )
    SELECT d1, d2, round(j, 4) AS jaccard
    FROM verified WHERE j > {JACCARD_THRESHOLD}
    """

# must cover max(grank); measured gram vocabulary is 648 at sf1 and
# 377 at sf0.1 — bitstring_agg raises on out-of-range (loud, never
# silent), at which point the live naive oracle is the fallback. Width
# is ALSO the verify-join payload (both sides' bitstrings ride every
# one of the ~129M sf1 candidate rows), so keep it tight: 1024 bits =
# 128 B/doc, ~1.5x headroom over the measured vocabulary.
NGRAM_BITSTRING_BOUND = 1024

NGRAM_JACCARD_SQL_BANDED = f"""
    WITH grams AS MATERIALIZED (
        SELECT DISTINCT doc_id,
               unnest(list_transform(generate_series(1, length(text) - {NGRAM_K - 1}),
                                     i -> substr(text, i, {NGRAM_K}))) AS g
        FROM documents
        WHERE n_chars >= {NGRAM_K}
    ), freq AS MATERIALIZED (
        SELECT g, count(*) AS dfreq FROM grams GROUP BY g
    ), ranked AS MATERIALIZED (
        SELECT g, row_number() OVER (ORDER BY dfreq, g) AS grank FROM freq
    ), gd AS MATERIALIZED (
        SELECT doc_id, grams.g, grank FROM grams JOIN ranked ON grams.g = ranked.g
    ), sized AS MATERIALIZED (
        SELECT doc_id, count(*) AS n FROM gd GROUP BY doc_id
    ), pos AS MATERIALIZED (
        SELECT doc_id, g,
               row_number() OVER (PARTITION BY doc_id ORDER BY grank) AS pos
        FROM gd
    ), pref AS MATERIALIZED (
        SELECT p.doc_id, p.g, s.n
        FROM pos p JOIN sized s ON p.doc_id = s.doc_id
        WHERE p.pos <= s.n - (({NGRAM_T_NUM} * s.n + {NGRAM_T_NUM}) // {NGRAM_T_DEN}) + 1
    ), cand AS (
        SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        FROM pref a JOIN pref b ON a.g = b.g
        WHERE a.doc_id < b.doc_id
          AND {NGRAM_T_DEN} * least(a.n, b.n) >= {NGRAM_T_NUM} * greatest(a.n, b.n)
    ), bs AS MATERIALIZED (
        SELECT doc_id,
               bitstring_agg(grank, 1, {NGRAM_BITSTRING_BOUND}) AS bits,
               count(*) AS n
        FROM gd GROUP BY doc_id
    )
    SELECT d1, d2, round(shared * 1.0 / (n1 + n2 - shared), 4) AS jaccard
    FROM (
        SELECT d1, d2, bit_count(b1.bits & b2.bits) AS shared,
               b1.n AS n1, b2.n AS n2
        FROM cand
        JOIN bs b1 ON cand.d1 = b1.doc_id
        JOIN bs b2 ON cand.d2 = b2.doc_id
    )
    WHERE {NGRAM_T_DEN} * shared > {NGRAM_T_NUM} * (n1 + n2 - shared)
    """

_CC_BANDED = _cc_labels_cte(pairs_sql=JACCARD_PAIRS_SQL_BANDED)

CLUSTER_ORACLE_SQL_BANDED = _cluster_oracle_sql(_CC_BANDED)
SURVIVOR_QUALITY_SQL_BANDED = _survivor_quality_oracle_sql(_CC_BANDED)

BANDED_ORACLES: dict[str, str] = {
    "dedup_near_jaccard": JACCARD_PAIRS_SQL_BANDED,
    "dedup_near_minhash": MINHASH_PAIRS_SQL_BANDED,
    "dedup_ngram_jaccard": NGRAM_JACCARD_SQL_BANDED,
    "dedup_cluster": CLUSTER_ORACLE_SQL_BANDED,
    "dedup_cluster_bigstar": CLUSTER_ORACLE_SQL_BANDED,
    "dedup_survivor_quality": SURVIVOR_QUALITY_SQL_BANDED,
}
