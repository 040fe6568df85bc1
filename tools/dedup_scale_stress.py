"""sf0.1 → sf1 scale stress for the heavy dedup family (round-7
verdict item 3).

The round-6 parity sweep showed dedup_near_minhash (173.6 s),
dedup_ngram_jaccard (145.8 s), embed_dedup_threshold_sweep (151.6 s)
and dedup_phash_hamming (78.7 s) as the only >100 s-class Spark-side
checks at sf0.1; their banding shapes are the designed-for-scale ones,
but "banding prunes at scale" was an argument, not a measurement. This
tool produces the measurement the RocksDB stress produced for
streaming (BENCH_NOTES.md round-6 pattern):

- For the three BANDED ops it times the exposed candidate stage
  (minhash_candidates / ngram_candidates / phash_candidates) and the
  full op separately, at sf0.1 and at the 10× corpus from
  tools/make_sf_scale.py — candidate-count growth is the quantity
  whose sub-quadraticity is the whole point of LSH/AllPairs/quarter
  banding (the ×10 corpus mutates the token alphabet per replica, so
  true near-dup volume grows ×10, not ×100 — see make_sf_scale.py).
- embed_dedup_threshold_sweep (r9 rewrite): blocked-GEMM pair tiles
  under a declared spine gate (vec_id % s = 0, s = ceil(n/8192)). The
  tool fits it at 1×/2×/3× (all under the gate — the GEMM constant)
  AND at 10× (n=9170 > gate → the spine tier engages, capping the
  pair stage), and contrasts it with dedup_embed_lsh — the banded
  sibling that is the per-pair-output 100 TB path.
- dedup_near_jaccard (r9 rewrite): AllPairs prefix-filter candidates
  with the vocab-gated bitmap verify ported from dedup_ngram_jaccard;
  timed as a full op at 1× and 10× (its candidate stage is not
  separately exposed; the EXACT token-level op is minhash's oracle
  baseline, so it keeps full-corpus semantics — the measurement shows
  the bitmap verify's sub-quadratic wall, not a sampling cap).

Usage: python tools/dedup_scale_stress.py [sf_dir] [sf10_dir]
Defaults: /root/testdata/sf0.1 /tmp/igis_sf1 (build the latter first
with tools/make_sf_scale.py). Emits one JSON line per measurement and
a final summary JSON.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
SF10 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/igis_sf1"


def timed_count(df) -> tuple[int, float]:
    t0 = time.perf_counter()
    n = df.count()
    return n, round(time.perf_counter() - t0, 1)


def main() -> None:
    from insight_gp_import_spark.operators.llm import (
        _doc_token_sets,
        minhash_candidates,
    )
    from insight_gp_import_spark.operators.multimodal import phash_candidates
    from insight_gp_import_spark.operators.training_dedup import (
        ngram_candidates,
    )
    from insight_gp_import_spark.registry import REGISTRY, load_all_ops
    from insight_gp_import_spark.session import get_session

    load_all_ops()
    spark = get_session(app_name="igis-dedup-stress")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}

    def record(op: str, scale: str, kind: str, n: int, secs: float) -> None:
        results.setdefault(op, {})[f"{scale}_{kind}"] = {"n": n, "secs": secs}
        print(json.dumps({"op": op, "scale": scale, "kind": kind,
                          "n": n, "secs": secs}), flush=True)

    banded = {
        "dedup_near_minhash":
            lambda sf: minhash_candidates(_doc_token_sets(spark, sf)),
        "dedup_ngram_jaccard":
            lambda sf: ngram_candidates(spark, sf)[0],
        "dedup_phash_hamming":
            lambda sf: phash_candidates(spark, sf)[0],
    }
    for scale, sf in (("1x", SF1), ("10x", SF10)):
        for op, cand_fn in banded.items():
            n, secs = timed_count(cand_fn(sf))
            record(op, scale, "candidates", n, secs)
            n, secs = timed_count(REGISTRY[op].fn(spark, sf))
            record(op, scale, "pairs", n, secs)
            spark.catalog.clearCache()

    # exact sweep: quadratic BY SPEC — fit it at 1x/2x/3x
    for rep in (2, 3):
        dst = f"/tmp/igis_sweep_{rep}x"
        if not os.path.isdir(dst):
            subprocess.run(
                [sys.executable,
                 os.path.join(REPO, "tools", "make_sf_scale.py"),
                 SF1, dst, str(rep)],
                check=True,
            )
    for scale, sf in (("1x", SF1), ("2x", "/tmp/igis_sweep_2x"),
                      ("3x", "/tmp/igis_sweep_3x"), ("10x", SF10)):
        df = REGISTRY["embed_dedup_threshold_sweep"].fn(spark, sf)
        t0 = time.perf_counter()
        rows = {r["threshold_pm"]: r["n_pairs"] for r in df.collect()}
        secs = round(time.perf_counter() - t0, 1)
        record("embed_dedup_threshold_sweep", scale, "sweep",
               min(rows.items())[1], secs)

    # exact token-level Jaccard (minhash's oracle baseline) — r9
    # AllPairs+bitmap rewrite: full op at 1x and 10x
    for scale, sf in (("1x", SF1), ("10x", SF10)):
        n, secs = timed_count(REGISTRY["dedup_near_jaccard"].fn(spark, sf))
        record("dedup_near_jaccard", scale, "pairs", n, secs)
        spark.catalog.clearCache()

    # ...and the banded sibling that IS the embedding scale path
    for scale, sf in (("1x", SF1), ("10x", SF10)):
        n, secs = timed_count(REGISTRY["dedup_embed_lsh"].fn(spark, sf))
        record("dedup_embed_lsh", scale, "pairs", n, secs)

    # the wedge op rewritten in r9b rides along for the walls table
    for scale, sf in (("1x", SF1), ("10x", SF10)):
        n, secs = timed_count(REGISTRY["graph_triangle_count"].fn(spark, sf))
        record("graph_triangle_count", scale, "pairs", n, secs)
        spark.catalog.clearCache()

    emit_walls_table(results)
    print(json.dumps({"summary": results}), flush=True)
    spark.stop()


# Round-9b idle-box reference walls at the 10× corpus (BENCH_NOTES
# round-9b; r9 verdict item 6: these are GUARANTEES now, re-measured
# every round). A run is flagged when it exceeds reference × MARGIN on
# a quiet box — host load only ever ADDS time, so check load1 before
# believing a flag.
REFERENCE_WALLS_10X = {
    "dedup_near_jaccard": 38.9,
    "dedup_ngram_jaccard": 152.0,
    "dedup_near_minhash": 186.0,
    "graph_triangle_count": 35.7,
}
WALL_MARGIN = 1.5


def emit_walls_table(results: dict) -> None:
    """Markdown regression table for the r9b 10× walls (paste into
    ROUND{N}.md / BENCH_NOTES.md)."""
    try:
        load1 = round(os.getloadavg()[0], 2)
    except OSError:
        load1 = -1.0
    lines = [
        f"10× walls vs r9b reference (quiet-box guarantee, load1={load1}):",
        "| op | r9b ref (s) | this run (s) | ratio | flag |",
        "|---|---|---|---|---|",
    ]
    flags = {}
    for op, ref in REFERENCE_WALLS_10X.items():
        row = results.get(op, {}).get("10x_pairs")
        if row is None:
            lines.append(f"| {op} | {ref} | (not run) | — | — |")
            continue
        ratio = row["secs"] / ref
        flag = "REGRESSION?" if ratio > WALL_MARGIN else "ok"
        flags[op] = {"secs": row["secs"], "ref": ref,
                     "ratio": round(ratio, 2), "flag": flag}
        lines.append(
            f"| {op} | {ref} | {row['secs']} | {ratio:.2f}× | {flag} |"
        )
    print("\n".join(lines), flush=True)
    print(json.dumps({"walls_10x": flags, "load1": load1}), flush=True)


if __name__ == "__main__":
    main()
