"""Bench harness — the B1-B10 headline suite (BASELINE.md).

Runs each bench query at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: ``{"metric": ..., "value": suite_sec, "unit": "sec",
"queries": {...}, "sf": ...}``.

Protocol (matches how BASELINE.md was measured): one shared warm
SparkSession, startup excluded, 1 discard run + median of 5 timed runs
per query, timing = full plan build + execution + collect.

r6 verdict item 5: driver-run and quiet-host numbers for the SAME HEAD
differed by ~12% — more than any real plan change that round — so the
JSON now also carries per-query {median, min, spread} (spread =
max-min across the timed runs) under "queries_stats". "queries" stays
plain median seconds for the driver/BASELINE comparison; min is the
load-robust statistic (host noise only ever ADDS time), so
round-over-round regressions should be judged on min when spread is
large relative to median.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# B-id -> registry op id (BASELINE.md rows B1-B10)
BENCH_QUERIES = {
    "q1": "agg_hash_groupby",
    "q2": "limit_topk",
    "q3": "join_star_multiway",
    "q4": "win_topn_per_group",
    "q5": "stream_tumbling",
    "q6": "stream_session",
    "q7": "dedup_exact",
    "q8": "sim_search_topk",
    "q9": "fn_json",
    "q10": "agg_grouping_sets",
}

RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

    from insight_gp_import_spark.registry import load_all_ops
    from insight_gp_import_spark.session import get_session

    # Local-mode tuning: at sub-GB scale fewer shuffle partitions beat
    # cpu_count (less task scheduling + fewer shuffle files; AQE still
    # coalesces post-shuffle). On a cluster leave the session default
    # (~2-3x executor cores) — see session.py's scale notes.
    shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "8"))
    spark = get_session(
        app_name="igis-bench", master=f"local[{cpus}]", shuffle_partitions=shuffle
    )
    spark.sparkContext.setLogLevel("ERROR")
    ops = load_all_ops()

    timings: dict[str, float] = {}
    stats: dict[str, dict[str, float]] = {}
    for qid, op_id in BENCH_QUERIES.items():
        fn = ops[op_id].fn
        fn(spark, sf_dir).collect()  # discard run (JIT, file listing, AQE stats)
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            samples.append(time.perf_counter() - t0)
        timings[qid] = round(statistics.median(samples), 4)
        stats[qid] = {
            "median": timings[qid],
            "min": round(min(samples), 4),
            "spread": round(max(samples) - min(samples), 4),
        }

    suite = round(sum(timings.values()), 4)
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    # r9 verdict item 4: BENCH_r09's recorded 35% "regression" was pure
    # host load (quiet-box re-runs landed on the r8 number), so stamp
    # the measurement conditions into the artifact: load averages and a
    # noisy_host flag (any query with spread > 0.3x its median). When
    # noisy_host is true, judge regressions on suite_min / re-run on a
    # quiet box — never on the medians.
    try:
        load1, load5, _ = os.getloadavg()
    except (OSError, AttributeError):  # platform without getloadavg
        load1 = load5 = -1.0  # (e.g. Windows lacks the attribute)
    noisy = any(
        s["spread"] > 0.3 * s["median"] for s in stats.values() if s["median"] > 0
    )
    print(
        json.dumps(
            {
                "metric": "bench_suite_total",
                "value": suite,
                "unit": "sec",
                "queries": timings,
                "queries_stats": stats,
                "runs": RUNS,
                "suite_min": round(sum(s["min"] for s in stats.values()), 4),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "load1": round(load1, 2),
                "load5": round(load5, 2),
                "noisy_host": noisy,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
