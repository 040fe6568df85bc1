"""Per-op wall-clock + plan-shape profiler (r12 optimization round).

Times EVERY registered op at $SPARK_GRAFT_SF_DIR with the noop sink
(guide §1.4: eagerly computes every column of every row, no driver
collect cost) and records plan-shape counters from
``explain("formatted")``: Exchange count, Python-boundary nodes
(BatchEvalPython/ArrowEvalPython/MapInArrow/MapInPandas/FlatMapGroupsInPandas),
join strategies, PushedFilters presence, and the WholeStageCodegen span
count.  Output: one JSON line per op to stdout (and optionally a file),
sorted run order = registry order; sort offline.

Usage:
    python tools/profile_ops.py [--out FILE] [--ops a,b,c] [--runs N]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PLAN_NODES = (
    "Exchange",
    "BroadcastExchange",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInArrow",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "PythonMapInArrow",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "WholeStageCodegen",
    "Window",
    "WindowGroupLimit",
    "Sort",
)


def plan_stats(plan: str) -> dict:
    stats = {}
    for node in PLAN_NODES:
        # numbered operator lines look like "(3) Exchange" / "* (3) Sort";
        # count those, not prose mentions in the details section
        n = len(re.findall(rf"\(\d+\)\s+{node}\b", plan))
        if n:
            stats[node] = n
    stats["pushed_filters"] = bool(
        re.search(r"PushedFilters: \[[^\]]", plan)
    )
    return stats


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--ops", default=None, help="comma-separated subset")
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--skip-plan", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "8"))

    from insight_gp_import_spark.registry import load_all_ops
    from insight_gp_import_spark.session import get_session

    spark = get_session(
        app_name="igis-profile", master=f"local[{cpus}]", shuffle_partitions=shuffle
    )
    spark.sparkContext.setLogLevel("ERROR")
    ops = load_all_ops()
    names = args.ops.split(",") if args.ops else list(ops)

    sink = open(args.out, "a") if args.out else None
    for name in names:
        o = ops[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        rec: dict = {"op": name}
        try:
            t0 = time.perf_counter()
            df = o.fn(spark, sf_dir)
            rec["build_sec"] = round(time.perf_counter() - t0, 4)
            if not args.skip_plan:
                rec["plan"] = plan_stats(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                ))
            walls = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                df = o.fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                walls.append(time.perf_counter() - t0)
            rec["noop_sec"] = round(min(walls), 4)
            rec["noop_all"] = [round(w, 4) for w in walls]
        except Exception as e:  # noqa: BLE001 — keep profiling the rest
            rec["error"] = f"{type(e).__name__}: {e}"[:300]
        line = json.dumps(rec)
        print(line, flush=True)
        if sink:
            sink.write(line + "\n")
            sink.flush()
    if sink:
        sink.close()
    spark.stop()


if __name__ == "__main__":
    main()
