"""Process-parallel both-SF parity sweep (round-4 verdict item 4).

The single-process pytest sweep (tests/test_parity_oracle.py with
IGIS_PARITY_SF10=1) is the canonical gate but runs serially at
~25-30 s/op-SF — multi-hour at 450+ oracled ops. This runner produces
the SAME evidence (insight_gp_import_spark.compare at both SFs per
oracled op + run/count for rows-only ops) in wall-clock budget by
fanning ops across worker PROCESSES (separate JVMs — no shared-session
state), with one deliberate exception:

ops whose execution involves Python workers or the streaming runtime
(udfs/streaming categories, mapInPandas/udtf/python-datasource scans,
multimodal) are the documented concurrent-session flake class — they
run SERIALLY in a dedicated isolation phase after the parallel phase.

Usage:
  python tools/parity_sweep.py --workers 6 --out /tmp/parity_r04
  python tools/parity_sweep.py --worker-id 3 --workers 6 ...  (internal)

Each worker writes JSONL rows {op, sf, status, secs, detail}; the
parent merges and prints a summary. Any FAIL should be re-verified
isolated (python /tmp/gate.py <op>) before being believed — the
isolation phase exists precisely because concurrency can flake.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SFS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]

# categories / ops that must not run concurrently with other sessions
ISOLATE_CATEGORIES = {"streaming", "udfs", "multimodal"}
ISOLATE_OPS = {
    "scan_python_datasource",  # Python data source API
    "udtf_arrow_bigrams",
    "mm_decode_features",
    "dedup_cluster",  # ~1 h DuckDB recursive-CTE oracle at sf0.1: pin it
    # to the isolation phase so one worker lane isn't silently 10x the rest
}


def partition_ops():
    import insight_gp_import_spark.operators  # noqa: F401

    from insight_gp_import_spark.registry import REGISTRY

    isolate, parallel = [], []
    for name, o in sorted(REGISTRY.items()):
        if o.category in ISOLATE_CATEGORIES or name in ISOLATE_OPS:
            isolate.append(name)
        else:
            parallel.append(name)
    return parallel, isolate


def run_ops(names: list[str], out_path: str) -> int:
    from insight_gp_import_spark.compare import compare
    from insight_gp_import_spark.registry import load_all_ops
    from insight_gp_import_spark.session import get_session

    ops = load_all_ops()
    spark = get_session()
    fails = 0
    with open(out_path, "a") as out:
        for name in names:
            o = ops[name]
            for sf in SFS:
                t0 = time.time()
                row = {"op": name, "sf": sf.rsplit("/", 1)[-1]}
                try:
                    df = o.fn(spark, sf)
                    if o.oracle is None:
                        n = df.count()
                        row |= {"status": "rows_only_ran", "rows": n}
                    else:
                        res = compare(name, df, o.oracle, sf)
                        row |= {
                            "status": "pass" if res.ok else "FAIL",
                            "detail": None if res.ok else res.detail[:300],
                        }
                        fails += 0 if res.ok else 1
                except Exception as e:  # noqa: BLE001 - record, don't abort sweep
                    row |= {"status": "ERROR", "detail": str(e)[:300]}
                    fails += 1
                row["secs"] = round(time.time() - t0, 1)
                out.write(json.dumps(row) + "\n")
                out.flush()
    return fails


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, default=6)
    ap.add_argument("--worker-id", type=int, default=None)
    ap.add_argument("--out", default="/tmp/parity_sweep")
    args = ap.parse_args()

    parallel, isolate = partition_ops()

    if args.worker_id is not None:  # child mode
        mine = [n for i, n in enumerate(parallel) if i % args.workers == args.worker_id]
        return 1 if run_ops(mine, f"{args.out}/w{args.worker_id}.jsonl") else 0

    os.makedirs(args.out, exist_ok=True)
    t0 = time.time()
    child_env = os.environ | {
        # don't oversubscribe: N workers share the box, so each JVM gets
        # a slice of threads and a bounded heap
        "SPARK_GRAFT_CPUS": str(max(4, (os.cpu_count() or 32) // args.workers)),
        "SPARK_GRAFT_DRIVER_MEM": "6g",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--worker-id", str(i), "--workers", str(args.workers),
             "--out", args.out],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            env=child_env,
        )
        for i in range(args.workers)
    ]
    for p in procs:
        p.wait()
    print(f"parallel phase done in {time.time()-t0:.0f}s; isolation phase "
          f"({len(isolate)} ops) starting", flush=True)
    run_ops(isolate, f"{args.out}/isolated.jsonl")

    rows = []
    for fn in os.listdir(args.out):
        if fn.endswith(".jsonl"):
            with open(os.path.join(args.out, fn)) as f:
                rows += [json.loads(l) for l in f]
    n_pass = sum(r["status"] == "pass" for r in rows)
    n_ro = sum(r["status"] == "rows_only_ran" for r in rows)
    bad = [r for r in rows if r["status"] in ("FAIL", "ERROR")]
    print(f"TOTAL {len(rows)} checks: {n_pass} pass, {n_ro} rows-only ran, "
          f"{len(bad)} bad [{time.time()-t0:.0f}s]")
    for r in bad:
        print("BAD:", r["op"], r["sf"], r["status"], r.get("detail"))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
