"""Oracle-gate a subset of ops at both test SFs (post-edit verification).

Usage: python tools/gate_ops.py op1,op2,... [--sfs /root/testdata/sf0.01,/root/testdata/sf0.1]
Prints one line per (op, sf): PASS/FAIL + detail; exits non-zero on any FAIL.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ops")
    ap.add_argument(
        "--sfs", default="/root/testdata/sf0.01,/root/testdata/sf0.1"
    )
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from insight_gp_import_spark.compare import compare
    from insight_gp_import_spark.registry import load_all_ops
    from insight_gp_import_spark.session import get_session

    spark = get_session(
        app_name="igis-gate", master=f"local[{cpus}]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    ops = load_all_ops()
    failed = 0
    for name in args.ops.split(","):
        o = ops[name]
        for sf_dir in args.sfs.split(","):
            if o.oracle is None:
                print(f"{name} {sf_dir}: SKIP (no oracle)", flush=True)
                continue
            df = o.fn(spark, sf_dir)
            res = compare(name, df, o.oracle, sf_dir)
            ok = getattr(res, "ok", None)
            if ok is None:
                ok = not getattr(res, "err", None)
            status = "PASS" if ok else "FAIL"
            if not ok:
                failed += 1
            print(f"{name} {sf_dir}: {status} {res}", flush=True)
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
