"""Python-worker importability from a FOREIGN working directory.

Root-caused this round: a driver that can import the package (via
sys.path manipulation) but runs with a cwd outside the repo executes
every JVM-side op fine and fails exactly the python-worker ops
(mapInPandas / Python UDTF / Python data source / transformWithState)
with ModuleNotFoundError in the worker — workers inherit only
PYTHONPATH/cwd from the JVM, not the driver's sys.path. The loader now
ships the package via addPyFile (tables._ensure_worker_importable);
this test drives a worker-dependent op from /tmp in a clean subprocess
to prove the fix end-to-end.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .appName("igis-worker-import-test").getOrCreate())
from insight_gp_import_spark.registry import load_all_ops
ops = load_all_ops()
df = ops["mm_decode_features"].fn(spark, "/root/testdata/sf0.001")
n = df.count()
assert n > 0, n
print("WORKER_IMPORT_OK", n)
"""


def test_python_worker_ops_survive_foreign_cwd():
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the hostile case: nothing but the zip
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=REPO)],
        cwd="/tmp",
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "WORKER_IMPORT_OK" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]
