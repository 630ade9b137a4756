"""The north rule's literal deployment form: the job ships as
``spark-submit --py-files engine.zip driver.py`` and produces the same
final table state at two parallelism levels.

The bench harness measures the N-vs-4N *throughput* pair in-process
(BASELINE.md § scaling); this test pins the *packaging* contract — the
engine importable from a zip on a cold spark-submit JVM, no repo on
sys.path — and the two-parallelism *correctness* pair (identical content
checksum at local[1] and local[4], the same invariant the reference's
merge tests assert per-row)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

import pyspark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRATCH = os.path.join(REPO, ".scratch", "submit")

DRIVER = '''
import json, sys
from pyspark.sql import SparkSession, functions as F

# only the zip provides the package: fail loudly if the repo leaked in
import sqoop_spark
assert ".zip" in sqoop_spark.__file__, sqoop_spark.__file__

from sqoop_spark.cdc import CdcEngine
from sqoop_spark.datagen import synthesize_change_events

out_dir, n_events = sys.argv[1], int(sys.argv[2])
spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
ev = synthesize_change_events(spark, n_events, batch_size=n_events // 4)
eng = CdcEngine.create_table(spark, out_dir, num_buckets=8)
eng.replay(ev)
final = eng.table.read()
row = final.agg(
    F.count("*").alias("rows"),
    F.sum(F.conv(F.substring("content_sha", 1, 8), 16, 10).cast("long")).alias("ck"),
).collect()[0]
print("SUBMIT_RESULT " + json.dumps({"rows": row["rows"], "ck": row["ck"]}))
spark.stop()
'''


def _build_zip(path: str) -> None:
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(REPO, "sqoop_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))


def _submit(master: str, zip_path: str, driver_path: str, out_dir: str) -> dict:
    spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [
            spark_submit,
            "--master", master,
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            driver_path, out_dir, "4000",
        ],
        cwd=SCRATCH,  # not the repo root: the zip must be the import source
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    for line in proc.stdout.splitlines():
        if line.startswith("SUBMIT_RESULT "):
            return json.loads(line[len("SUBMIT_RESULT "):])
    raise AssertionError(f"no SUBMIT_RESULT in stdout: {proc.stdout[-2000:]}")


def test_spark_submit_py_files_two_parallelism_levels():
    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH, exist_ok=True)
    zip_path = os.path.join(SCRATCH, "engine.zip")
    _build_zip(zip_path)
    driver_path = os.path.join(SCRATCH, "driver.py")
    with open(driver_path, "w") as f:
        f.write(DRIVER)

    lo = _submit("local[1]", zip_path, driver_path, os.path.join(SCRATCH, "t1"))
    hi = _submit("local[4]", zip_path, driver_path, os.path.join(SCRATCH, "t4"))
    assert lo["rows"] > 0
    # same final state at both cluster sizes (rows + content-sha checksum)
    assert lo == hi
