"""--hive-import against a REAL embedded Derby metastore.

The reference's HiveImport (hive/HiveImport.java:241-267) generates DDL and
LOAD DATAs the imported files into the metastore; here the merged snapshot
is published via ``saveAsTable`` into a Hive-catalog session backed by an
embedded Derby metastore (the same metastore Hive itself embeds when no
server is configured). Spark fixes the catalog implementation at JVM start,
so this test runs in its own subprocess — the pytest session fixture holds
a non-Hive JVM (and ``build_session`` raises in exactly that situation,
also pinned here).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRATCH = os.path.join(REPO, ".scratch", "hive")

SCRIPT = '''
import json, os, sys
sys.path.insert(0, sys.argv[3])
from sqoop_spark.session import build_session
from sqoop_spark.datagen import synthesize_change_events
from sqoop_spark.errors import EngineError
from sqoop_spark.lake import LakeTable
from sqoop_spark import cli

ms_dir, scratch = sys.argv[1], sys.argv[2]
spark = build_session(parallelism=4, shuffle_partitions=4, hive_metastore=ms_dir)
spark.sparkContext.setLogLevel("ERROR")
ev = synthesize_change_events(spark, 2000, batch_size=1000)
ev.write.parquet(f"{scratch}/src")
argv = ["import", "--table", f"{scratch}/src", "--target", f"{scratch}/lake",
        "--merge-key", "repo,path", "--num-buckets", "8",
        "--check-column", "event_seq",
        "--hive-import", "--hive-table", "repos", "--hive-metastore", ms_dir]
assert cli.main(list(argv)) == 0
want = LakeTable(spark, f"{scratch}/lake").read().count()
got = spark.table("default.repos").count()

# existing metastore table without --hive-overwrite must error
try:
    cli.main(list(argv))
    second = "no-error"
except EngineError as e:
    second = "exists-error" if "already exists" in str(e) else str(e)

# --hive-overwrite republishes the (unchanged) snapshot
assert cli.main(list(argv) + ["--hive-overwrite"]) == 0
after = spark.table("default.repos").count()

# --hive-partition-key/-value: first publish creates the partitioned
# table, a second value lands a NEW partition, republishing the first
# value replaces ONLY that partition (other partitions untouched)
pargv = ["import", "--table", f"{scratch}/src", "--target", f"{scratch}/lake2",
         "--merge-key", "repo,path", "--num-buckets", "8",
         "--check-column", "event_seq",
         "--hive-import", "--hive-table", "repos_p", "--hive-metastore", ms_dir,
         "--hive-partition-key", "load_dt"]
assert cli.main(list(pargv) + ["--hive-partition-value", "2026-08-01"]) == 0
p1 = spark.table("default.repos_p").where("load_dt='2026-08-01'").count()
assert cli.main(list(pargv) + ["--hive-partition-value", "2026-08-02"]) == 0
parts = spark.sql("SHOW PARTITIONS default.repos_p").count()
# republish the first partition: row count per partition unchanged,
# second partition still present
assert cli.main(list(pargv) + ["--hive-partition-value", "2026-08-01"]) == 0
p1_after = spark.table("default.repos_p").where("load_dt='2026-08-01'").count()
p2_after = spark.table("default.repos_p").where("load_dt='2026-08-02'").count()

# a DIFFERENT metastore directory in the same process must raise:
# getOrCreate would silently reuse this session (static confs dropped)
# and publish into the wrong catalog
try:
    build_session(hive_metastore=os.path.join(scratch, "other_ms"))
    wrong_dir = "no-error"
except EngineError as e:
    wrong_dir = "rooted-error" if "rooted at" in str(e) else str(e)

print("HIVE_RESULT " + json.dumps({
    "rows": got, "want": want, "second": second, "after_overwrite": after,
    "wrong_dir": wrong_dir,
    "p1": p1, "parts": parts, "p1_after": p1_after, "p2_after": p2_after,
    "catalog": spark.conf.get("spark.sql.catalogImplementation"),
    "metastore_on_disk": os.path.isdir(os.path.join(ms_dir, "metastore_db")),
}))
spark.stop()
'''


def test_hive_import_publishes_to_embedded_metastore():
    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH, exist_ok=True)
    ms_dir = os.path.join(SCRATCH, "metastore")
    script = os.path.join(SCRATCH, "run_hive.py")
    with open(script, "w") as f:
        f.write(SCRIPT)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO  # python workers need the package importable
    proc = subprocess.run(
        [sys.executable, script, ms_dir, SCRATCH, REPO],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=SCRATCH,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = next(
        (ln for ln in proc.stdout.splitlines() if ln.startswith("HIVE_RESULT ")),
        None,
    )
    assert line, f"no HIVE_RESULT in stdout: {proc.stdout[-2000:]}"
    got = json.loads(line[len("HIVE_RESULT "):])
    assert got["catalog"] == "hive"
    assert got["rows"] == got["want"] > 0
    assert got["second"] == "exists-error"
    assert got["after_overwrite"] == got["rows"]
    assert got["wrong_dir"] == "rooted-error"
    assert got["metastore_on_disk"]
    # partitioned publish: two partitions exist, republish of one left
    # both intact with per-partition row counts preserved
    assert got["parts"] == 2
    assert got["p1"] == got["p1_after"] == got["p2_after"] == got["rows"]


def test_hive_session_mismatch_raises(spark):
    """Requesting a Hive metastore when the process already holds a
    non-Hive session must raise loudly instead of silently publishing to
    the in-memory catalog."""
    from sqoop_spark.errors import EngineError
    from sqoop_spark.session import build_session

    with pytest.raises(EngineError, match="without Hive support"):
        build_session(hive_metastore=os.path.join(SCRATCH, "nope"))
