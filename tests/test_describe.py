"""LakeTable.describe / the `describe` CLI: metadata-only table health.

The operational dashboard row a 100 TB deployment watches: delta
backlog (compaction signal), zone-map coverage (what incremental reads
and lookups can prune on), fence/tag/staged state — all computed from
the manifest without a Spark session or any data IO.
"""

import json
import os
import subprocess
import sys

from pyspark.sql import types as T

from sqoop_spark.lake import LakeTable


def _table(spark, scratch, name, buckets=4):
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("v", T.StringType()),
        ]
    )
    t = LakeTable.create(
        spark, os.path.join(scratch, name), schema, ["k"],
        num_buckets=buckets, properties={"order_column": "seq"},
    )
    return t, schema


def test_describe_counts_and_backlog(spark, scratch):
    t, schema = _table(spark, scratch, "d1")
    t.append(spark.createDataFrame(
        [(k, k, f"v{k}") for k in range(20)], schema
    ), batch_id=1)
    d = T.StructType(schema.fields + [T.StructField("op", T.StringType())])
    t.append_delta(spark.createDataFrame(
        [(3, 100, "x", "upsert"), (4, 100, "y", "upsert")], d
    ), batch_id=2)
    rep = t.describe()
    assert rep["version"] == t.current_version()
    assert rep["rows"] == 22 and rep["num_buckets"] == 4
    assert rep["files"]["delta"] >= 1 and rep["files"]["tombstone"] == 0
    assert rep["files"]["total"] == (
        rep["files"]["base"] + rep["files"]["delta"]
    )
    assert rep["delta_buckets"] >= 1
    assert rep["max_bucket_delta_files"] >= 1
    assert rep["bytes"] > 0
    assert rep["fenced_batches"] == 2
    # key + order columns are zone-mapped on every file written now
    assert rep["zone_map_coverage"]["k"] == 1.0
    assert rep["zone_map_coverage"]["seq"] == 1.0
    # no spark session required
    t2 = LakeTable(None, t.path)
    assert t2.describe()["rows"] == 22


def test_describe_reflects_tags_staged_and_versions(spark, scratch):
    t, schema = _table(spark, scratch, "d2")
    t.append(spark.createDataFrame([(1, 1, "a")], schema))
    t.set_tag("gold")
    t.stage(spark.createDataFrame([(2, 2, "b")], schema), "pending")
    rep = t.describe()
    assert rep["tags"] == {"gold": t.current_version()}
    assert rep["staged_wap_ids"] == ["pending"]
    assert rep["snapshots_retained"] == t.current_version()
    # describing an old snapshot reports ITS file set
    old = t.describe(version=1)
    assert old["version"] == 1 and old["rows"] == 0


def test_describe_cli(spark, scratch):
    t, schema = _table(spark, scratch, "d3")
    t.append(spark.createDataFrame([(1, 1, "a")], schema))
    r = subprocess.run(
        [sys.executable, "-m", "sqoop_spark.cli", "describe", "--path", t.path],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    rep = json.loads(r.stdout)
    assert rep["rows"] == 1 and rep["files"]["total"] >= 1
