"""Newest-wins merge semantics — mirrors reference TestMerge.java:71-82 and
TestExportUpdate.java update-mode cases (SURVEY.md §5)."""

import os

import pytest
from pyspark.sql import types as T

from sqoop_spark.cdc.merge import MergeMode, merge_apply, newest_wins_reduce
from sqoop_spark.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("event_seq", T.LongType()),
    ]
)
BATCH_SCHEMA = T.StructType(SCHEMA.fields + [T.StructField("op", T.StringType())])


def make(spark, scratch):
    return LakeTable.create(
        spark, os.path.join(scratch, "t"), SCHEMA, ["repo", "path"], num_buckets=4
    )


def batch(spark, rows):
    return spark.createDataFrame(rows, BATCH_SCHEMA)


def state(t):
    return {(r.repo, r.path): (r.content, r.event_seq) for r in t.read().collect()}


def test_merge_newest_wins_testmerge_scenario(spark, scratch):
    """init {(0,0),(1,42)}, new {(1,43),(3,313)} ⇒ {(0,0),(1,43),(3,313)}.

    The TestMerge.java:71-82 dataset keyed on (repo,path)."""
    t = make(spark, scratch)
    t.append(
        spark.createDataFrame(
            [("r", "k0", "v0", 0), ("r", "k1", "v42", 1)], SCHEMA
        )
    )
    stats = merge_apply(
        t,
        batch(spark, [("r", "k1", "v43", 2, "upsert"), ("r", "k3", "v313", 3, "upsert")]),
        batch_id=1,
    )
    assert state(t) == {
        ("r", "k0"): ("v0", 0),
        ("r", "k1"): ("v43", 2),
        ("r", "k3"): ("v313", 3),
    }
    assert (stats.updated, stats.inserted, stats.deleted) == (1, 1, 0)


def test_duplicate_keys_highest_event_seq_wins(spark, scratch):
    """Deterministic tightening of MergeReducerBase last-seen-wins."""
    t = make(spark, scratch)
    rows = [
        ("r", "k", "v1", 10, "upsert"),
        ("r", "k", "v2", 30, "upsert"),
        ("r", "k", "v3", 20, "upsert"),
    ]
    merge_apply(t, batch(spark, rows), batch_id=0)
    assert state(t) == {("r", "k"): ("v2", 30)}


def test_delete_op(spark, scratch):
    t = make(spark, scratch)
    t.append(spark.createDataFrame([("r", "a", "x", 0), ("r", "b", "y", 1)], SCHEMA))
    stats = merge_apply(t, batch(spark, [("r", "a", None, 2, "delete")]), batch_id=1)
    assert state(t) == {("r", "b"): ("y", 1)}
    assert stats.deleted == 1


def test_delete_then_reinsert_in_one_batch(spark, scratch):
    t = make(spark, scratch)
    t.append(spark.createDataFrame([("r", "a", "x", 0)], SCHEMA))
    rows = [("r", "a", None, 5, "delete"), ("r", "a", "z", 6, "upsert")]
    merge_apply(t, batch(spark, rows), batch_id=1)
    assert state(t) == {("r", "a"): ("z", 6)}


def test_update_only_ignores_unmatched(spark, scratch):
    """Mirrors TestExportUpdate: rows with no match silently ignored
    (UpdateOutputFormat.java:85-211)."""
    t = make(spark, scratch)
    t.append(spark.createDataFrame([("r", "a", "x", 0)], SCHEMA))
    stats = merge_apply(
        t,
        batch(spark, [("r", "a", "x2", 1, "upsert"), ("r", "zz", "new", 2, "upsert")]),
        batch_id=1,
        mode=MergeMode.UPDATE_ONLY,
    )
    assert state(t) == {("r", "a"): ("x2", 1)}
    assert (stats.updated, stats.inserted) == (1, 0)


def test_allow_insert_upserts(spark, scratch):
    """Mirrors --update-mode allowinsert (MySQLManager.java:131-153)."""
    t = make(spark, scratch)
    t.append(spark.createDataFrame([("r", "a", "x", 0)], SCHEMA))
    stats = merge_apply(
        t,
        batch(
            spark,
            [
                ("r", "a", "x2", 1, "upsert"),
                ("r", "zz", "new", 2, "upsert"),
                ("r", "a", None, 3, "delete"),  # delete ignored in this mode
            ],
        ),
        batch_id=1,
        mode=MergeMode.ALLOW_INSERT,
    )
    # the delete (seq 3) wins the reduce for key (r,a) but is ignored → carry
    assert state(t) == {("r", "a"): ("x", 0), ("r", "zz"): ("new", 2)}
    assert stats.inserted == 1


def test_null_merge_key_raises(spark, scratch):
    """MergeMapperBase.java:70-84 errors on null key."""
    t = make(spark, scratch)
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    with pytest.raises(Exception, match="null merge key"):
        merge_apply(t, batch(spark, [(None, "a", "x", 0, "upsert")]), batch_id=0)


def test_newest_wins_reduce_with_salt_matches_plain(spark):
    rows = [("r", f"k{i % 5}", f"v{i}", i, "upsert") for i in range(200)]
    df = spark.createDataFrame(rows, BATCH_SCHEMA)
    plain = {
        (r.repo, r.path): r.event_seq
        for r in newest_wins_reduce(df, ["repo", "path"]).collect()
    }
    salted = {
        (r.repo, r.path): r.event_seq
        for r in newest_wins_reduce(df, ["repo", "path"], salt_partitions=8).collect()
    }
    assert plain == salted
    assert plain[("r", "k4")] == 199


def test_fenced_batch_noop(spark, scratch):
    t = make(spark, scratch)
    merge_apply(t, batch(spark, [("r", "a", "x", 0, "upsert")]), batch_id=5)
    import sqoop_spark.errors as E

    with pytest.raises(E.EngineError, match="fenced|already applied"):
        merge_apply(t, batch(spark, [("r", "a", "y", 1, "upsert")]), batch_id=5)
    assert state(t) == {("r", "a"): ("x", 0)}


def test_first_arrival_dedup_keeps_first_copy(spark):
    """At-least-once redelivery: the FIRST arrival per event id survives
    (deterministic, auditable); redelivered copies drop even when they
    arrive interleaved."""
    from sqoop_spark.cdc.merge import first_arrival_dedup

    rows = [
        # (event_id, ingest_seq, delivery_tag)
        (1, 100, "orig"),
        (2, 101, "orig"),
        (1, 102, "redelivery"),
        (3, 103, "orig"),
        (2, 104, "redelivery"),
        (1, 105, "redelivery"),
    ]
    df = spark.createDataFrame(rows, "event_id LONG, ingest_seq LONG, tag STRING")
    got = {
        (r.event_id, r.ingest_seq, r.tag)
        for r in first_arrival_dedup(df, ["event_id"], "ingest_seq").collect()
    }
    assert got == {(1, 100, "orig"), (2, 101, "orig"), (3, 103, "orig")}
