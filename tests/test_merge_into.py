"""merge_into: generic clause-driven MERGE (Iceberg/Delta MERGE INTO).

The frame-driven sibling of the CDC newest-wins merge — the caller states
what happens to matched/unmatched rows instead of relying on the order
column. Same bucket-granular CoW machinery as delete_where/update_where.
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqoop_spark.errors import ConcurrentCommitError, EngineError
from sqoop_spark.lake import LakeTable


def _seq_table(spark, scratch, name, buckets=4):
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


def _rows(t):
    return {r.k: (r.seq, r.v) for r in t.read().collect()}


def test_merge_into_three_clauses(spark, scratch):
    """delete / update / insert clauses in one merge; rows matched by no
    clause carry unchanged; unmatched target rows untouched."""
    t, schema = _seq_table(spark, scratch, "m1")
    t.append(spark.createDataFrame(
        [(k, k, f"v{k}") for k in range(8)], schema
    ))
    src = spark.createDataFrame(
        [(0, 99, "DEL"), (1, 99, "upd1"), (2, 99, "upd2"), (50, 99, "new")],
        schema,
    )
    m = t.merge_into(
        src,
        when_matched_update={"v": "s.v || '/' || t.v"},
        when_matched_delete="s.v = 'DEL'",
        when_not_matched_insert=True,
    )
    assert m["operation"] == "merge-into"
    assert m["summary"]["source_keys"] == 4
    rows = _rows(t)
    assert 0 not in rows
    assert rows[1] == (1, "upd1/v1") and rows[2] == (2, "upd2/v2")
    assert rows[50] == (99, "new")
    assert rows[7] == (7, "v7"), "unmatched target rows untouched"


def test_merge_into_upsert_source_wholesale(spark, scratch):
    """when_matched_update='source' + insert=True is the classic upsert."""
    t, schema = _seq_table(spark, scratch, "m2")
    t.append(spark.createDataFrame([(1, 1, "old"), (2, 2, "keep")], schema))
    src = spark.createDataFrame([(1, 10, "new"), (3, 10, "ins")], schema)
    t.merge_into(src, when_matched_update="source")
    assert _rows(t) == {1: (10, "new"), 2: (2, "keep"), 3: (10, "ins")}


def test_merge_into_insert_dict_defaults_null(spark, scratch):
    """Insert clause as a dict: key columns come from the source, listed
    columns evaluate over s, unlisted non-key columns insert NULL."""
    t, schema = _seq_table(spark, scratch, "m3")
    t.append(spark.createDataFrame([(1, 1, "a")], schema))
    src = spark.createDataFrame([(9,)], "k LONG")
    t.merge_into(
        src,
        when_not_matched_insert={"seq": "0"},
    )
    rows = {r.k: (r.seq, r.v) for r in t.read().collect()}
    assert rows[9] == (0, None)


def test_merge_into_update_condition_gates(spark, scratch):
    t, schema = _seq_table(spark, scratch, "m4")
    t.append(spark.createDataFrame([(1, 5, "a"), (2, 50, "b")], schema))
    src = spark.createDataFrame([(1, 99, "s1"), (2, 99, "s2")], schema)
    # only rows whose source seq is newer than the target's update
    t.merge_into(
        src,
        when_matched_update="source",
        update_condition="s.seq > t.seq + 50",
        when_not_matched_insert=False,
    )
    assert _rows(t) == {1: (99, "s1"), 2: (50, "b")}


def test_merge_into_untouched_buckets_carry_by_reference(spark, scratch):
    t, schema = _seq_table(spark, scratch, "m5", buckets=8)
    t.append(spark.createDataFrame(
        [(k, k, f"v{k}") for k in range(64)], schema
    ))
    base = t.manifest()
    src = spark.createDataFrame([(3, 99, "u")], schema)
    victim = spark.createDataFrame([(3,)], "k LONG").select(
        t.bucket_expr().alias("b")).collect()[0][0]
    t.merge_into(src, when_matched_update="source",
                 when_not_matched_insert=False)
    after = t.manifest()
    assert after["summary"]["rewritten_buckets"] == 1
    b_paths = lambda m: {e["path"] for e in m["files"] if e["bucket"] != victim}
    assert b_paths(base) == b_paths(after)


def test_merge_into_guards(spark, scratch):
    t, schema = _seq_table(spark, scratch, "m6")
    t.append(spark.createDataFrame([(1, 1, "a")], schema))
    with pytest.raises(EngineError, match="multiple source rows"):
        t.merge_into(spark.createDataFrame([(1, 1, "a"), (1, 2, "b")], schema))
    with pytest.raises(EngineError, match="NULL merge key"):
        t.merge_into(spark.createDataFrame([(None, 1, "a")], schema))
    with pytest.raises(EngineError, match="key column"):
        t.merge_into(spark.createDataFrame([(1, 1, "a")], schema),
                     when_matched_update={"k": "9"})
    with pytest.raises(EngineError, match="missing key column"):
        t.merge_into(spark.createDataFrame([(1,)], "seq LONG"))
    with pytest.raises(EngineError, match="every table column"):
        t.merge_into(spark.createDataFrame([(7,)], "k LONG"),
                     when_not_matched_insert=True)
    before = t.current_version()
    empty = spark.createDataFrame([], schema)
    assert t.merge_into(empty)["version"] == before, "empty source = noop"


def test_merge_into_delete_leaves_guarding_tombstone(spark, scratch):
    """A merge-delete leaves the same payload-free marker as delete_where:
    stale lower-seq replays stay suppressed, newer upserts resurrect."""
    import pyarrow.parquet as pq

    t, schema = _seq_table(spark, scratch, "m7", buckets=1)
    op_schema = T.StructType(schema.fields + [T.StructField("op", T.StringType())])
    t.append(spark.createDataFrame([(1, 100, "secret")], schema))
    t.merge_into(
        spark.createDataFrame([(1, 0, "z")], schema),
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    assert _rows(t) == {}
    tomb = [e for e in t.manifest()["files"] if e.get("tombstone")]
    for e in tomb:
        d = pq.read_table(os.path.join(t.path, e["path"])).to_pydict()
        assert d["v"] == [None] and d["seq"] == [100], "payload-free, target order"
    t.append_delta(spark.createDataFrame([(1, 90, "stale", "upsert")], op_schema))
    assert _rows(t) == {}
    t.append_delta(spark.createDataFrame([(1, 200, "fresh", "upsert")], op_schema))
    assert _rows(t) == {1: (200, "fresh")}


def test_cli_merge_into(spark, scratch, capsys):
    import json

    from sqoop_spark.cli import main as cli_main

    t, schema = _seq_table(spark, scratch, "mcli")
    t.append(spark.createDataFrame(
        [(k, k, f"v{k}") for k in range(6)], schema
    ))
    src_path = os.path.join(scratch, "src.parquet")
    spark.createDataFrame(
        [(0, 99, "DEL"), (1, 99, "u1"), (50, 99, "new")], schema
    ).write.parquet(src_path)

    rc = cli_main([
        "merge-into", "--path", t.path, "--source", src_path,
        "--update", "v=s.v || '!'",
        "--delete-when", "s.v = 'DEL'",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["source_keys"] == 3
    t2 = LakeTable.load(spark, t.path)
    rows = _rows(t2)
    assert 0 not in rows and rows[1] == (1, "u1!") and rows[50] == (99, "new")

    # --no-insert drops unmatched source rows
    src2 = os.path.join(scratch, "src2.parquet")
    spark.createDataFrame([(77, 1, "x")], schema).write.parquet(src2)
    rc = cli_main([
        "merge-into", "--path", t.path, "--source", src2, "--no-insert",
        "--update-source",
    ])
    assert rc == 0
    assert 77 not in _rows(LakeTable.load(spark, t.path))


def test_merge_into_retry_recomputes(spark, scratch):
    t1, schema = _seq_table(spark, scratch, "m8", buckets=2)
    t1.append(spark.createDataFrame([(1, 1, "a")], schema))
    t2 = LakeTable.load(spark, t1.path)
    real = t2._write_manifest
    state = {"raced": False}

    def racy(manifest):
        if not state["raced"]:
            state["raced"] = True
            t1.append(spark.createDataFrame([(2, 1, "b")], schema))
        return real(manifest)

    t2._write_manifest = racy
    src = spark.createDataFrame([(1, 9, "u")], schema)
    with pytest.raises(ConcurrentCommitError):
        t2.merge_into(src, when_matched_update="source",
                      when_not_matched_insert=False)
    t2 = LakeTable.load(spark, t1.path)
    m = t2.merge_into(src, when_matched_update="source",
                      when_not_matched_insert=False, retry_recompute=2)
    assert m["operation"] == "merge-into"
    assert _rows(t2) == {1: (9, "u"), 2: (1, "b")}, "racer's row survives"
