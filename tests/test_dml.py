"""Row-level DML (delete_where / update_where), rollback_to, snapshot tags.

The DML surface is the lakehouse side of the CDC contract the event
stream cannot express: GDPR erasure and manual correction are statements
about the TABLE, not events from the source (the reference has no analog
— Sqoop's imports are write-once MR outputs). Semantics mirror
Iceberg/Delta DELETE FROM / UPDATE / rollback_to_snapshot / tags.
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


# -- delete_where -------------------------------------------------------------


def test_delete_where_basic(spark, scratch):
    t, schema = _seq_table(spark, scratch, "d1")
    t.append(spark.createDataFrame(
        [(k, k, f"v{k}") for k in range(10)], schema
    ))
    m = t.delete_where("k % 3 = 0")
    assert m["operation"] == "delete"
    assert m["summary"]["rows_deleted"] == 4  # 0,3,6,9
    assert set(_rows(t)) == {1, 2, 4, 5, 7, 8}


def test_delete_where_no_match_is_noop(spark, scratch):
    t, schema = _seq_table(spark, scratch, "d2")
    t.append(spark.createDataFrame([(1, 1, "a")], schema))
    before = t.current_version()
    m = t.delete_where("v = 'nope'")
    assert m["version"] == before, "no-match must not commit"


def test_delete_where_null_condition_keeps_row(spark, scratch):
    """SQL DML semantics: DELETE touches rows where cond IS TRUE; a NULL
    condition (e.g. a predicate over a NULL column) keeps the row."""
    t, schema = _seq_table(spark, scratch, "d3")
    t.append(spark.createDataFrame(
        [(1, 1, "x"), (2, 2, None)], schema
    ))
    t.delete_where(F.col("v").startswith("x"))
    assert set(_rows(t)) == {2}, "NULL-condition row must survive"


def test_delete_rewrites_only_matched_buckets(spark, scratch):
    """Copy-on-write is bucket-granular: files of buckets holding no
    matching row are carried by REFERENCE (identical paths), not
    rewritten."""
    t, schema = _seq_table(spark, scratch, "d4", buckets=8)
    t.append(spark.createDataFrame(
        [(k, k, f"v{k}") for k in range(64)], schema
    ))
    base = t.manifest()
    victim = t.spark.createDataFrame([(7,)], "k LONG").select(
        t.bucket_expr().alias("b")).collect()[0][0]
    t.delete_where("k = 7")
    after = t.manifest()
    before_paths = {e["path"] for e in base["files"] if e["bucket"] != victim}
    after_paths = {e["path"] for e in after["files"] if e["bucket"] != victim}
    assert before_paths == after_paths, "untouched buckets must carry by ref"
    assert after["summary"]["rewritten_buckets"] == 1
    assert 7 not in _rows(t) and len(_rows(t)) == 63


def test_delete_tombstone_is_payload_free_and_blocks_stale_events(spark, scratch):
    """GDPR contract: the retained delete marker carries ONLY the key and
    order value (payload columns NULL), and a late OUT-OF-ORDER event with
    a lower order value loses to it — erased data cannot be resurrected by
    a replayed stale event — while a genuinely newer upsert legitimately
    re-creates the key."""
    import pyarrow.parquet as pq

    t, schema = _seq_table(spark, scratch, "d5", buckets=2)
    t.append(spark.createDataFrame([(1, 100, "secret"), (2, 50, "b")], schema))
    t.delete_where("k = 1")

    tomb = [e for e in t.manifest()["files"] if e.get("tombstone")]
    assert tomb, "predicate delete must retain a tombstone marker"
    for e in tomb:
        tbl = pq.read_table(os.path.join(t.path, e["path"]))
        d = tbl.to_pydict()
        assert all(x is None for x in d["v"]), "payload must be erased"
        assert d["k"] == [1] and d["seq"] == [100]

    op_schema = T.StructType(schema.fields + [T.StructField("op", T.StringType())])
    # stale replay: seq 90 < tombstone's 100 → still deleted
    t.append_delta(spark.createDataFrame([(1, 90, "stale", "upsert")], op_schema))
    assert 1 not in _rows(t), "stale out-of-order event must not resurrect"
    # genuinely newer event → key legitimately returns
    t.append_delta(spark.createDataFrame([(1, 200, "fresh", "upsert")], op_schema))
    assert _rows(t)[1] == (200, "fresh")


def test_delete_under_unmerged_deltas_keeps_cdc_tombstones(spark, scratch):
    """A DML rewrite of a bucket holding unmerged MoR deltas resolves it
    (same output the compactor would produce) and must CARRY the winning
    CDC delete markers — dropping them would re-open the out-of-order
    resurrection hole compact guards against."""
    t, schema = _seq_table(spark, scratch, "d6", buckets=1)
    op_schema = T.StructType(schema.fields + [T.StructField("op", T.StringType())])
    t.append(spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b"), (3, 10, "c")], schema
    ))
    # unmerged deltas: update k=1, CDC-delete k=2
    t.append_delta(spark.createDataFrame(
        [(1, 20, "a2", "upsert"), (2, 20, None, "delete")], op_schema
    ))
    m = t.delete_where("k = 3")
    assert m["summary"]["rows_deleted"] == 1
    assert _rows(t) == {1: (20, "a2")}
    # both markers retained: CDC delete of k=2 AND predicate delete of k=3
    import pyarrow.parquet as pq
    tomb_keys = set()
    for e in t.manifest()["files"]:
        if e.get("tombstone"):
            tomb_keys.update(
                pq.read_table(os.path.join(t.path, e["path"]))["k"].to_pylist()
            )
    assert tomb_keys == {2, 3}
    # stale replay of the CDC-deleted key still loses
    t.append_delta(spark.createDataFrame([(2, 15, "ghost", "upsert")], op_schema))
    assert 2 not in _rows(t)


def test_delete_retry_recomputes_around_live_ingest(spark, scratch):
    """DML racing a live writer loses the base-pinned commit; with
    retry_recompute it re-runs against the fresh manifest and the racer's
    rows are seen by the predicate (compact's standing-writer loop)."""
    t1, schema = _seq_table(spark, scratch, "d7", buckets=2)
    t1.append(spark.createDataFrame([(1, 1, "del-me"), (2, 1, "keep")], schema))
    t2 = LakeTable.load(spark, t1.path)

    real = t2._write_manifest
    state = {"raced": False}

    def racy(manifest):
        if not state["raced"]:
            state["raced"] = True
            t1.append(spark.createDataFrame([(3, 1, "del-me")], schema))
        return real(manifest)

    t2._write_manifest = racy
    with pytest.raises(ConcurrentCommitError):
        t2.delete_where("v = 'del-me'")

    t2 = LakeTable.load(spark, t1.path)
    m = t2.delete_where("v = 'del-me'", retry_recompute=2)
    assert m["operation"] == "delete"
    assert m["summary"]["rows_deleted"] == 2, "retry must see the racer's row"
    assert set(_rows(t2)) == {2}


# -- update_where -------------------------------------------------------------


def test_update_where_expression_sees_row(spark, scratch):
    t, schema = _seq_table(spark, scratch, "u1")
    t.append(spark.createDataFrame(
        [(k, k, f"v{k}") for k in range(6)], schema
    ))
    m = t.update_where("k >= 4", {"v": "upper(v) || '-' || cast(seq as string)"})
    assert m["operation"] == "update"
    assert m["summary"]["rows_updated"] == 2
    assert m["summary"]["set_columns"] == ["v"]
    rows = _rows(t)
    assert rows[4] == (4, "V4-4") and rows[5] == (5, "V5-5")
    assert rows[0] == (0, "v0"), "non-matching rows untouched"


def test_update_where_guards(spark, scratch):
    t, schema = _seq_table(spark, scratch, "u2")
    t.append(spark.createDataFrame([(1, 1, "a")], schema))
    with pytest.raises(EngineError, match="key column"):
        t.update_where("true", {"k": "99"})
    with pytest.raises(EngineError, match="no such column"):
        t.update_where("true", {"nope": "1"})
    with pytest.raises(EngineError, match="empty assignments"):
        t.update_where("true", {})
    before = t.current_version()
    assert t.update_where("false", {"v": "'x'"})["version"] == before


def test_update_keeps_order_so_newer_events_still_win(spark, scratch):
    """A manual UPDATE keeps the row's original order value: a newer CDC
    event supersedes the manual correction; an older one does not clobber
    it after the bucket resolves."""
    t, schema = _seq_table(spark, scratch, "u3", buckets=1)
    op_schema = T.StructType(schema.fields + [T.StructField("op", T.StringType())])
    t.append(spark.createDataFrame([(1, 100, "wrong")], schema))
    t.update_where("k = 1", {"v": "'corrected'"})
    assert _rows(t)[1] == (100, "corrected")
    t.append_delta(spark.createDataFrame([(1, 50, "older", "upsert")], op_schema))
    assert _rows(t)[1] == (100, "corrected"), "older event must lose"
    t.append_delta(spark.createDataFrame([(1, 150, "newer", "upsert")], op_schema))
    assert _rows(t)[1] == (150, "newer"), "newer event must win"


def test_update_under_deltas_carries_cdc_tombstones(spark, scratch):
    t, schema = _seq_table(spark, scratch, "u4", buckets=1)
    op_schema = T.StructType(schema.fields + [T.StructField("op", T.StringType())])
    t.append(spark.createDataFrame([(1, 10, "a"), (2, 10, "b")], schema))
    t.append_delta(spark.createDataFrame([(2, 20, None, "delete")], op_schema))
    t.update_where("k = 1", {"v": "'a2'"})
    assert _rows(t) == {1: (10, "a2")}
    # the CDC tombstone survived the rewrite: stale replay still loses
    t.append_delta(spark.createDataFrame([(2, 15, "ghost", "upsert")], op_schema))
    assert 2 not in _rows(t)


# -- rollback_to / tags --------------------------------------------------------


def test_rollback_restores_state_and_fence(spark, scratch):
    """Rollback is a metadata-only NEW commit: state equals the target
    version, zero data files are written, undone batch ids are unfenced so
    a corrected batch can be re-applied under the same id."""
    t, schema = _seq_table(spark, scratch, "r1")
    t.append(spark.createDataFrame([(1, 1, "a")], schema), batch_id=1)
    v_good = t.current_version()
    t.append(spark.createDataFrame([(2, 2, "bad")], schema), batch_id=2)
    files_before = {e["path"] for e in t.manifest()["files"]}

    m = t.rollback_to(v_good)
    assert m["operation"] == "rollback"
    assert t.current_version() == v_good + 2, "version line keeps moving"
    assert set(_rows(t)) == {1}
    assert {e["path"] for e in m["files"]} <= files_before, "metadata-only"
    assert t.fenced_batch_ids() == {1}, "undone batch must be unfenced"
    # corrected batch re-applies under the SAME id
    t.append(spark.createDataFrame([(2, 2, "good")], schema), batch_id=2)
    assert _rows(t)[2] == (2, "good")
    # the undone snapshot stays time-travelable
    assert {r.k for r in t.read(version=v_good + 1).collect()} == {1, 2}


def test_rollback_edge_cases(spark, scratch):
    t, schema = _seq_table(spark, scratch, "r2")
    t.append(spark.createDataFrame([(1, 1, "a")], schema))
    cur = t.current_version()
    assert t.rollback_to(cur)["version"] == cur, "rollback to current = noop"
    with pytest.raises(EngineError, match="rollback_to"):
        t.rollback_to(cur + 5)
    with pytest.raises(EngineError, match="rollback_to"):
        t.rollback_to(0)


def test_rollback_restores_bucket_layout_and_schema(spark, scratch):
    """Rolling back across a rebucket/evolve boundary restores the
    TARGET's layout and schema — a later merge buckets under the restored
    numbering."""
    t, schema = _seq_table(spark, scratch, "r3", buckets=2)
    t.append(spark.createDataFrame([(1, 1, "a")], schema))
    v = t.current_version()
    t.rebucket(8)
    t.add_column("extra", "string")
    t.rollback_to(v)
    assert t.num_buckets == 2
    assert "extra" not in t.schema().fieldNames()
    assert _rows(t) == {1: (1, "a")}


def test_tags_retained_by_expire(spark, scratch):
    """A tag is a retention declaration: expire_snapshots keeps the tagged
    manifest and its data files regardless of keep_last; untagged old
    versions expire as before."""
    t, schema = _seq_table(spark, scratch, "tg1")
    t.append(spark.createDataFrame([(1, 1, "a")], schema))
    v1 = t.current_version()
    t.delete_where("k = 1")
    t.append(spark.createDataFrame([(2, 2, "b")], schema))
    v3 = t.current_version()
    assert t.set_tag("audit-2026", v1) == v1
    assert t.resolve_ref("audit-2026") == v1

    info = t.expire_snapshots(keep_last=1)
    assert info["expired_versions"] < v3 - 1, "tagged version not expired"
    assert t.manifest_exists(v1), "tagged manifest retained"
    assert {r.k for r in t.read(version=v1).collect()} == {1}, (
        "tagged snapshot still readable, data files retained"
    )
    # untagged middle versions are gone
    assert not t.manifest_exists(v1 + 1)

    t.drop_tag("audit-2026")
    assert t.tags() == {}
    with pytest.raises(EngineError, match="drop_tag"):
        t.drop_tag("audit-2026")
    with pytest.raises(EngineError, match="resolve_ref"):
        t.resolve_ref("audit-2026")
    with pytest.raises(EngineError, match="set_tag"):
        t.set_tag("future", v3 + 9)


def test_changelog_reports_dml(spark, scratch):
    """Outbound CDC sees DML: changes_between across delete_where /
    update_where / rollback commits reports the row-level effect, so
    downstream replicas receive erasures and corrections as ordinary
    change rows."""
    t, schema = _seq_table(spark, scratch, "chg")
    t.append(spark.createDataFrame(
        [(k, k, f"v{k}") for k in range(6)], schema
    ))
    v0 = t.current_version()
    t.delete_where("k = 2")
    t.update_where("k = 3", {"v": "'fixed'"})
    diff = {(r.k, r._change) for r in t.changes_between(v0).collect()}
    assert diff == {(2, "delete"), (3, "update")}
    # rollback undoes both: the diff across the rollback is the inverse
    v_dml = t.current_version()
    t.rollback_to(v0)
    inv = {(r.k, r._change) for r in t.changes_between(v_dml).collect()}
    assert inv == {(2, "insert"), (3, "update")}


def test_gdpr_delete_propagates_to_replica(spark, scratch):
    """The erasure story end-to-end: a replica consuming the outbound
    changelog converges to the post-delete state — the deleted keys
    disappear downstream without a full resync."""
    from sqoop_spark.cdc import CdcEngine, JobStore
    from sqoop_spark.streaming import replicate_to_table

    t, schema = _seq_table(spark, scratch, "rep_src")
    t.append(spark.createDataFrame(
        [(k, k, f"v{k}") for k in range(8)], schema
    ))
    dst = LakeTable.create(
        spark, os.path.join(scratch, "rep_dst"), schema, ["k"],
        num_buckets=4, properties={"order_column": "seq"},
    )
    replica = CdcEngine(spark, dst, fingerprint=False)
    store = JobStore(os.path.join(scratch, "jobs"))
    store.create("rep", {"changelog.replica.version": None})
    replicate_to_table(t, replica, store, "rep")
    assert set(_rows(dst)) == set(range(8))

    t.delete_where("k in (1, 5)")
    t.update_where("k = 6", {"v": "'redacted'"})
    replicate_to_table(t, replica, store, "rep")
    rows = _rows(dst)
    assert set(rows) == {0, 2, 3, 4, 6, 7}
    assert rows[6] == (6, "redacted")


# -- CLI ----------------------------------------------------------------------


def test_cli_delete_update_rollback_tags(spark, scratch, capsys):
    import json

    from sqoop_spark.cli import main as cli_main

    t, schema = _seq_table(spark, scratch, "cli")
    t.append(spark.createDataFrame(
        [(k, k, f"v{k}") for k in range(8)], schema
    ))
    path = t.path

    assert cli_main(["history", "--path", path, "--set-tag", "pre-dml"]) == 0
    tagged_v = json.loads(capsys.readouterr().out)["version"]

    assert cli_main(["delete", "--path", path, "--where", "k < 2"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["rows_deleted"] == 2

    assert cli_main([
        "update", "--path", path, "--where", "k = 7",
        "--set", "v=upper(v)",
    ]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["rows_updated"] == 1 and out["set_columns"] == ["v"]
    t2 = LakeTable.load(spark, path)
    assert _rows(t2)[7] == (7, "V7") and 0 not in _rows(t2)

    # history shows the tag and the DML operations
    assert cli_main(["history", "--path", path]) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.splitlines()]
    ops = [x["operation"] for x in lines]
    assert "delete" in ops and "update" in ops
    assert any(x.get("tags") == ["pre-dml"] for x in lines)

    assert cli_main(["maintain", "--path", path, "--rollback", str(tagged_v)]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["rollback"]["restored"] == tagged_v
    t3 = LakeTable.load(spark, path)
    assert set(_rows(t3)) == set(range(8)), "rollback undid the DML"

    # bad --set syntax
    with pytest.raises(SystemExit):
        cli_main(["update", "--path", path, "--where", "true", "--set", "vx"])
