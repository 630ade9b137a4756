"""Incremental import scenarios — mirrors TestIncrementalImport.java:684-1385
(see SURVEY.md §5.1 and FIXTURES.md §3.1-3.2)."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqoop_spark.cdc import CdcEngine, IncrementalMode, JobStore
from sqoop_spark.cdc.engine import REPOS_SCHEMA
from sqoop_spark.cdc.watermark import incremental_slice
from sqoop_spark.errors import InvalidCheckColumnError
from sqoop_spark.lake import LakeTable

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_seq", T.LongType()),
        T.StructField("event_ts", T.TimestampType()),
        T.StructField("batch_id", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)

T0 = dt.datetime(2024, 1, 1)


def ev(seq, repo, path, content, op="upsert", ts=None, batch=0):
    return (seq, ts or (T0 + dt.timedelta(seconds=seq)), batch, op, repo, path, f"c{seq}", "py", content)


def events_df(spark, rows):
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def make_engine(spark, scratch, **kw):
    return CdcEngine.create_table(spark, os.path.join(scratch, "repos"), num_buckets=8, **kw)


def table_state(eng):
    return {
        (r.repo, r.path): (r.content, r.event_seq) for r in eng.table.read().collect()
    }


def test_empty_then_full_append(spark, scratch):
    """Mirrors testEmptyThenFullJobAppend (:713-811): run on empty source,
    then on 10 rows, then 10 more — exactly the union, no dupes."""
    eng = make_engine(spark, scratch)
    store = JobStore(os.path.join(scratch, "jobs"))
    store.create("j1", {"incremental.last.value": None})

    empty = events_df(spark, [])
    rep = eng.run_incremental(empty, job="j1", job_store=store)
    assert rep.rows_applied == 0 and rep.watermark is None

    first = events_df(spark, [ev(i, "r", f"p{i}", f"v{i}") for i in range(10)])
    rep1 = eng.run_incremental(first, job="j1", job_store=store)
    assert rep1.watermark == 9
    assert eng.table.total_rows() == 10

    both = events_df(
        spark,
        [ev(i, "r", f"p{i}", f"v{i}", batch=i // 10) for i in range(20)],
    )
    rep2 = eng.run_incremental(both, job="j1", job_store=store)
    assert rep2.watermark == 19
    # only the new slice was read; batch 0 events are excluded by watermark
    assert eng.table.total_rows() == 20
    assert store.show("j1")["incremental.last.value"] == 19


def test_append_rerun_is_noop(spark, scratch):
    eng = make_engine(spark, scratch)
    store = JobStore(os.path.join(scratch, "jobs"))
    store.create("j1", {"incremental.last.value": None})
    rows = events_df(spark, [ev(i, "r", f"p{i}", f"v{i}") for i in range(5)])
    eng.run_incremental(rows, job="j1", job_store=store)
    v = eng.table.current_version()
    rep = eng.run_incremental(rows, job="j1", job_store=store)
    assert rep.rows_applied == 0
    assert eng.table.current_version() == v  # no commit at all


def test_varchar_check_column_rejected(spark, scratch):
    """Mirrors testAppendWithString (:993)."""
    eng = make_engine(spark, scratch)
    rows = events_df(spark, [ev(0, "r", "p", "v")])
    with pytest.raises(InvalidCheckColumnError, match="Character column"):
        eng.run_incremental(rows, check_column="repo")


def test_lastmodified_update_modify(spark, scratch):
    """Mirrors testUpdateModifyWithTimestamp (:1052-1101): 10 base rows,
    modify row 0 at a later ts, re-run from last watermark — still 10 rows,
    row 0 carries the new content."""
    eng = make_engine(spark, scratch)
    base = events_df(spark, [ev(i, "r", f"p{i}", f"v{i}", ts=T0) for i in range(10)])
    rep1 = eng.run_incremental(
        base, mode=IncrementalMode.LASTMODIFIED, check_column="event_ts"
    )
    w1 = rep1.watermark
    assert eng.table.total_rows() == 10

    t1 = T0 + dt.timedelta(hours=1)
    upd = events_df(
        spark,
        [ev(i, "r", f"p{i}", f"v{i}", ts=T0) for i in range(10)]
        + [ev(100, "r", "p0", "v4000", ts=t1, batch=1)],
    )
    rep2 = eng.run_incremental(
        upd, mode=IncrementalMode.LASTMODIFIED, check_column="event_ts", last_value=w1
    )
    state = table_state(eng)
    assert len(state) == 10
    assert state[("r", "p0")] == ("v4000", 100)


def test_timestamp_boundary_rows_reread_idempotently(spark, scratch):
    """Mirrors testTimestampBoundary (:1234-1271): rows stamped exactly at the
    previous watermark are picked up (inclusive >=) and deduped by merge."""
    eng = make_engine(spark, scratch)
    base = events_df(spark, [ev(0, "r", "a", "x", ts=T0)])
    rep1 = eng.run_incremental(
        base, mode=IncrementalMode.LASTMODIFIED, check_column="event_ts"
    )
    # watermark = T0 + 1µs; a row stamped exactly at the watermark boundary
    boundary_ts = rep1.watermark
    more = events_df(
        spark,
        [ev(0, "r", "a", "x", ts=T0), ev(1, "r", "b", "y", ts=boundary_ts, batch=1)],
    )
    rep2 = eng.run_incremental(
        more,
        mode=IncrementalMode.LASTMODIFIED,
        check_column="event_ts",
        last_value=rep1.watermark,
    )
    state = table_state(eng)
    assert state == {("r", "a"): ("x", 0), ("r", "b"): ("y", 1)}


def test_no_new_rows_detected_skip(spark, scratch):
    """Equal bounds ⇒ import skipped (ImportTool.java:375-379)."""
    eng = make_engine(spark, scratch)
    rows = events_df(spark, [ev(0, "r", "a", "x", ts=T0)])
    rep1 = eng.run_incremental(
        rows, mode=IncrementalMode.LASTMODIFIED, check_column="event_ts"
    )
    rep2 = eng.run_incremental(
        rows,
        mode=IncrementalMode.LASTMODIFIED,
        check_column="event_ts",
        last_value=rep1.watermark,
    )
    assert rep2.batches == [] and rep2.watermark == rep1.watermark


def test_incremental_slice_empty_source_null_predicate(spark):
    """MAX NULL ⇒ check_col IS NULL predicate (ImportTool.java:409-412)."""
    df = spark.createDataFrame([], EVENT_SCHEMA)
    sl = incremental_slice(df, IncrementalMode.APPEND, "event_seq", None)
    assert sl.empty and sl.df.count() == 0


def test_free_form_query_source(spark, scratch):
    """Mirrors TestFreeFormQueryImport (:109-157): arbitrary SQL (join with a
    dim table + WHERE) as the change source; multi-partition result equals
    the single-partition run."""
    eng = make_engine(spark, scratch)
    rows = events_df(spark, [ev(i, "r", f"p{i}", f"v{i}") for i in range(20)])
    rows.createOrReplaceTempView("ff_events")
    spark.createDataFrame(
        [("py", "python-lang")], ["lang", "lang_name"]
    ).createOrReplaceTempView("ff_langs")
    q = """
      SELECT e.event_seq, e.event_ts, e.batch_id, e.op, e.repo, e.path,
             e.commit, l.lang_name AS lang, e.content
      FROM ff_events e JOIN ff_langs l ON e.lang = l.lang
      WHERE e.event_seq % 2 = 0
    """
    src = spark.sql(q)
    eng.run_incremental(src.repartition(4), check_column="event_seq")
    state = table_state(eng)
    assert len(state) == 10
    assert all(k[1] in {f"p{i}" for i in range(0, 20, 2)} for k in state)
    langs = {r.lang for r in eng.table.read().select("lang").distinct().collect()}
    assert langs == {"python-lang"}


def test_saved_job_lifecycle(spark, scratch):
    """Mirrors JobTool create/list/show/delete (JobTool.java:355-368)."""
    store = JobStore(os.path.join(scratch, "jobs"))
    store.create("a", {"mode": "append"})
    store.create("b", {"mode": "lastmodified"})
    assert store.list() == ["a", "b"]
    assert store.show("a") == {"mode": "append"}
    store.update("a", **{"incremental.last.value": 42})
    assert store.show("a")["incremental.last.value"] == 42
    store.delete("b")
    assert store.list() == ["a"]
    import sqoop_spark.errors as E

    with pytest.raises(E.EngineError, match="already exists"):
        store.create("a", {})
    with pytest.raises(E.EngineError, match="no such job"):
        store.read("zz")


def test_blind_append_first_arrival_dedup(spark, scratch):
    """merge_mode=None (blind append) doubles rows under at-least-once
    redelivery; dedup_id_cols keeps the first arrival per event id. The
    keyed merge path needs no such knob — newest-wins is idempotent."""
    rows = [ev(1, "r", "a", "x"), ev(2, "r", "b", "y")]
    redelivered = rows + rows

    eng = make_engine(spark, scratch, merge_mode=None, dedup_id_cols=["event_seq"])
    eng.run_incremental(events_df(spark, redelivered))
    assert eng.table.total_rows() == 2

    eng2 = CdcEngine.create_table(
        spark, os.path.join(scratch, "repos2"), num_buckets=8, merge_mode=None
    )
    eng2.run_incremental(events_df(spark, redelivered))
    assert eng2.table.total_rows() == 4
