"""Cross-feature seams: MoR × schema evolution, concurrent commits,
free-form query validation parity, salting skew balance."""

import os

import pytest
from pyspark.sql import functions as F

from sqoop_spark.cdc import CdcEngine
from sqoop_spark.datagen import synthesize_change_events
from sqoop_spark.errors import ConcurrentCommitError, EngineError
from sqoop_spark.lake import LakeTable
from sqoop_spark.partitioning import repartition_salted
from sqoop_spark.sources import freeform_query


def test_mor_deltas_survive_schema_evolution(spark, scratch):
    """Delta files written under the old schema must read correctly after
    add/rename DDL (column-id mapping + the _op side channel)."""
    events = synthesize_change_events(spark, 4000, batch_size=2000)
    eng = CdcEngine.create_table(
        spark, os.path.join(scratch, "t"), num_buckets=4, merge_strategy="mor"
    )
    b0 = events.filter(F.col("batch_id") == 0).drop("batch_id")
    eng.apply_batch(b0, 0)
    assert eng.table.delta_file_counts()

    eng.table.add_column("license", "string")
    eng.table.rename_column("lang", "language")

    out = eng.table.read()
    assert "license" in out.columns and "language" in out.columns
    assert out.filter(F.col("license").isNotNull()).count() == 0
    assert out.filter(F.col("language").isNull()).count() == 0

    # continue the replay under the new schema, then compact across the mix
    b1 = (
        events.filter(F.col("batch_id") == 1)
        .drop("batch_id")
        .withColumnRenamed("lang", "language")
        .withColumn("license", F.lit("mit"))
    )
    eng.apply_batch(b1, 1)
    before = eng.table.read().count()
    eng.compact()
    assert eng.table.read().count() == before
    got = eng.table.read()
    assert got.filter(F.col("license") == "mit").count() > 0


def test_concurrent_commit_single_winner(spark, scratch):
    """Two writers racing the same snapshot version: exactly one wins
    (optimistic concurrency via O_EXCL manifest link)."""
    t = LakeTable.create(
        spark,
        os.path.join(scratch, "t"),
        synthesize_change_events(spark, 1).schema,
        ["repo", "path"],
        num_buckets=2,
    )
    df = synthesize_change_events(spark, 50)
    # Stage data under two table handles that both believe current is v1,
    # then commit both — the second manifest link must lose.
    a = LakeTable.load(spark, t.path)
    b = LakeTable.load(spark, t.path)
    ea = a._write_data_files(a._prepare_df(df))
    eb = b._write_data_files(b._prepare_df(df))
    a._commit("append", a.manifest()["files"] + ea, None, None, None)
    with pytest.raises(ConcurrentCommitError):
        # b still believes current is v1 → tries to write v2 again
        b._manifest_cache.clear()
        manifest = {
            **b.manifest(1),
            "version": 2,
            "parent": 1,
            "operation": "append",
            "files": b.manifest(1)["files"] + eb,
        }
        b._write_manifest(manifest)


def test_freeform_requires_conditions_token(spark):
    with pytest.raises(EngineError, match=r"\$CONDITIONS"):
        freeform_query(spark, "SELECT 1")


def test_freeform_requires_split_by_for_parallel(spark):
    with pytest.raises(EngineError, match="split-by"):
        freeform_query(spark, "SELECT 1 WHERE $CONDITIONS", num_mappers=4)


def test_freeform_split_union_equals_whole(spark, scratch):
    ev = synthesize_change_events(spark, 2000, batch_size=500)
    ev.createOrReplaceTempView("ff_events")
    q = "SELECT event_seq, repo, path FROM ff_events WHERE op = 'upsert' AND $CONDITIONS"
    whole = freeform_query(spark, q).toPandas().sort_values("event_seq")
    split = (
        freeform_query(spark, q, split_by="event_seq", num_mappers=4)
        .toPandas()
        .sort_values("event_seq")
    )
    assert whole.reset_index(drop=True).equals(split.reset_index(drop=True))
    assert (
        freeform_query(spark, q, split_by="event_seq", num_mappers=4)
        .rdd.getNumPartitions()
        >= 4
    )


def test_salted_repartition_balances_hot_key(spark):
    """One key holding 90% of rows: salted shuffle caps the biggest
    partition near 1/n_salts of the hot key's rows."""
    n = 20000
    df = spark.range(n).select(
        F.when(F.col("id") % 10 != 0, F.lit("hot")).otherwise(F.lit("cold")).alias("repo"),
        F.lit("p").alias("path"),
        F.col("id").alias("event_seq"),
    )
    plain = df.repartition(8, "repo", "path")
    plain_sizes = plain.groupBy(F.spark_partition_id().alias("p")).count().toPandas()
    salted = repartition_salted(df, ["repo", "path"], "event_seq", 8, n_salts=8)
    salted_sizes = salted.groupBy(F.spark_partition_id().alias("p")).count().toPandas()
    assert plain_sizes["count"].max() >= 0.9 * n  # the hot key swamped one partition
    assert salted_sizes["count"].max() < 0.4 * n  # salt spread it out
    # and the salt never changed the data
    assert salted.count() == n


def test_expire_snapshots(spark, scratch):
    events = synthesize_change_events(spark, 3000, batch_size=1000)
    eng = CdcEngine.create_table(spark, os.path.join(scratch, "t"), num_buckets=4)
    eng.replay(events)
    before = eng.table.read().count()
    versions_before = eng.table.current_version()
    info = eng.table.expire_snapshots(keep_last=1)
    assert info["expired_versions"] == versions_before - 1
    assert info["removed_files"] > 0
    assert eng.table.read().count() == before  # current state untouched
    assert len(eng.table.snapshots()) == 1
    # expired versions are no longer readable
    with pytest.raises(Exception):
        eng.table.read(version=1).count()


def test_cli_create_hive_table_and_options_file(spark, scratch, capsys):
    import json as _json

    from sqoop_spark.cli import main as cli_main

    src = os.path.join(scratch, "t.parquet")
    spark.range(3).select(
        F.col("id"), F.lit("x").alias("name"), F.current_timestamp().alias("ts")
    ).write.parquet(src)
    rc = cli_main(
        ["create-hive-table", "--table", src, "--hive-table", "t1", "--if-not-exists"]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "CREATE TABLE IF NOT EXISTS `t1`" in out
    assert "`id` BIGINT" in out and "`name` STRING" in out and "`ts` STRING" in out

    # --options-file expansion (Sqoop options-file parity)
    opts = os.path.join(scratch, "opts.txt")
    with open(opts, "w") as f:
        f.write("# comment\ncodegen\n--table\n" + src + "\n")
    rc = cli_main(["--options-file", opts])
    got = _json.loads(capsys.readouterr().out)
    assert rc == 0 and [c["name"] for c in got["columns"]] == ["id", "name", "ts"]


def test_fence_namespaced_by_slice_window(spark, scratch):
    """A batch id that reappears in a LATER lastmodified window must not be
    skipped by the fence of the earlier window (batch ids follow event_seq;
    windows follow event_ts). Regression for slice-namespaced fencing."""
    from sqoop_spark.cdc import IncrementalMode

    ev = synthesize_change_events(spark, 2000, batch_size=500)
    # scramble ts so every batch id spans the whole time range
    ev = ev.withColumn(
        "event_ts",
        F.timestamp_micros(
            F.lit(1704067200000000)
            + F.pmod(F.xxhash64("event_seq"), F.lit(10_000)) * 1_000_000
        ),
    )
    eng = CdcEngine.create_table(spark, os.path.join(scratch, "t"), num_buckets=4)
    mid = ev.selectExpr("percentile(unix_micros(event_ts), 0.5)").collect()[0][0]
    import datetime as dt

    mid_ts = dt.datetime.utcfromtimestamp(mid / 1e6)
    r1 = eng.run_incremental(
        ev.filter(F.col("event_ts") < F.lit(mid_ts)),
        mode=IncrementalMode.LASTMODIFIED,
        check_column="event_ts",
    )
    assert r1.events_seen > 0
    r2 = eng.run_incremental(
        ev,
        mode=IncrementalMode.LASTMODIFIED,
        check_column="event_ts",
        last_value=r1.watermark,
    )
    assert r2.events_seen > 0 and not r2.skipped_batch_ids
    # final state equals a clean full replay of the same events
    clean = CdcEngine.create_table(spark, os.path.join(scratch, "c"), num_buckets=4)
    clean.replay(ev)
    a = eng.table.read().select("repo", "path", "content_sha").toPandas()
    b = clean.table.read().select("repo", "path", "content_sha").toPandas()
    key = ["repo", "path"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )


def test_freeform_boundary_query(spark):
    """--boundary-query overrides the MIN/MAX probe (TestBoundaryQuery
    shape): bounds narrower than the data still split correctly and the
    result set equals the unsplit query (bounds only steer placement)."""
    ev = synthesize_change_events(spark, 1000, batch_size=1000)
    ev.createOrReplaceTempView("bq_events")
    q = "SELECT event_seq, repo FROM bq_events WHERE $CONDITIONS"
    out = freeform_query(
        spark,
        q,
        split_by="event_seq",
        num_mappers=4,
        boundary_query="SELECT 100, 900",
    )
    assert out.count() == 1000
    whole = freeform_query(spark, q).toPandas().sort_values("event_seq")
    got = out.toPandas().sort_values("event_seq")
    assert whole.reset_index(drop=True).equals(got.reset_index(drop=True))


def test_append_saved_job_timestamp_check_column(spark, scratch):
    """APPEND watermark on a timestamp column round-trips the job store
    (stringified by JSON) without type errors (review regression)."""
    from sqoop_spark.cdc import IncrementalMode, JobStore

    ev = synthesize_change_events(spark, 1000, batch_size=500)
    eng = CdcEngine.create_table(spark, os.path.join(scratch, "t"), num_buckets=4)
    store = JobStore(os.path.join(scratch, "jobs"))
    store.create("j", {"incremental.last.value": None})
    r1 = eng.run_incremental(
        ev, mode=IncrementalMode.APPEND, check_column="event_ts",
        job="j", job_store=store,
    )
    assert r1.events_seen == 1000
    # watermark persisted as an ISO string; second exec must parse it back
    assert isinstance(store.show("j")["incremental.last.value"], str)
    r2 = eng.run_incremental(
        ev, mode=IncrementalMode.APPEND, check_column="event_ts",
        job="j", job_store=store,
    )
    assert r2.events_seen == 0


def test_mor_rejects_update_modes(spark, scratch):
    from sqoop_spark.cdc.merge import MergeMode

    eng = CdcEngine.create_table(
        spark, os.path.join(scratch, "t"), num_buckets=4,
        merge_mode=MergeMode.UPDATE_ONLY, merge_strategy="mor",
    )
    with pytest.raises(EngineError, match="supports only UPSERT"):
        eng.apply_batch(synthesize_change_events(spark, 10), 0)


def test_null_batch_id_rejected(spark, scratch):
    ev = synthesize_change_events(spark, 100, batch_size=50).withColumn(
        "batch_id",
        F.when(F.col("event_seq") % 7 == 0, F.lit(None)).otherwise(F.col("batch_id")),
    )
    eng = CdcEngine.create_table(spark, os.path.join(scratch, "t"), num_buckets=4)
    with pytest.raises(EngineError, match="NULL values in batch column"):
        eng.replay(ev)


def test_equal_seq_delete_cow_mor_agree(spark, scratch):
    """A delete with event_seq equal to the stored row's: both strategies
    must keep the stored upsert (review regression — they disagreed)."""
    base = synthesize_change_events(spark, 50, batch_size=50)
    dup_delete = (
        base.filter(F.col("op") == "upsert")
        .limit(5)
        .withColumn("op", F.lit("delete"))
        .withColumn("batch_id", F.lit(1).cast("bigint"))
    )
    finals = {}
    for strat in ("cow", "mor"):
        eng = CdcEngine.create_table(
            spark, os.path.join(scratch, strat), num_buckets=4, merge_strategy=strat
        )
        eng.apply_batch(base.drop("batch_id"), 0)
        eng.apply_batch(dup_delete.drop("batch_id"), 1)
        finals[strat] = (
            eng.table.read()
            .select("repo", "path", "event_seq")
            .toPandas()
            .sort_values(["repo", "path"])
            .reset_index(drop=True)
        )
    assert finals["cow"].equals(finals["mor"])
    # and the equal-seq delete did NOT remove any rows: final state equals
    # a replay of base alone
    ref = CdcEngine.create_table(spark, os.path.join(scratch, "ref"), num_buckets=4)
    ref.apply_batch(base.drop("batch_id"), 0)
    assert len(finals["cow"]) == ref.table.read().count()


def test_unreduced_null_key_rejected(spark, scratch):
    from sqoop_spark.cdc.merge import merge_apply
    from sqoop_spark.lake import LakeTable

    ev = synthesize_change_events(spark, 20)
    t = LakeTable.create(
        spark, os.path.join(scratch, "t"), ev.drop("batch_id").schema, ["repo", "path"],
        num_buckets=2,
    )
    bad = ev.drop("batch_id").withColumn(
        "repo", F.when(F.col("event_seq") == 3, F.lit(None)).otherwise(F.col("repo"))
    )
    with pytest.raises(Exception, match="null merge key"):
        merge_apply(t, bad, batch_id=0, reduce_batch=False)


def test_freeform_timestamp_split_by(spark):
    ev = synthesize_change_events(spark, 500, batch_size=500)
    ev.createOrReplaceTempView("ts_events")
    q = "SELECT event_seq, event_ts FROM ts_events WHERE $CONDITIONS"
    out = freeform_query(spark, q, split_by="event_ts", num_mappers=4)
    assert out.count() == 500
