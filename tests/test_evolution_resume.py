"""Schema evolution mid-replay + exactly-once resume (FIXTURES.md §3.5-3.6)."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqoop_spark.cdc import CdcEngine
from sqoop_spark.datagen import replay_oracle, synthesize_change_events
from sqoop_spark.errors import IncompatibleSchemaError
from sqoop_spark.lake import LakeTable


def test_schema_evolution_mid_replay(spark, scratch):
    """Add column mid-replay (nulls backfilled), rename, then drop; replay
    completes and final state matches. Mirrors FIXTURES §3.5 /
    TestParquetIncrementalImportMerge schema rules."""
    eng = CdcEngine.create_table(spark, os.path.join(scratch, "t"), num_buckets=8)
    ev = synthesize_change_events(spark, 3000, batch_size=1000, n_repos=10, n_paths=50)

    eng.replay(ev.filter(F.col("batch_id") == 0))
    rows_v1 = eng.table.total_rows()

    # DDL commit between batches: add license column (fenced as batch 100)
    eng.table.add_column("license", "string", batch_id=100)
    assert eng.table.read().filter(F.col("license").isNull()).count() == rows_v1

    # batch 1 events carry a license value
    b1 = ev.filter(F.col("batch_id") == 1).withColumn("license", F.lit("MIT"))
    eng.replay(b1)
    licensed = eng.table.read().filter(F.col("license") == "MIT").count()
    assert licensed > 0

    # rename + drop mid-replay; old files stay readable via column ids
    eng.table.rename_column("license", "lic")
    eng.replay(ev.filter(F.col("batch_id") == 2).withColumn("lic", F.lit("ASL")))
    eng.table.drop_column("lic")
    assert "lic" not in eng.table.read().columns

    # final key-state matches the pandas oracle (payload columns unaffected)
    oracle = replay_oracle(ev.toPandas())
    got = (
        eng.table.read()
        .select("repo", "path", "content_sha")
        .toPandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    assert got.equals(oracle[["repo", "path", "content_sha"]])

    # incompatible change still rejected mid-replay with the exact message
    with pytest.raises(
        IncompatibleSchemaError,
        match="Cannot merge files, the Avro schemas are not compatible.",
    ):
        eng.table.change_column_type("commit", "int")


def test_exactly_once_kill_and_resume(spark, scratch):
    """Kill after batch b commits; resume ⇒ b not re-applied; final state
    identical to uninterrupted run; lineage counters sum to event counts."""
    ev = synthesize_change_events(spark, 5000, batch_size=1000, n_repos=10, n_paths=80)

    ref = CdcEngine.create_table(spark, os.path.join(scratch, "ref"), num_buckets=8)
    ref.replay(ev)
    expect = {
        (r.repo, r.path): r.content_sha for r in ref.table.read().collect()
    }

    eng = CdcEngine.create_table(spark, os.path.join(scratch, "t"), num_buckets=8)
    eng.replay(ev.filter(F.col("batch_id") <= 2))  # "crash" after batch 2

    resumed = CdcEngine(spark, LakeTable.load(spark, os.path.join(scratch, "t")))
    rep = resumed.replay(ev)
    assert rep.skipped_batch_ids == [0, 1, 2]
    assert [b.batch_id for b in rep.batches] == [3, 4]

    got = {(r.repo, r.path): r.content_sha for r in resumed.table.read().collect()}
    assert got == expect

    # per-batch lineage counters: events_in sums to the full event count
    total_in = sum(
        (m["lineage"] or {}).get("counters", {}).get("rows_in") or 0
        for m in (resumed.table.manifest(v) for v in range(2, resumed.table.current_version() + 1))
        if m["operation"] == "merge"
    )
    assert total_in == 5000

    # per-bucket lineage rows match actual file rows of the last snapshot
    last = resumed.table.manifest()
    lineage_rows = {e["bucket"]: e["rows_out"] for e in last["lineage"]["buckets"]}
    for b, rows in lineage_rows.items():
        actual = sum(e["rows"] for e in last["files"] if e["bucket"] == b)
        assert actual == rows


def test_resume_mid_batch_crash_simulation(spark, scratch):
    """A crash *during* a batch leaves no partial commit (atomic manifest):
    simulate by attempting a commit that fails post-data-write."""
    eng = CdcEngine.create_table(spark, os.path.join(scratch, "t"), num_buckets=4)
    ev = synthesize_change_events(spark, 1000, batch_size=500, n_repos=5, n_paths=20)
    eng.replay(ev.filter(F.col("batch_id") == 0))
    v = eng.table.current_version()

    # simulate a concurrent/crashed writer: pre-create the next version file
    import json

    doc = eng.table.manifest()
    nxt = os.path.join(eng.table.manifest_dir, f"v{v + 1:08d}.json")
    with open(nxt, "w") as f:
        json.dump(doc, f)

    from sqoop_spark.errors import ConcurrentCommitError

    with pytest.raises(ConcurrentCommitError):
        eng.apply_batch(ev.filter(F.col("batch_id") == 1).drop("batch_id"), batch_id=1)

    os.unlink(nxt)
    eng.table._manifest_cache.clear()
    # retry succeeds and state is correct
    eng2 = CdcEngine(spark, LakeTable.load(spark, eng.table.path))
    eng2.replay(ev)
    oracle = replay_oracle(ev.toPandas())
    got = (
        eng2.table.read()
        .select("repo", "path", "content_sha")
        .toPandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    assert got.equals(oracle[["repo", "path", "content_sha"]])
