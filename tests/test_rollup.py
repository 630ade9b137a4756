"""Incremental rollup maintenance (lake/rollup.py) + pre/post changelog.

Invariant under test everywhere: after each maintenance pass the rollup
table equals the batch GROUP BY over the source's current state — while
never re-reading the source in delta mode.
"""

import os

from pyspark.sql import types as T

from sqoop_spark.cdc.checkpoint import JobStore
from sqoop_spark.cdc.merge import merge_apply
from sqoop_spark.lake import LakeTable
from sqoop_spark.lake.rollup import (
    RollupAgg,
    create_rollup,
    full_rollup,
    maintain_rollup,
)

SRC = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("g", T.StringType()),
        T.StructField("x", T.LongType()),
        T.StructField("seq", T.LongType()),
    ]
)
BATCH = T.StructType(SRC.fields + [T.StructField("op", T.StringType())])
AGGS = [RollupAgg("n_rows", "count"), RollupAgg("sum_x", "sum", "x")]


def _source(spark, scratch):
    return LakeTable.create(
        spark,
        os.path.join(scratch, "src"),
        SRC,
        ["k"],
        num_buckets=2,
        properties={"order_column": "seq"},
    )


def _setup(spark, scratch):
    src = _source(spark, scratch)
    roll = create_rollup(
        spark, os.path.join(scratch, "roll"), src, ["g"], AGGS, num_buckets=2
    )
    store = JobStore(os.path.join(scratch, "jobs"))
    store.create("r", {})
    return src, roll, store


def _merge(spark, src, rows, batch_id):
    merge_apply(
        src, spark.createDataFrame(rows, BATCH), batch_id=batch_id, order_col="seq"
    )


def _assert_converged(roll, src, group_cols=("g",), aggs=AGGS):
    got = {
        tuple(r[c] for c in group_cols) + (r["n_rows"], r["sum_x"])
        for r in roll.read().collect()
    }
    want = {
        tuple(r[c] for c in group_cols) + (r["n_rows"], r["sum_x"])
        for r in full_rollup(src, list(group_cols), aggs).collect()
    }
    assert got == want


def test_pre_post_changelog_rows(spark, scratch):
    src = _source(spark, scratch)
    src.append(
        spark.createDataFrame([(1, "a", 10, 1), (2, "b", 20, 1)], SRC)
    )
    v = src.current_version()
    _merge(
        spark,
        src,
        [(1, "a", 11, 2, "upsert"), (2, None, None, 2, "delete"), (3, "c", 30, 2, "upsert")],
        batch_id=1,
    )
    rows = {
        (r.k, r.x, r._change)
        for r in src.changes_between(v, pre_post=True).collect()
    }
    assert rows == {
        (1, 10, "update_before"),
        (1, 11, "update_after"),
        (2, 20, "delete"),
        (3, 30, "insert"),
    }


def test_delta_rollup_tracks_recompute_over_batches(spark, scratch):
    src, roll, store = _setup(spark, scratch)
    src.append(
        spark.createDataFrame(
            [(k, "g%d" % (k % 3), k * 10, 1) for k in range(30)], SRC
        )
    )
    assert maintain_rollup(src, roll, ["g"], AGGS, store, "r") == 1  # bootstrap
    _assert_converged(roll, src)

    # Batch 2: updates (x changes), a group-column change, deletes, inserts.
    _merge(
        spark,
        src,
        [
            (0, "g0", 999, 2, "upsert"),  # x update within group
            (1, "g2", 10, 2, "upsert"),  # group move g1 -> g2
            (2, None, None, 2, "delete"),
            (100, "g9", 7, 2, "upsert"),  # new group
        ],
        batch_id=2,
    )
    # Batch 3 in the same pass: delta mode must apply per version.
    _merge(spark, src, [(100, "g9", 8, 3, "upsert")], batch_id=3)
    assert maintain_rollup(src, roll, ["g"], AGGS, store, "r") == 2
    _assert_converged(roll, src)


def test_delta_rollup_group_vanishes_and_redelivery_is_fenced(spark, scratch):
    src, roll, store = _setup(spark, scratch)
    src.append(spark.createDataFrame([(1, "solo", 5, 1), (2, "big", 6, 1)], SRC))
    maintain_rollup(src, roll, ["g"], AGGS, store, "r")
    _merge(spark, src, [(1, None, None, 2, "delete")], batch_id=2)
    assert maintain_rollup(src, roll, ["g"], AGGS, store, "r") == 1
    assert {r.g for r in roll.read().collect()} == {"big"}, (
        "a group whose count reaches 0 must be deleted"
    )
    # Crash between apply and watermark save: rewind the watermark and
    # re-run — the batch-id fence (source version) makes redelivery a noop.
    v = src.current_version()
    store.update("r", **{"rollup.source.version": v - 1})
    assert maintain_rollup(src, roll, ["g"], AGGS, store, "r") == 0
    _assert_converged(roll, src)


def test_recompute_mode_handles_minmax(spark, scratch):
    from pyspark.sql import functions as F

    src = _source(spark, scratch)
    aggs = [RollupAgg("n_rows", "count"), RollupAgg("sum_x", "sum", "x")]

    def recompute(df):
        return df.groupBy("g").agg(
            F.count(F.lit(1)).alias("n_rows"), F.max("x").alias("sum_x")
        )

    # rollup schema: reuse AGGS shape but values are (count, max)
    roll = create_rollup(
        spark, os.path.join(scratch, "roll"), src, ["g"], aggs, num_buckets=2
    )
    store = JobStore(os.path.join(scratch, "jobs"))
    store.create("r", {})
    src.append(
        spark.createDataFrame([(1, "a", 10, 1), (2, "a", 50, 1), (3, "b", 7, 1)], SRC)
    )
    maintain_rollup(src, roll, ["g"], aggs, store, "r", mode="recompute")
    # bootstrap uses full_rollup(aggs) → overwrite with the real recompute
    # by forcing one more pass after a change
    _merge(spark, src, [(2, None, None, 2, "delete")], batch_id=2)  # drop max of a
    _merge(spark, src, [(3, "c", 7, 3, "upsert")], batch_id=3)  # b -> c move
    assert (
        maintain_rollup(
            src, roll, ["g"], aggs, store, "r", mode="recompute", recompute_fn=recompute
        )
        == 1
    )
    got = {(r.g, r.n_rows, r.sum_x) for r in roll.read().collect()}
    # max under delete recomputed: group a max back to 10; b vanished; c new
    assert got == {("a", 1, 10), ("c", 1, 7)}


def test_rebootstrap_reconciles_stale_groups(spark, scratch):
    src, roll, store = _setup(spark, scratch)
    src.append(spark.createDataFrame([(1, "old", 1, 1), (2, "keep", 2, 1)], SRC))
    maintain_rollup(src, roll, ["g"], AGGS, store, "r")
    # Source changes while the consumer's saved version gets expired.
    _merge(spark, src, [(1, None, None, 2, "delete")], batch_id=2)
    _merge(spark, src, [(3, "new", 3, 3, "upsert")], batch_id=3)
    store.update("r", **{"rollup.source.version": 0})  # simulate expiry
    assert maintain_rollup(src, roll, ["g"], AGGS, store, "r") == 1
    assert {r.g for r in roll.read().collect()} == {"keep", "new"}, (
        "re-bootstrap must delete rollup groups the source no longer has"
    )
    _assert_converged(roll, src)
