"""Whole-lifecycle endurance: every commit type interleaved, model-tracked.

A deterministic 30-step program drives one table through MoR ingest,
compaction, bin-packing, clustering, rebucketing, row-level DML, generic
MERGE, rollback, tagging, snapshot expiry and orphan GC — asserting after
EVERY step that the logical state equals a pure-Python model, that a
changelog replica converges at checkpoints, and that a tagged snapshot
stays readable through expiry. This is the integration surface no
single-op test exercises: operations composing over one commit history.
"""

import os
import random

from pyspark.sql import types as T

from sqoop_spark.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)
OP_SCHEMA = T.StructType(SCHEMA.fields + [T.StructField("op", T.StringType())])
KEYS = [f"key{i:02d}" for i in range(40)]
ALPHA = "abcdef"


def _state(t):
    return {r.k: (r.seq, r.v) for r in t.read().collect()}


def test_lifecycle_program(spark, scratch):
    rng = random.Random(7)
    t = LakeTable.create(
        spark, os.path.join(scratch, "life"), SCHEMA, ["k"],
        num_buckets=4, properties={"order_column": "seq"},
    )
    model: dict[str, tuple[int, str]] = {}
    snapshots: dict[int, dict] = {t.current_version(): dict(model)}
    seq = 0

    from sqoop_spark.cdc import CdcEngine, JobStore
    from sqoop_spark.streaming import replicate_to_table

    replica_t = LakeTable.create(
        spark, os.path.join(scratch, "life_rep"), SCHEMA, ["k"],
        num_buckets=4, properties={"order_column": "seq"},
    )
    replica = CdcEngine(spark, replica_t, fingerprint=False)
    store = JobStore(os.path.join(scratch, "jobs"))
    store.create("rep", {"changelog.replica.version": None})

    def word():
        return "".join(rng.choice(ALPHA) for _ in range(rng.randint(0, 5)))

    def snap():
        snapshots[t.current_version()] = dict(model)

    tag_state = None
    for step in range(30):
        op = rng.choices(
            ["ingest", "dml_del", "dml_upd", "merge", "compact",
             "rewrite", "rebucket", "rollback", "expire"],
            weights=[40, 10, 10, 10, 8, 6, 6, 5, 5],
        )[0]
        if op == "ingest":
            rows = []
            for _ in range(rng.randint(3, 8)):
                k = rng.choice(KEYS)
                seq += 1
                if rng.random() < 0.2:
                    rows.append((k, seq, None, "delete"))
                    model.pop(k, None)
                else:
                    v = word()
                    rows.append((k, seq, v, "upsert"))
                    model[k] = (seq, v)
            # within-batch duplicates: the model applied them in order;
            # MoR resolution picks max seq — identical outcome
            t.append_delta(spark.createDataFrame(rows, OP_SCHEMA))
            snap()
        elif op == "dml_del":
            c = rng.choice(ALPHA)
            t.delete_where(f"v LIKE '%{c}%'")
            model = {k: x for k, x in model.items() if c not in x[1]}
            snap()
        elif op == "dml_upd":
            c = rng.choice(ALPHA)
            t.update_where(f"v LIKE '%{c}%'", {"v": "v || '!'"})
            model = {
                k: ((s, v + "!") if c in v else (s, v))
                for k, (s, v) in model.items()
            }
            snap()
        elif op == "merge":
            chosen = rng.sample(KEYS, rng.randint(2, 4))
            rows = []
            for k in chosen:
                seq += 1
                rows.append((k, seq, word()))
            t.merge_into(
                spark.createDataFrame(rows, SCHEMA),
                when_matched_update="source",
            )
            for k, s, v in rows:
                model[k] = (s, v)
            snap()
        elif op == "compact":
            t.compact()
            snap()
        elif op == "rewrite":
            if rng.random() < 0.5:
                t.rewrite_clustered(target_rows=10)
            else:
                t.rewrite_small_files(target_rows=10_000)
            snap()
        elif op == "rebucket":
            t.rebucket(rng.choice([2, 4, 8]))
            snap()
        elif op == "rollback":
            live = [
                v for v in snapshots
                if t.manifest_exists(v) and v <= t.current_version()
            ]
            target = rng.choice(live[-3:])
            t.rollback_to(target)
            model = dict(snapshots[target])
            snap()
        elif op == "expire":
            t.expire_snapshots(keep_last=8)
            t.remove_orphan_files(older_than_seconds=0)

        assert _state(t) == model, f"state diverged at step {step} ({op})"

        if step == 12:
            t.set_tag("mid-program")
            tag_state = dict(model)
        if step % 5 == 4:
            replicate_to_table(t, replica, store, "rep")
            assert _state(replica_t) == model, f"replica diverged at step {step}"

    replicate_to_table(t, replica, store, "rep")
    assert _state(replica_t) == model, "replica must converge at the end"

    # the tagged snapshot survived every expire pass and reads exactly
    # the state at tag time
    v_tag = t.resolve_ref("mid-program")
    assert t.manifest_exists(v_tag)
    got = {r.k: (r.seq, r.v) for r in t.read(version=v_tag).collect()}
    assert got == tag_state, "tagged snapshot must read its original state"
