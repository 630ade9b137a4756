"""Cross-process concurrent writers — the real multi-writer shape.

The in-process tests (test_lake.py race injections) pin the rebase
logic; this suite proves the substrate claim: the manifest commit
protocol's atomicity is an exclusive hard link, which serializes
ACROSS PROCESSES, so two independent Spark drivers appending to the
same table race, rebase, and lose nothing.
"""

import os
import subprocess
import sys
import textwrap

from pyspark.sql import types as T

from sqoop_spark.lake import LakeTable

WRITER = textwrap.dedent(
    """
    import sys

    from sqoop_spark.lake import LakeTable
    from sqoop_spark.session import build_session

    path, writer_id, n = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    spark = build_session(parallelism=2, shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    t = LakeTable.load(spark, path)
    schema = t.schema()
    for i in range(n):
        k = writer_id * 1000 + i
        df = spark.createDataFrame([(k, k, f"w{writer_id}b{i}")], schema)
        # generous retry budget: every lost race here is a REAL
        # cross-process collision on the version link
        t.append(df, retry_conflicts=50)
    spark.stop()
    print("writer", writer_id, "done")
    """
)


def test_two_process_concurrent_appends(spark, scratch):
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("v", T.StringType()),
        ]
    )
    path = os.path.join(scratch, "multi")
    LakeTable.create(
        spark, path, schema, ["k"], num_buckets=2,
        properties={"order_column": "seq"},
    )
    script = os.path.join(scratch, "writer.py")
    with open(script, "w") as f:
        f.write(WRITER)
    env = {**os.environ, "PYTHONPATH": os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))}
    n_batches = 4
    procs = [
        subprocess.Popen(
            [sys.executable, script, path, str(w), str(n_batches)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for w in (1, 2)
    ]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]

    t = LakeTable.load(spark, path)
    # every append from both writers is live — nothing lost to races —
    # and each landed as its own serialized snapshot
    got = {(r.k, r.v) for r in t.read().collect()}
    expect = {
        (w * 1000 + i, f"w{w}b{i}") for w in (1, 2) for i in range(n_batches)
    }
    assert got == expect
    assert t.current_version() == 1 + 2 * n_batches
    ops = [s.operation for s in t.snapshots()]
    assert ops == ["create"] + ["append"] * (2 * n_batches)


# ---------------------------------------------------------------------------
# randomized multi-process soak: ingest × compactor × clusterer × DML
# ---------------------------------------------------------------------------

INGEST = textwrap.dedent(
    """
    import random
    import sys

    from sqoop_spark.cdc.merge import merge_apply
    from sqoop_spark.lake import LakeTable
    from sqoop_spark.session import build_session

    path, w, n = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    random.seed(w * 7919)
    spark = build_session(parallelism=2, shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    t = LakeTable.load(spark, path)
    from pyspark.sql import types as T
    bs = T.StructType(t.schema().fields + [T.StructField("op", T.StringType())])
    for i in range(n):
        rows = (
            # own keys: every batch rewrites them; last batch must win
            [(w * 10000 + j, 200000 + i * 10 + w, f"w{w}b{i}", "upsert")
             for j in range(100)]
            # shared keys: BOTH writers contend; global max seq must win
            + [(3000 + j, 100000 + i * 10 + w, f"s-w{w}b{i}", "upsert")
               for j in range(50)]
        )
        merge_apply(
            t, spark.createDataFrame(rows, bs),
            batch_id=w * 1000 + i, order_col="seq", strategy="mor",
            commit_retry_disjoint=100,
        )
        import time as _t
        _t.sleep(random.random() * 0.3)
    spark.stop()
    print("ingest", w, "done")
    """
)

MAINTENANCE = textwrap.dedent(
    """
    import sys
    import time

    from sqoop_spark.lake import LakeTable
    from sqoop_spark.session import build_session

    path, stop_flag = sys.argv[1], sys.argv[2]
    import os
    spark = build_session(parallelism=2, shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    t = LakeTable.load(spark, path)
    n_compacts = 0
    while not os.path.exists(stop_flag):
        t.compact(retry_recompute=6)
        t.rewrite_small_files(target_rows=2000, retry_recompute=6)
        n_compacts += 1
        time.sleep(0.2)
    spark.stop()
    print("maintenance done after", n_compacts, "passes")
    """
)

DML = textwrap.dedent(
    """
    import sys
    import time

    from sqoop_spark.lake import LakeTable
    from sqoop_spark.session import build_session

    path = sys.argv[1]
    spark = build_session(parallelism=2, shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    t = LakeTable.load(spark, path)
    time.sleep(2)  # land mid-soak
    # deletes SEED-ONLY keys no ingest writer ever touches, so the final
    # state is interleaving-independent
    t.delete_where("k >= 400 and k < 500", retry_recompute=100)
    spark.stop()
    print("dml done")
    """
)


def test_multi_process_soak_converges_to_serial_state(spark, scratch):
    """Randomized soak (round-4 verdict item 4): two MoR ingest writers,
    a standing compactor+clusterer loop, and a predicate DELETE race on
    ONE table across five independent Spark drivers. The operation set is
    commutative by construction (newest-wins over distinct seqs; the DML
    touches keys no writer writes), so the final logical state must equal
    the serial expectation exactly — any lost update, stale-base carry,
    double-applied batch, or compactor/DML corruption shows up as a value
    diff. Exercises: delta-append rebase, compact recompute-on-race, DML
    file-granular rewrite under live ingest, bucket-disjoint rebase."""
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("v", T.StringType()),
        ]
    )
    path = os.path.join(scratch, "soak")
    t0 = LakeTable.create(
        spark, path, schema, ["k"], num_buckets=4,
        properties={"order_column": "seq"},
    )
    t0.append(
        spark.createDataFrame([(k, 0, "seed") for k in range(500)], schema)
    )
    env = {**os.environ, "PYTHONPATH": os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))}
    stop_flag = os.path.join(scratch, "stop")
    scripts = {
        "ingest1": (INGEST, [path, "1", "5"]),
        "ingest2": (INGEST, [path, "2", "5"]),
        "maint": (MAINTENANCE, [path, stop_flag]),
        "dml": (DML, [path]),
    }
    procs = {}
    for name, (src, argv) in scripts.items():
        sp = os.path.join(scratch, f"{name}.py")
        with open(sp, "w") as f:
            f.write(src)
        procs[name] = subprocess.Popen(
            [sys.executable, sp, *argv], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
    outs = {}
    for name in ("ingest1", "ingest2", "dml"):
        outs[name] = procs[name].communicate(timeout=900)[0].decode()
        assert procs[name].returncode == 0, f"{name}: {outs[name][-3000:]}"
    with open(stop_flag, "w"):
        pass
    outs["maint"] = procs["maint"].communicate(timeout=900)[0].decode()
    assert procs["maint"].returncode == 0, f"maint: {outs['maint'][-3000:]}"

    t = LakeTable.load(spark, path)
    t.compact()  # settle any tail deltas; state-preserving
    got = {(r.k, r.v) for r in t.read().collect()}
    expect = (
        {(k, "seed") for k in range(400)}  # 400..499 DML-deleted
        | {(w * 10000 + j, f"w{w}b4") for w in (1, 2) for j in range(100)}
        | {(3000 + j, "s-w2b4") for j in range(50)}  # global max seq wins
    )
    assert got == expect, (
        f"lost/extra rows: missing={sorted(expect - got)[:5]} "
        f"extra={sorted(got - expect)[:5]}"
    )
