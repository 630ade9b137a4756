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
