"""rewrite_clustered: sort-order rewrite → zone-map pruning on merge tables.

On a hash-bucketed merge table every CoW rewrite spans the full order
range, so read_since's zone maps cannot skip files (documented in
read_since). The clustering rewrite sorts each bucket by the order column
and splits it into narrow-range files; an incremental consumer resuming
from a recent watermark then opens only the tail files.
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqoop_spark.errors import EngineError
from sqoop_spark.lake import LakeTable


def _seq_table(spark, scratch, name, buckets=2):
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


def _tail(p):
    return "/".join(p.replace("\\", "/").split("/")[-3:])


def test_cluster_narrow_ranges_and_incremental_prune(spark, scratch):
    """After clustering, each file's recorded [min, max] for the order
    column covers a narrow slice, ranges within a bucket are disjoint,
    state is unchanged, and read_since from a recent watermark opens a
    strict subset of the files (the tail)."""
    t, schema = _seq_table(spark, scratch, "cl1", buckets=2)
    t.append(spark.createDataFrame(
        [(k, k, f"v{k}") for k in range(200)], schema
    ))
    before_state = {(r.k, r.seq, r.v) for r in t.read().collect()}
    # one file per bucket spanning the full seq range: zone maps useless
    full = [e for e in t.manifest()["files"]]
    assert all(e["stats"]["seq"][1] - e["stats"]["seq"][0] > 150 for e in full)
    assert len(t.read_since("seq", 180).inputFiles()) == len(full), (
        "pre-clustering, every file spans the watermark: nothing prunes"
    )

    m = t.rewrite_clustered(target_rows=25)
    assert m["operation"] == "cluster"
    assert m["summary"]["cluster_column"] == "seq"
    assert m["summary"]["new_files"] > len(full)

    entries = t.manifest()["files"]
    by_bucket: dict[int, list] = {}
    for e in entries:
        assert e["rows"] <= 25
        by_bucket.setdefault(e["bucket"], []).append(e["stats"]["seq"])
    for ranges in by_bucket.values():
        ranges.sort()
        for (alo, ahi), (blo, bhi) in zip(ranges, ranges[1:]):
            assert ahi <= blo, "within-bucket ranges must be disjoint"

    assert {(r.k, r.seq, r.v) for r in t.read().collect()} == before_state

    since = t.read_since("seq", 180)
    assert {r.k for r in since.collect()} == set(range(181, 200))
    opened = {_tail(p) for p in since.inputFiles()}
    all_names = {_tail(e["path"]) for e in entries}
    assert opened < all_names, "tail read must skip low-range files"
    assert len(opened) <= 2 * 2, "≤ one tail file per bucket (+slack)"


def test_cluster_skips_delta_buckets_carries_tombstones(spark, scratch):
    """Buckets with unmerged non-tombstone deltas are carried by
    reference (their logical state is not their base files — compact
    first); tombstone files also carry; clustering changes no state."""
    t, schema = _seq_table(spark, scratch, "cl2", buckets=2)
    op_schema = T.StructType(schema.fields + [T.StructField("op", T.StringType())])
    t.append(spark.createDataFrame(
        [(k, k, f"v{k}") for k in range(40)], schema
    ))
    # bucket of k=0 gains an unmerged delta; delete k=1 then compact so a
    # tombstone file exists somewhere
    t.append_delta(spark.createDataFrame([(1, 100, None, "delete")], op_schema))
    t.compact()
    t.append_delta(spark.createDataFrame([(0, 200, "v0b", "upsert")], op_schema))
    before = t.manifest()
    delta_bucket = next(
        e["bucket"] for e in before["files"]
        if e.get("delta") and not e.get("tombstone")
    )
    before_state = {(r.k, r.seq, r.v) for r in t.read().collect()}

    m = t.rewrite_clustered(target_rows=10)
    after = t.manifest()
    assert m["summary"]["skipped_delta_buckets"] >= 1
    kept = {e["path"] for e in after["files"] if e["bucket"] == delta_bucket}
    orig = {e["path"] for e in before["files"] if e["bucket"] == delta_bucket}
    assert kept == orig, "delta bucket must carry by reference"
    assert any(e.get("tombstone") for e in after["files"]), "tombstones carried"
    assert {(r.k, r.seq, r.v) for r in t.read().collect()} == before_state


def test_cluster_noop_and_guards(spark, scratch):
    t, schema = _seq_table(spark, scratch, "cl3")
    with pytest.raises(EngineError, match="no column"):
        t.rewrite_clustered(column="nope")
    before = t.current_version()
    assert t.rewrite_clustered()["version"] == before, "empty table = noop"
    # a table whose ONLY files sit in delta buckets: also a noop
    op_schema = T.StructType(schema.fields + [T.StructField("op", T.StringType())])
    t.append_delta(spark.createDataFrame([(1, 1, "a", "upsert")], op_schema))
    before = t.current_version()
    assert t.rewrite_clustered()["version"] == before


def test_cluster_custom_column_gets_stats(spark, scratch):
    """Clustering by a non-stats column records that column's zone maps
    for the rewritten files (pruning needs the bounds)."""
    t, schema = _seq_table(spark, scratch, "cl4")
    t.append(spark.createDataFrame(
        [(k, k, f"v{k:03d}") for k in range(50)], schema
    ))
    t.rewrite_clustered(column="v", target_rows=10)
    entries = t.manifest()["files"]
    assert all("v" in (e.get("stats") or {}) for e in entries)


def test_cli_maintain_cluster(spark, scratch, capsys):
    import json

    from sqoop_spark.cli import main as cli_main

    t, schema = _seq_table(spark, scratch, "cl5")
    t.append(spark.createDataFrame(
        [(k, k, f"v{k}") for k in range(60)], schema
    ))
    rc = cli_main([
        "maintain", "--path", t.path, "--cluster-by",
        "--cluster-file-rows", "10",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["cluster"]["cluster_column"] == "seq"
    assert out["cluster"]["new_files"] >= 6


# ------------------------------------------------------------------ z-order


def _zorder_table(spark, scratch, name, n=800):
    """Two independent dimensions: seq = row index, v cycles through 20
    string labels — a z-order on (seq, v) must keep BOTH zone maps
    narrow per file."""
    t, schema = _seq_table(spark, scratch, name, buckets=2)
    t.append(spark.createDataFrame(
        [(k, k, f"w{k % 20:02d}") for k in range(n)], schema
    ))
    return t


def test_zorder_prunes_both_dimensions(spark, scratch):
    t = _zorder_table(spark, scratch, "zo1")
    before = {(r.k, r.seq, r.v) for r in t.read().collect()}
    m = t.rewrite_clustered(column=["seq", "v"], target_rows=25)
    assert m["summary"]["zorder"] is True
    assert m["summary"]["cluster_column"] == ["seq", "v"]
    assert {(r.k, r.seq, r.v) for r in t.read().collect()} == before
    total = len(t.manifest()["files"])

    hi = t.scan("seq >= 700")
    assert len(hi.inputFiles()) < total, "seq zone maps must prune"
    assert {r.seq for r in hi.collect()} == set(range(700, 800))

    one_v = t.scan("v = 'w05'")
    assert len(one_v.inputFiles()) < total, "v zone maps must prune too"
    assert {r.k for r in one_v.collect()} == {k for k in range(800) if k % 20 == 5}

    both = t.scan("seq < 100 and v = 'w03'")
    assert len(both.inputFiles()) < total
    assert {r.k for r in both.collect()} == {k for k in range(100) if k % 20 == 3}


def test_zorder_single_element_list_is_plain_clustering(spark, scratch):
    t = _zorder_table(spark, scratch, "zo2", n=100)
    m = t.rewrite_clustered(column=["seq"], target_rows=25)
    assert m["summary"]["zorder"] is False
    assert m["summary"]["cluster_column"] == "seq"


def test_zorder_argument_errors(spark, scratch):
    t = _zorder_table(spark, scratch, "zo3", n=40)
    with pytest.raises(EngineError, match="no column"):
        t.rewrite_clustered(column=["seq", "nope"])
    with pytest.raises(ValueError, match="2..3 columns"):
        t.rewrite_clustered(column=["k", "seq", "v", "k"])


def test_zvalue_ordering_properties(spark):
    """The Morton value is monotone along each axis when the other is
    fixed, and the string embedding preserves prefix order."""
    from pyspark.sql import types as T2

    from sqoop_spark.lake.zorder import value_sql, zvalue_column

    schema = T2.StructType(
        [T2.StructField("a", T2.LongType()), T2.StructField("b", T2.StringType())]
    )
    rows = [(x, w) for x in (0, 1000, 65000) for w in ("aa", "mm", "zz")]
    df = spark.createDataFrame(rows, schema)
    z = zvalue_column(df, ["a", "b"], schema)
    got = {(r.a, r.b): r.z for r in df.select("a", "b", z.alias("z")).collect()}
    for w in ("aa", "mm", "zz"):
        assert got[(0, w)] < got[(1000, w)] < got[(65000, w)]
    for x in (0, 1000, 65000):
        assert got[(x, "aa")] < got[(x, "mm")] < got[(x, "zz")]
    # string embedding is monotone in byte order
    sql = value_sql("b", T2.StringType())
    vals = [
        r.v
        for r in spark.createDataFrame([("abc",), ("abd",), ("b",)], ["b"])
        .selectExpr(f"{sql} AS v")
        .collect()
    ]
    assert vals[0] < vals[1] < vals[2]
