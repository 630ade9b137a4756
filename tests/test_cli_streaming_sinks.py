"""CLI tool surface, Structured-Streaming foreachBatch front end, and
delimited text sinks (round-trip = RecordParser parity)."""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqoop_spark.cdc import CdcEngine
from sqoop_spark.cli import main as cli_main
from sqoop_spark.datagen import synthesize_change_events, replay_oracle
from sqoop_spark.errors import EngineError
from sqoop_spark.sinks import read_delimited, resolve_codec, write_delimited
from sqoop_spark.streaming import stream_apply


# -- sinks -------------------------------------------------------------------


def test_delimited_roundtrip_defaults(spark, scratch):
    schema = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),
            T.StructField("c", T.DoubleType()),
        ]
    )
    df = spark.createDataFrame(
        [(1, "plain", 1.5), (2, None, 2.5), (3, "semi;colon", None)], schema
    )
    out = os.path.join(scratch, "txt")
    write_delimited(df, out)
    back = read_delimited(spark, out, schema).orderBy("a").collect()
    rows = [tuple(r) for r in back]
    assert rows == [(1, "plain", 1.5), (2, None, 2.5), (3, "semi;colon", None)]
    # NULL is encoded as the literal default null-string "null"
    raw = []
    for fn in os.listdir(out):
        if fn.startswith("part-"):
            raw.extend(open(os.path.join(out, fn)).read().splitlines())
    assert any(",null," in line or line.endswith("null") for line in raw)


def test_delimited_roundtrip_enclosed_escaped(spark, scratch):
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
    )
    tricky = 'has,comma and "quote" and \\ backslash'
    df = spark.createDataFrame([(1, tricky), (2, "plain")], schema)
    out = os.path.join(scratch, "enc")
    write_delimited(df, out, enclosed_by='"', escaped_by="\\")
    back = read_delimited(
        spark, out, schema, enclosed_by='"', escaped_by="\\"
    ).orderBy("k")
    assert [r.v for r in back.collect()] == [tricky, "plain"]


def test_codec_map():
    assert resolve_codec("gzip") == "gzip"
    assert resolve_codec("none") is None
    with pytest.raises(EngineError, match="Could not find codec"):
        resolve_codec("lzop-nonsense")


# -- streaming ---------------------------------------------------------------


def test_stream_apply_matches_batch_replay(spark, scratch):
    events = synthesize_change_events(spark, 3000, batch_size=1000)
    src = os.path.join(scratch, "src")
    events.write.parquet(src)

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).option("maxFilesPerTrigger", "2").parquet(src)
    # file-stream epochs arrive in arbitrary event order → MoR strategy
    # (global newest-wins resolution; see stream_apply docstring)
    engine = CdcEngine.create_table(
        spark, os.path.join(scratch, "tbl"), num_buckets=8, merge_strategy="mor"
    )
    q = stream_apply(engine, stream, os.path.join(scratch, "ckpt"))
    assert q.awaitTermination(300), "stream did not drain in time"

    got = (
        engine.table.read()
        .orderBy("repo", "path")
        .select("repo", "path", "content_sha")
        .toPandas()
    )
    oracle = replay_oracle(events.toPandas())
    assert got.reset_index(drop=True).equals(
        oracle[["repo", "path", "content_sha"]].reset_index(drop=True)
    )
    # epoch fences recorded → restarting the stream re-applies nothing
    fenced_before = engine.table.fenced_batch_ids()
    stream2 = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    q2 = stream_apply(engine, stream2, os.path.join(scratch, "ckpt"))
    assert q2.awaitTermination(300), "restarted stream did not drain in time"
    assert engine.table.fenced_batch_ids() == fenced_before


def test_stream_apply_rejects_batch_df(spark, scratch):
    df = spark.range(3)
    engine = CdcEngine.create_table(spark, os.path.join(scratch, "t2"), num_buckets=4)
    with pytest.raises(ValueError, match="streaming"):
        stream_apply(engine, df, os.path.join(scratch, "c2"))


# -- CLI ---------------------------------------------------------------------


def test_cli_import_merge_job_eval(spark, scratch, capsys):
    events = synthesize_change_events(spark, 2000, batch_size=500)
    src = os.path.join(scratch, "events")
    events.write.parquet(src)
    target = os.path.join(scratch, "lake")
    store = os.path.join(scratch, "jobs")

    rc = cli_main(
        [
            "import",
            "--table", src,
            "--target", target,
            "--merge-key", "repo,path",
            "--check-column", "event_seq",
            "--job", "j1",
            "--job-store", store,
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["events_seen"] == 2000 and out["batches"] == 4

    # second exec: nothing new (watermark + fence) — mirrors
    # testFullThenIncrementalAppend "run twice, only new rows"
    rc = cli_main(
        [
            "import",
            "--table", src,
            "--target", target,
            "--merge-key", "repo,path",
            "--job", "j1",
            "--job-store", store,
        ]
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["events_seen"] == 0

    rc = cli_main(["job", "--job-store", store, "--list"])
    assert capsys.readouterr().out.strip() == "j1"

    # merge tool
    old_p = os.path.join(scratch, "old")
    new_p = os.path.join(scratch, "new")
    events.filter(F.col("event_seq") < 1000).write.parquet(old_p)
    events.filter(F.col("event_seq") >= 1000).write.parquet(new_p)
    merged_p = os.path.join(scratch, "merged")
    rc = cli_main(
        [
            "merge",
            "--onto", old_p,
            "--new-data", new_p,
            "--target-dir", merged_p,
            "--merge-key", "repo,path",
        ]
    )
    assert rc == 0
    json.loads(capsys.readouterr().out.strip())

    # eval
    rc = cli_main(
        ["eval", "--register", f"ev={src}", "-e", "SELECT count(*) AS n FROM ev"]
    )
    assert json.loads(capsys.readouterr().out.strip())["n"] == 2000


def test_cli_metastore(scratch, capsys):
    """MetastoreTool parity: init/inspect the shared job store; --shutdown
    accepted as a no-op (the reference runs an HSQLDB server,
    MetastoreTool.java:50-62 — ours is a shared-filesystem JSON store)."""
    store = os.path.join(scratch, "meta_jobs")
    assert cli_main(["metastore", "--job-store", store]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["location"] == os.path.abspath(store) and out["jobs"] == []
    assert os.path.isdir(store)  # the tool initializes the store directory

    assert cli_main(["job", "--job-store", store, "--create", "m1"]) == 0
    assert cli_main(["metastore", "--job-store", store]) == 0
    assert json.loads(capsys.readouterr().out.strip())["jobs"] == ["m1"]

    assert cli_main(["metastore", "--job-store", store, "--shutdown"]) == 0
    assert "noop" in json.loads(capsys.readouterr().out.strip())["shutdown"]


def test_cli_list_and_import_all_tables(spark, scratch, capsys, tmp_path):
    for name in ("t1", "t2", "skipme"):
        spark.range(5).write.parquet(os.path.join(scratch, f"{name}.parquet"))
    rc = cli_main(["list-tables", "--path", scratch])
    assert rc == 0
    assert capsys.readouterr().out.split() == ["skipme", "t1", "t2"]
    wh = os.path.join(scratch, "wh")
    rc = cli_main(
        [
            "import-all-tables",
            "--path", scratch,
            "--warehouse-dir", wh,
            "--exclude-tables", "skipme",
        ]
    )
    got = json.loads(capsys.readouterr().out.strip())
    assert got == {"t1": 5, "t2": 5}


def _file_processor_factory(outdir):
    import os as _os
    import uuid as _uuid

    def process(rows):
        with open(_os.path.join(outdir, f"{_uuid.uuid4().hex}.txt"), "w") as f:
            for r in rows:
                f.write(f"{r['id']}\n")

    return process


def test_export_foreach_batching(spark, scratch):
    from sqoop_spark.sinks import export_foreach

    outdir = os.path.join(scratch, "calls")
    os.makedirs(outdir)
    df = spark.range(250).repartition(4)
    export_foreach(df, _file_processor_factory(outdir), records_per_call=30)
    seen = []
    sizes = []
    for fn in os.listdir(outdir):
        lines = open(os.path.join(outdir, fn)).read().split()
        sizes.append(len(lines))
        seen.extend(int(x) for x in lines)
    assert sorted(seen) == list(range(250))
    assert max(sizes) <= 30  # records-per-call respected


def test_stateful_latest_state_stream(spark, scratch):
    """applyInPandasWithState latest-state operator: the emitted per-key
    state after draining the stream equals the batch newest-wins result,
    including delete tombstones."""
    from sqoop_spark.streaming.stateful import latest_state_stream

    events = synthesize_change_events(spark, 2500, batch_size=500)
    src = os.path.join(scratch, "src")
    events.write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "3")
        .parquet(src)
    )
    q = (
        latest_state_stream(stream)
        .writeStream.format("memory")
        .queryName("latest_state")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stateful stream did not drain in time"
    out = spark.table("latest_state").toPandas()
    # last emission per key = the final state
    final = (
        out.sort_values("event_seq")
        .groupby(["repo", "path"], as_index=False)
        .last()
    )
    from sqoop_spark.cdc.merge import newest_wins_reduce

    expected = newest_wins_reduce(events, ["repo", "path"], "event_seq").toPandas()
    exp_map = {
        (r.repo, r.path): (r.event_seq, r.op, r.content_sha)
        for r in expected.itertuples()
    }
    got_map = {
        (r.repo, r.path): (r.event_seq, r.op, r.content_sha)
        for r in final.itertuples()
    }
    assert got_map == exp_map


def test_change_rate_stream_matches_batch(spark, scratch):
    """Watermarked windowed agg over the tail == the batch aggregation when
    nothing exceeds the lateness threshold (append mode emits only closed
    windows, so compare against the batch agg restricted to emitted ones)."""
    from sqoop_spark.streaming.metrics import change_rate_batch, change_rate_stream

    events = synthesize_change_events(spark, 2000, batch_size=1000)
    src = os.path.join(scratch, "src")
    events.write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "4")
        .parquet(src)
    )
    q = (
        change_rate_stream(stream, "5 minutes", "1 minute")
        .writeStream.format("memory")
        .queryName("change_rate")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "metrics stream did not drain in time"
    got = spark.table("change_rate").toPandas()
    exp = change_rate_batch(spark.read.parquet(src), "5 minutes").toPandas()
    key = ["window_start", "repo"]
    got = got.sort_values(key).reset_index(drop=True)
    # append mode withholds windows the watermark hasn't closed — every
    # emitted row must exactly match its batch twin, and most windows close
    exp_map = {
        (r.window_start, r.repo): (r.n_events, r.n_deletes, r.max_seq)
        for r in exp.itertuples()
    }
    assert len(got) > 0
    for r in got.itertuples():
        assert exp_map[(r.window_start, r.repo)] == (r.n_events, r.n_deletes, r.max_seq)


def test_change_rate_stream_rejects_batch_df(spark):
    from sqoop_spark.streaming.metrics import change_rate_stream

    with pytest.raises(ValueError, match="streaming"):
        change_rate_stream(spark.range(3))


def test_cli_export_modes(spark, scratch, capsys):
    """export tool: blind insert, allowinsert merge into an existing
    target, and delimited-text format (ExportTool dispatch parity)."""
    events = synthesize_change_events(spark, 1000, batch_size=500)
    lake = os.path.join(scratch, "lake")
    eng = CdcEngine.create_table(spark, lake, num_buckets=4)
    eng.replay(events)
    n_lake = eng.table.read().count()

    # 1. blind insert (no --update-key): target created from scratch
    tgt = os.path.join(scratch, "out_parquet")
    rc = cli_main(["export", "--source", lake, "--target-table", tgt])
    assert rc == 0
    assert json.loads(capsys.readouterr().out.strip())["rows"] == n_lake

    # 2. allowinsert merge into the existing target: re-export is a no-op
    #    row-count-wise (same keys upserted)
    rc = cli_main(
        [
            "export", "--source", lake, "--target-table", tgt,
            "--update-key", "repo,path", "--update-mode", "allowinsert",
        ]
    )
    assert rc == 0
    assert json.loads(capsys.readouterr().out.strip())["rows"] == n_lake

    # 3. text format with the Sqoop null-string default
    txt = os.path.join(scratch, "out_text")
    rc = cli_main(
        ["export", "--source", lake, "--target-table", txt, "--format", "text"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out == {"rows": n_lake, "format": "text"}
    assert any(f.startswith("part-") for f in os.listdir(txt))


def test_validate_replay_helper(spark, scratch):
    from sqoop_spark.errors import ValidationFailure
    from sqoop_spark.validation import validate_replay

    ev = synthesize_change_events(spark, 500, batch_size=500)
    eng = CdcEngine.create_table(spark, os.path.join(scratch, "t"), num_buckets=4)
    report = eng.replay(ev)
    assert validate_replay(report, 500).ok
    with pytest.raises(ValidationFailure):
        validate_replay(report, 501)


def test_stream_out_of_order_with_compaction(spark, scratch):
    """Late out-of-order epochs landing AFTER auto-compaction ran must not
    resurrect deleted keys — the streaming-level twin of the compaction
    tombstone-retention fix (delete markers survive compaction until an
    ordering horizon passes).

    Epochs are written as files in REVERSED event order, with an
    aggressive auto_compact_threshold so compaction interleaves with the
    out-of-order applies; the final state must still equal the global
    newest-wins oracle."""
    events = synthesize_change_events(spark, 4000, batch_size=500)  # 8 chunks
    src = os.path.join(scratch, "oosrc")
    os.makedirs(src)
    # one file per chunk, written (and thus streamed) newest-chunk-first
    for i, b in enumerate(reversed(range(8))):
        events.filter(F.col("batch_id") == b).drop("batch_id").coalesce(
            1
        ).write.parquet(os.path.join(src, f"chunk{i}"))

    stream = (
        spark.readStream.schema(
            spark.read.parquet(os.path.join(src, "chunk0")).schema
        )
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(os.path.join(src, "chunk*"))
    )
    engine = CdcEngine.create_table(
        spark,
        os.path.join(scratch, "ootbl"),
        num_buckets=4,
        merge_strategy="mor",
        auto_compact_threshold=2,  # compact constantly, between late epochs
    )
    q = stream_apply(engine, stream, os.path.join(scratch, "oockpt"))
    assert q.awaitTermination(300), "stream did not drain in time"

    # compaction really ran (tombstone markers present from winning deletes)
    ops = [s.operation for s in engine.table.snapshots()]
    assert "compact" in ops, ops
    got = (
        engine.table.read()
        .orderBy("repo", "path")
        .select("repo", "path", "content_sha")
        .toPandas()
    )
    oracle = replay_oracle(events.toPandas())
    assert got.reset_index(drop=True).equals(
        oracle[["repo", "path", "content_sha"]].reset_index(drop=True)
    )


def test_cli_import_validate(spark, scratch, capsys):
    """--validate wires RowCountValidator (BaseSqoopTool validation
    options): source slice count must equal rows transferred; a resume run
    that skips fenced batches reports validation as skipped instead of
    false-aborting."""
    events = synthesize_change_events(spark, 1500, batch_size=500)
    src = os.path.join(scratch, "vev")
    events.write.parquet(src)
    target = os.path.join(scratch, "vlake")

    rc = cli_main(
        [
            "import", "--table", src, "--target", target,
            "--merge-key", "repo,path", "--check-column", "event_seq",
            "--validate",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["events_seen"] == 1500
    assert out["validation"] == "Validation succeeded"

    # resume shape: re-run over the same source from the same (None)
    # watermark — all batches fenced → validation explicitly skipped
    rc = cli_main(
        [
            "import", "--table", src, "--target", target,
            "--merge-key", "repo,path", "--check-column", "event_seq",
            "--validate",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["events_seen"] == 0
    assert out["validation"].startswith("Validation skipped: resume run")


def test_cli_list_tools_require_path_or_connect():
    """Round-2 ADVICE: neither --path nor --connect is a usage error, not a
    TypeError from os.path.join(None, ...)."""
    from sqoop_spark.cli import main as cli_main

    with pytest.raises(SystemExit, match="one of --path or --connect"):
        cli_main(["list-tables"])
    with pytest.raises(SystemExit, match="one of --path or --connect"):
        cli_main(["list-databases"])


def test_cli_history(spark, scratch, capsys):
    """history tool: one JSON line per snapshot from pure manifest
    metadata (no Spark session inside the tool), versions in order with
    operations and live-row totals."""
    from pyspark.sql import types as T

    from sqoop_spark.lake import LakeTable

    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
    )
    path = os.path.join(scratch, "hist_t")
    t = LakeTable.create(spark, path, schema, ["k"], num_buckets=2)
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], schema), batch_id=0)
    t.append(spark.createDataFrame([(3, "c")], schema), batch_id=1)

    assert cli_main(["history", "--path", path]) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert [x["version"] for x in lines] == [1, 2, 3]
    assert [x["operation"] for x in lines] == ["create", "append", "append"]
    assert lines[2]["total_rows"] == 3
    assert lines[1]["summary"]["batch_id"] == 0

    with pytest.raises(SystemExit, match="no lake table"):
        cli_main(["history", "--path", os.path.join(scratch, "nope")])


def test_cli_maintain(spark, scratch, capsys):
    """maintain tool: bin-packing + snapshot expiry + orphan cleanup over
    one CLI surface; JSON report per action."""
    from pyspark.sql import types as T

    from sqoop_spark.lake import LakeTable

    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("seq", T.LongType())]
    )
    path = os.path.join(scratch, "mt_t")
    t = LakeTable.create(
        spark, path, schema, ["k"], num_buckets=2,
        properties={"order_column": "seq"},
    )
    for c in range(3):
        t.append(spark.createDataFrame([(c * 5 + i, c * 5 + i) for i in range(5)], schema))
    files_before = len(t.manifest()["files"])

    assert cli_main(["maintain", "--path", path, "--rewrite-small-files", "1000"]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["rewrite"]["rewritten_files"] == files_before

    assert cli_main(
        ["maintain", "--path", path, "--expire-snapshots", "1",
         "--remove-orphans", "0"]
    ) == 0
    rep2 = json.loads(capsys.readouterr().out.strip())
    assert rep2["expire"]["expired_versions"] >= 1

    t2 = LakeTable.load(spark, path)
    assert t2.read().count() == 15

    assert cli_main(["maintain", "--path", path, "--rebucket", "8"]) == 0
    rep3 = json.loads(capsys.readouterr().out.strip())
    assert rep3["rebucket"]["num_buckets_after"] == 8
    t3 = LakeTable.load(spark, path)
    assert t3.num_buckets == 8 and t3.read().count() == 15
    # already at 8 -> noop report, no commit
    v = t3.current_version()
    assert cli_main(["maintain", "--path", path, "--rebucket", "8"]) == 0
    assert json.loads(capsys.readouterr().out.strip())["rebucket"] == {"noop": True}
    assert LakeTable.load(spark, path).current_version() == v

    with pytest.raises(SystemExit, match="required"):
        cli_main(["maintain", "--path", path])


def test_cli_export_incremental_and_changelog(spark, scratch, capsys):
    """export --since (zone-map incremental) and --changes-since (outbound
    CDC diff) over a lake-table source."""
    from pyspark.sql import types as T

    from sqoop_spark.lake import LakeTable

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("v", T.StringType()),
        ]
    )
    src = os.path.join(scratch, "exp_src")
    t = LakeTable.create(
        spark, src, schema, ["k"], num_buckets=2,
        properties={"order_column": "seq"},
    )
    t.append(spark.createDataFrame([(i, i, f"a{i}") for i in range(10)], schema))
    v2 = t.current_version()
    t.append(spark.createDataFrame([(i, i, f"b{i}") for i in range(10, 16)], schema))

    out1 = os.path.join(scratch, "exp_out1")
    assert cli_main(
        ["export", "--source", src, "--target-table", out1,
         "--since", "9", "--check-column", "seq"]
    ) == 0
    capsys.readouterr()
    got = {(r.k, r.seq) for r in spark.read.parquet(out1).collect()}
    assert got == {(i, i) for i in range(10, 16)}

    out2 = os.path.join(scratch, "exp_out2")
    assert cli_main(
        ["export", "--source", src, "--target-table", out2,
         "--changes-since", str(v2)]
    ) == 0
    capsys.readouterr()
    diff = spark.read.parquet(out2)
    assert set(diff.columns) == {"k", "seq", "v", "_change"}
    assert {(r.k, r._change) for r in diff.collect()} == {
        (i, "insert") for i in range(10, 16)
    }

    with pytest.raises(SystemExit, match="lake-table source"):
        cli_main(
            ["export", "--source", out1, "--target-table",
             os.path.join(scratch, "exp_out3"), "--since", "0"]
        )

    # --format debezium: the diff ships as c/u/d envelope JSONL a
    # downstream parse_debezium recovers losslessly; a full-state export
    # marks rows as snapshot reads (op 'r', still upsert on re-ingest)
    from sqoop_spark.sources.debezium import parse_debezium

    out4 = os.path.join(scratch, "exp_out4")
    assert cli_main(
        ["export", "--source", src, "--target-table", out4,
         "--changes-since", str(v2), "--format", "debezium"]
    ) == 0
    capsys.readouterr()
    back = parse_debezium(spark.read.text(out4), schema)
    assert {(r.k, r.op, r.event_seq) for r in back.collect()} == {
        (i, "upsert", t.current_version()) for i in range(10, 16)
    }

    out5 = os.path.join(scratch, "exp_out5")
    assert cli_main(
        ["export", "--source", src, "--target-table", out5,
         "--format", "debezium"]
    ) == 0
    capsys.readouterr()
    env = [json.loads(r.value) for r in spark.read.text(out5).collect()]
    assert len(env) == 16 and {e["op"] for e in env} == {"r"}
    assert {(r.k, r.op) for r in parse_debezium(
        spark.read.text(out5), schema).collect()
    } == {(i, "upsert") for i in range(16)}


def test_cli_import_dedup_id_cols(spark, scratch, capsys):
    """--dedup-id-cols: a redelivered (duplicated) source blind-appends
    only one copy per event id."""
    events = synthesize_change_events(spark, 500, batch_size=500)
    dup = events.unionByName(events)
    src = os.path.join(scratch, "dup_events")
    dup.write.parquet(src)
    target = os.path.join(scratch, "dup_lake")

    rc = cli_main(
        [
            "import",
            "--table", src,
            "--target", target,
            "--check-column", "event_seq",
            "--dedup-id-cols", "event_seq",
        ]
    )
    assert rc == 0
    capsys.readouterr()
    from sqoop_spark.lake import LakeTable

    assert LakeTable.load(spark, target).read().count() == 500
