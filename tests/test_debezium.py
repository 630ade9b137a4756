"""Debezium-envelope source/sink — the binlog/WAL tail front end.

Envelope fixtures follow the public Debezium change-event shape
(before/after images, op c|r|u|d, source block with log position) for
both the MySQL (file/pos) and Postgres (lsn) connectors.
"""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqoop_spark.sources.debezium import (
    envelope_schema,
    parse_debezium,
    to_debezium,
)

ROW = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
)


def _env(op, before, after, pos=None, lsn=None, ts_ms=0, extra_source=None):
    source = {"connector": "mysql" if pos is not None else "postgresql",
              "ts_ms": ts_ms - 50}
    if pos is not None:
        source.update({"file": "binlog.000001", "pos": pos})
    if lsn is not None:
        source["lsn"] = lsn
    if extra_source:
        source.update(extra_source)
    return json.dumps(
        {"before": before, "after": after, "op": op, "ts_ms": ts_ms,
         "source": source}
    )


def test_parse_ops_images_and_order(spark):
    events = [
        _env("c", None, {"id": 1, "name": "a"}, pos=100, ts_ms=1000),
        _env("r", None, {"id": 2, "name": "b"}, pos=0, ts_ms=2000,
             extra_source={"snapshot": "true"}),
        _env("u", {"id": 1, "name": "a"}, {"id": 1, "name": "a2"},
             lsn=500, ts_ms=3000),
        _env("d", {"id": 2, "name": "b"}, None, lsn=600, ts_ms=4000),
    ]
    df = spark.createDataFrame([(e,) for e in events], "value string")
    got = {
        (r["id"], r["name"], r["op"], r["event_seq"])
        for r in parse_debezium(df, ROW).collect()
    }
    # c/r/u -> upsert with AFTER image; d -> delete with BEFORE image;
    # order = pos (mysql) or lsn (postgres)
    assert got == {
        (1, "a", "upsert", 100),
        (2, "b", "upsert", 0),
        (1, "a2", "upsert", 500),
        (2, "b", "delete", 600),
    }


def test_ts_and_order_fallbacks(spark):
    # no pos/lsn at all -> order falls back to envelope ts_ms;
    # event_ts prefers envelope ts_ms over source.ts_ms
    e = _env("c", None, {"id": 9, "name": "z"}, ts_ms=1700000001000)
    df = spark.createDataFrame([(e,)], "value string")
    row = parse_debezium(df, ROW).collect()[0]
    assert row["event_seq"] == 1700000001000
    assert row["event_ts"].isoformat().startswith("2023-11-14")


def test_tombstone_truncate_message_dropped(spark):
    events = [
        None,  # Kafka tombstone
        json.dumps({"before": None, "after": None, "op": "t", "ts_ms": 1,
                    "source": {"lsn": 5}}),  # truncate: no row image
        json.dumps({"op": "m", "ts_ms": 2, "source": {"lsn": 6}}),  # message
        _env("c", None, {"id": 1, "name": "a"}, pos=10),
    ]
    df = spark.createDataFrame([(e,) for e in events], "value string")
    assert parse_debezium(df, ROW).count() == 1


def test_malformed_failfast_and_drop(spark):
    df = spark.createDataFrame(
        [(_env("c", None, {"id": 1, "name": "a"}, pos=1),), ("{garbage",)],
        "value string",
    )
    with pytest.raises(Exception, match="Malformed|FAILFAST|BadRecord"):
        parse_debezium(df, ROW).collect()
    assert parse_debezium(df, ROW, drop_malformed=True).count() == 1


def test_order_expr_override(spark):
    # MySQL file rotation: (file, pos) must be combined by the caller
    e1 = _env("c", None, {"id": 1, "name": "a"}, pos=900)
    e2 = json.dumps({"before": None, "after": {"id": 2, "name": "b"},
                     "op": "c", "ts_ms": 0,
                     "source": {"file": "binlog.000002", "pos": 5}})
    df = spark.createDataFrame([(e1,), (e2,)], "value string")
    order = (
        F.regexp_extract(F.col("e.source.file"), r"(\d+)$", 1).cast("long")
        * 1_000_000_000
        + F.col("e.source.pos")
    )
    rows = {r["id"]: r["event_seq"]
            for r in parse_debezium(df, ROW, order_expr=order).collect()}
    assert rows[1] == 1_000_000_900 and rows[2] == 2_000_000_005
    assert rows[2] > rows[1]  # later file orders after earlier file


def test_outbound_roundtrip_and_shapes(spark):
    diff = spark.createDataFrame(
        [(1, "a", "insert"), (2, "b", "update"), (3, "c", "delete")],
        "id long, name string, _change string",
    )
    env = to_debezium(diff, "srv1", "t1",
                      pos_expr=F.col("id") * 10, ts_expr=F.lit(1000))
    vals = [json.loads(r["value"]) for r in env.collect()]
    by_op = {v["op"]: v for v in vals}
    assert set(by_op) == {"c", "u", "d"}
    assert by_op["c"]["after"] == {"id": 1, "name": "a"}
    assert "before" not in by_op["c"] or by_op["c"].get("before") is None
    assert by_op["d"]["before"] == {"id": 3, "name": "c"}
    assert by_op["d"].get("after") is None
    assert by_op["u"]["source"]["pos"] == 20
    # outbound -> inbound round trip recovers rows and op mapping
    back = parse_debezium(env, ROW)
    got = {(r["id"], r["name"], r["op"]) for r in back.collect()}
    assert got == {(1, "a", "upsert"), (2, "b", "upsert"), (3, "c", "delete")}


def test_streaming_tail_to_lake(spark, scratch):
    """binlog tail -> lake upsert, end to end under Structured Streaming:
    JSON-lines files readStream'd, parsed, stream_apply'd into a MoR
    engine; final state matches the hand-computed outcome."""
    from sqoop_spark.cdc import CdcEngine
    from sqoop_spark.streaming.foreach import stream_apply

    tail = os.path.join(scratch, "tail")
    os.makedirs(tail)
    lines = [
        _env("c", None, {"id": 1, "name": "a"}, pos=1),
        _env("c", None, {"id": 2, "name": "b"}, pos=2),
        _env("u", {"id": 1, "name": "a"}, {"id": 1, "name": "a2"}, pos=3),
        _env("d", {"id": 2, "name": "b"}, None, pos=4),
        _env("c", None, {"id": 3, "name": "c"}, pos=5),
    ]
    with open(os.path.join(tail, "chunk0.jsonl"), "w") as f:
        f.write("\n".join(lines))

    schema = T.StructType(
        list(ROW)
        + [
            T.StructField("op", T.StringType()),
            T.StructField("event_seq", T.LongType()),
            T.StructField("event_ts", T.TimestampType()),
        ]
    )
    engine = CdcEngine.create_table(
        spark,
        os.path.join(scratch, "lake"),
        schema=schema,
        key_columns=("id",),
        num_buckets=4,
        merge_strategy="mor",
    )
    stream = parse_debezium(
        spark.readStream.format("text").load(tail), ROW
    )
    q = stream_apply(engine, stream, os.path.join(scratch, "ckpt"))
    q.awaitTermination(120)
    got = {(r["id"], r["name"]) for r in engine.table.read().collect()}
    assert got == {(1, "a2"), (3, "c")}


def test_envelope_schema_shape():
    env = envelope_schema(ROW)
    assert env["before"].dataType == ROW and env["after"].dataType == ROW
    assert [f.name for f in env] == ["before", "after", "op", "ts_ms", "source"]


def test_split_routes_malformed_to_dlq(spark):
    """parse_debezium_split: corrupt payloads land in the dead-letter frame
    with the raw payload; valid no-image protocol events (tombstones,
    truncate/message) are dropped from BOTH frames, not dead-lettered."""
    from sqoop_spark.sources.debezium import parse_debezium_split

    events = [
        _env("c", None, {"id": 1, "name": "a"}, pos=1),
        "{garbage",                       # malformed -> DLQ
        "[1, 2]",                         # valid JSON, wrong shape -> DLQ
        None,                             # Kafka tombstone -> dropped
        json.dumps({"before": None, "after": None, "op": "t", "ts_ms": 1,
                    "source": {"lsn": 5}}),  # truncate -> dropped
        json.dumps({"after": {"id": 9, "name": "z"},
                    "source": {"lsn": 6}}),  # missing op -> DLQ
        json.dumps({"op": "z", "after": {"id": 9, "name": "z"},
                    "source": {"lsn": 7}}),  # unknown op -> DLQ
        _env("d", {"id": 1, "name": "a"}, None, pos=2),
    ]
    df = spark.createDataFrame([(e,) for e in events], "value string")
    good, bad = parse_debezium_split(df, ROW)
    assert {(r["id"], r["op"]) for r in good.collect()} == {
        (1, "upsert"), (1, "delete")
    }
    dlq = bad.collect()
    reasons = sorted(r["reason"] for r in dlq)
    assert reasons == ["invalid_op", "invalid_op",
                       "malformed_json", "malformed_json"]
    assert {r["payload"] for r in dlq} >= {"{garbage"}
    assert good.count() + bad.count() == 6  # 2 good + 4 dlq; 2 dropped


def test_split_matches_failfast_on_clean_input(spark):
    """On a clean tail the split frame is exactly parse_debezium's."""
    from sqoop_spark.sources.debezium import parse_debezium_split

    events = [
        _env("c", None, {"id": 1, "name": "a"}, pos=1),
        _env("u", {"id": 1, "name": "a"}, {"id": 1, "name": "b"}, pos=2),
    ]
    df = spark.createDataFrame([(e,) for e in events], "value string")
    good, bad = parse_debezium_split(df, ROW)
    assert bad.count() == 0
    assert sorted(map(tuple, good.collect())) == sorted(
        map(tuple, parse_debezium(df, ROW).collect())
    )


def test_streaming_tail_schema_evolution_across_restart(spark, scratch):
    """The tail's table gains a column: stop the stream, evolve the lake
    schema (add_column DDL), restart the SAME checkpoint with the widened
    envelope row schema. Pre-evolution rows backfill NULL; post-evolution
    events carry the new column; the key state stays correct throughout —
    the operational shape of a Debezium ALTER TABLE rollout."""
    from sqoop_spark.cdc import CdcEngine
    from sqoop_spark.streaming.foreach import stream_apply

    tail = os.path.join(scratch, "tail")
    os.makedirs(tail)
    with open(os.path.join(tail, "chunk0.jsonl"), "w") as f:
        f.write("\n".join([
            _env("c", None, {"id": 1, "name": "a"}, pos=1),
            _env("c", None, {"id": 2, "name": "b"}, pos=2),
        ]))

    schema = T.StructType(
        list(ROW)
        + [
            T.StructField("op", T.StringType()),
            T.StructField("event_seq", T.LongType()),
            T.StructField("event_ts", T.TimestampType()),
        ]
    )
    engine = CdcEngine.create_table(
        spark,
        os.path.join(scratch, "lake"),
        schema=schema,
        key_columns=("id",),
        num_buckets=4,
        merge_strategy="mor",
    )
    ckpt = os.path.join(scratch, "ckpt")
    q = stream_apply(
        engine, parse_debezium(spark.readStream.format("text").load(tail), ROW),
        ckpt,
    )
    q.awaitTermination(120)

    # source ALTER TABLE lands: evolve the lake schema, then resume the
    # tail with the widened row schema on the SAME checkpoint
    engine.table.add_column("email", "string")
    row2 = T.StructType(list(ROW) + [T.StructField("email", T.StringType())])
    with open(os.path.join(tail, "chunk1.jsonl"), "w") as f:
        f.write("\n".join([
            _env("u", None, {"id": 1, "name": "a2", "email": "a@x"}, pos=3),
            _env("c", None, {"id": 3, "name": "c", "email": "c@x"}, pos=4),
        ]))
    q2 = stream_apply(
        engine, parse_debezium(spark.readStream.format("text").load(tail), row2),
        ckpt,
    )
    q2.awaitTermination(120)

    got = {(r["id"], r["name"], r["email"]) for r in engine.table.read().collect()}
    assert got == {(1, "a2", "a@x"), (2, "b", None), (3, "c", "c@x")}


def test_null_order_raises_and_split_dlqs(spark):
    """A row event with no usable log position (lsn/pos/ts_ms all null, or
    an order_expr that casts to null) cannot be merge-ordered: the strict
    parser fails LOUDLY; the split parser dead-letters it as
    missing_order instead of nulling event_seq silently."""
    from sqoop_spark.sources.debezium import parse_debezium_split

    no_pos = json.dumps({"before": None, "after": {"id": 1, "name": "a"},
                         "op": "c", "source": {"db": "d"}})
    ok = _env("c", None, {"id": 2, "name": "b"}, pos=7)
    df = spark.createDataFrame([(no_pos,), (ok,)], "value string")

    with pytest.raises(Exception, match="no usable order"):
        parse_debezium(df, ROW).collect()

    good, bad = parse_debezium_split(df, ROW)
    assert [r["id"] for r in good.collect()] == [2]
    assert [r["reason"] for r in bad.collect()] == ["missing_order"]

    # a STRING order_expr that casts to null is the same failure, loudly
    df_ok = spark.createDataFrame([(ok,)], "value string")
    with pytest.raises(Exception, match="no usable order"):
        parse_debezium(
            df_ok, ROW, order_expr=F.concat(F.col("e.source.file"),
                                            F.lit("/"))
        ).collect()
