"""Debezium-envelope CDC source/sink — the public binlog/WAL tail format.

The engine's inbound contract is a change-event frame (key columns +
payload, an ``op`` column with ``upsert``/``delete``, a monotonic order
column). Real deployments rarely hand you that frame directly: the
binlog/WAL tail arrives as Debezium change events — the de-facto public
envelope for MySQL binlog / Postgres WAL / Oracle redo capture
(https://debezium.io/documentation/reference/connectors/mysql.html —
``before``/``after`` row images, ``op`` in ``c|r|u|d``, a ``source``
block carrying the log position). This module converts between that
envelope and the engine frame, entirely JVM-side (``from_json`` /
``to_json`` — no Python in the row path):

- :func:`parse_debezium` — envelope JSON → engine change-event frame.
  ``c`` (create), ``r`` (snapshot read) and ``u`` (update) become
  ``upsert`` with the ``after`` image; ``d`` becomes ``delete`` with the
  ``before`` image. The order column is taken from the source block's
  log position (``lsn`` for Postgres, ``pos`` for MySQL, falling back to
  ``ts_ms``) unless the caller supplies ``order_expr`` — a MySQL tail
  that rotates binlog files must combine ``(file, pos)``, which only the
  caller can encode correctly for their file-naming scheme.
- :func:`to_debezium` — a snapshot diff (``LakeTable.changes_between``'s
  ``_change`` frame) → envelope JSON, so downstream Kafka-Connect-style
  consumers can read the outbound changelog. Updates carry only the
  ``after`` image (``before`` is null — the same shape Debezium itself
  emits when the source lacks a full replica identity; this engine's
  changelog stores current state, not prior images).

Reference anchors: Sqoop has no streaming-envelope source — its
incremental import re-queries the table (tool/ImportTool.java watermark
logic, SURVEY §2.3). This module is the piece that turns the engine into
the reference's *deployment* story at 10^10 events: the tail lands as
Debezium JSON in object storage / Kafka, and the engine consumes it
without a per-row Python decoder.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Debezium source block — the superset of the per-connector fields the
#: order fallback needs (unknown JSON fields are ignored by from_json).
SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("version", T.StringType()),
        T.StructField("connector", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("snapshot", T.StringType()),
        T.StructField("db", T.StringType()),
        T.StructField("schema", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("server_id", T.LongType()),
        T.StructField("gtid", T.StringType()),
        T.StructField("file", T.StringType()),
        T.StructField("pos", T.LongType()),
        T.StructField("row", T.IntegerType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("txId", T.LongType()),
    ]
)


def envelope_schema(row_schema: T.StructType) -> T.StructType:
    """The Debezium change-event value schema for a given table row."""
    return T.StructType(
        [
            T.StructField("before", row_schema),
            T.StructField("after", row_schema),
            T.StructField("op", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("source", SOURCE_SCHEMA),
        ]
    )


def parse_debezium(
    df: DataFrame,
    row_schema: T.StructType,
    value_col: str = "value",
    order_expr: Column | None = None,
    seq_col: str = "event_seq",
    ts_col: str = "event_ts",
    op_col: str = "op",
    drop_malformed: bool = False,
) -> DataFrame:
    """Envelope JSON strings → the engine's change-event frame.

    Returns one row per data event with the payload columns of
    ``row_schema`` plus ``op`` (``upsert``/``delete``), ``seq_col`` (the
    log position) and ``ts_col``. Kafka tombstones (null values) and
    non-row events (``t`` truncate / ``m`` message, which carry no row
    image) are dropped. Malformed JSON raises unless ``drop_malformed``
    (from_json yields a null struct for garbage — silently treating a
    corrupt tail as empty would violate the exactly-once story, so the
    default is loud).
    """
    env = envelope_schema(row_schema)
    # FAILFAST: malformed JSON must fail the job with the offending
    # payload, not silently parse to a struct of nulls (PERMISSIVE's
    # behavior) — a corrupt tail treated as empty would break the
    # exactly-once story. With drop_malformed, PERMISSIVE's null-`op`
    # rows fall out of the op filter below.
    opts = {"mode": "PERMISSIVE" if drop_malformed else "FAILFAST"}
    parsed = df.filter(F.col(value_col).isNotNull()).select(
        F.from_json(F.col(value_col), env, opts).alias("e")
    )
    return _frame_from_parsed(parsed, order_expr, seq_col, ts_col, op_col)


def _order_or_default(order_expr: Column | None) -> Column:
    """The log-position order column: caller's expression, else
    lsn (Postgres) → pos (MySQL) → envelope ts_ms."""
    if order_expr is not None:
        return order_expr
    return F.coalesce(F.col("e.source.lsn"), F.col("e.source.pos"),
                      F.col("e.ts_ms"))


def _frame_from_parsed(
    parsed: DataFrame,
    order_expr: Column | None,
    seq_col: str,
    ts_col: str,
    op_col: str,
) -> DataFrame:
    """Parsed envelopes (column ``e``) → the engine change-event frame."""
    # A ROW event with no usable log position cannot be merge-ordered:
    # fail LOUDLY instead of silently nulling — a null here means the
    # tail lacks lsn/pos/ts_ms entirely, or a caller's order_expr isn't
    # castable to long (try_cast keeps the failure on THIS message, not
    # ANSI cast's). The guard is TOTAL over all parsed rows (non-row
    # events pass vacuously) so Catalyst filter pushdown can't evaluate
    # it against rows another filter would have dropped.
    # parse_debezium_split routes these to the DLQ before this guard.
    order_ok = F.when(
        F.col("e.op").isin("c", "r", "u", "d"),
        _order_or_default(order_expr).try_cast("long").isNotNull(),
    ).otherwise(F.lit(True))
    checked = parsed.filter(
        F.assert_true(
            order_ok,
            F.lit(
                "debezium event has no usable order: lsn/pos/ts_ms all "
                "null, or order_expr not castable to long"
            ),
        ).isNull()
    )
    rows = checked.filter(F.col("e.op").isin("c", "r", "u", "d"))
    image = F.when(F.col("e.op") == "d", F.col("e.before")).otherwise(
        F.col("e.after")
    )
    out = rows.select(
        image.alias("_img"),
        F.when(F.col("e.op") == "d", F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias(op_col),
        _order_or_default(order_expr).try_cast("long").alias(seq_col),
        F.timestamp_millis(
            F.coalesce(F.col("e.ts_ms"), F.col("e.source.ts_ms"))
        ).alias(ts_col),
    )
    # a delete without a before image (source without full replica
    # identity) yields null payload columns here — kept, not dropped:
    # the merge's null-key error is the honest failure for a tail the
    # engine cannot key.
    return out.select("_img.*", op_col, seq_col, ts_col)


def parse_debezium_split(
    df: DataFrame,
    row_schema: T.StructType,
    value_col: str = "value",
    order_expr: Column | None = None,
    seq_col: str = "event_seq",
    ts_col: str = "event_ts",
    op_col: str = "op",
) -> tuple[DataFrame, DataFrame]:
    """Envelope JSON → ``(events, dead_letters)`` — the production tail
    contract: a corrupt payload must neither fail the whole job (FAILFAST)
    nor silently vanish (``drop_malformed``); it goes to a dead-letter
    frame (``payload`` string + ``reason``) the operator can land next to
    the table and replay after a fix.

    Malformed JSON is detected JVM-side via ``from_json``'s
    ``columnNameOfCorruptRecord`` (PERMISSIVE fills the corrupt column
    with the raw record); parseable envelopes whose ``op`` is missing or
    outside the protocol (not ``c|r|u|d|t|m``) dead-letter with reason
    ``invalid_op`` — without this they would vanish from both frames.
    Valid envelopes that carry no row image — Kafka tombstones, ``t``
    truncate / ``m`` message events — are VALID protocol, so they are
    dropped from both frames, not dead-lettered.

    Both returned frames are lazy plans over the same input scan; when
    the source read is expensive (an object-store tail), persist ``df``
    or split inside ``foreachBatch`` so each micro-batch is read once.
    """
    env = envelope_schema(row_schema)
    env_c = T.StructType(
        env.fields + [T.StructField("_corrupt", T.StringType())]
    )
    parsed = df.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col),
        F.from_json(
            F.col(value_col),
            env_c,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("e"),
    )
    corrupt = F.col("e._corrupt").isNotNull()
    bad_op = F.col("e.op").isNull() | ~F.col("e.op").isin(
        "c", "r", "u", "d", "t", "m"
    )
    # a ROW event whose log position is unusable (lsn/pos/ts_ms all null,
    # or order_expr not castable to long) cannot be merge-ordered — DLQ,
    # not the loud failure parse_debezium raises
    no_order = F.col("e.op").isin("c", "r", "u", "d") & _order_or_default(
        order_expr
    ).try_cast("long").isNull()
    bad = parsed.filter(corrupt | bad_op | no_order).select(
        F.col(value_col).alias("payload"),
        F.when(corrupt, F.lit("malformed_json"))
        .when(bad_op, F.lit("invalid_op"))
        .otherwise(F.lit("missing_order"))
        .alias("reason"),
    )
    good = parsed.filter(~corrupt & ~bad_op & ~no_order).select("e")
    return _frame_from_parsed(good, order_expr, seq_col, ts_col, op_col), bad


def to_debezium(
    diff: DataFrame,
    source_name: str,
    table: str,
    change_col: str = "_change",
    ts_expr: Column | None = None,
    pos_expr: Column | None = None,
    insert_op: str = "c",
) -> DataFrame:
    """A ``changes_between`` diff frame → Debezium envelope JSON strings
    (column ``value``), for Kafka-Connect-style downstream consumers.

    ``insert``→``c``, ``update``→``u`` (after image only — see module
    docstring), ``delete``→``d`` (before image). ``pos_expr`` supplies
    the source position (default: the table version must be embedded by
    the caller; falls back to 0) and ``ts_expr`` the event timestamp in
    epoch millis (default 0 — deterministic output for tests; wall time
    is the caller's to inject). ``insert_op="r"`` marks inserts as
    snapshot reads — the op Debezium emits for an initial full-state
    snapshot."""
    payload_cols = [c for c in diff.columns if c != change_col]
    row = F.struct(*[F.col(c) for c in payload_cols])
    op = (
        F.when(F.col(change_col) == "insert", F.lit(insert_op))
        .when(F.col(change_col) == "update", F.lit("u"))
        .when(F.col(change_col) == "delete", F.lit("d"))
    )
    null_row = F.lit(None).cast(
        T.StructType([diff.schema[c] for c in payload_cols])
    )
    before = F.when(F.col(change_col) == "delete", row).otherwise(null_row)
    after = F.when(F.col(change_col) != "delete", row).otherwise(null_row)
    ts_ms = (ts_expr if ts_expr is not None else F.lit(0)).cast("long")
    pos = (pos_expr if pos_expr is not None else F.lit(0)).cast("long")
    env = F.struct(
        before.alias("before"),
        after.alias("after"),
        op.alias("op"),
        ts_ms.alias("ts_ms"),
        F.struct(
            F.lit("sqoop-spark").alias("connector"),
            F.lit(source_name).alias("name"),
            ts_ms.alias("ts_ms"),
            F.lit(table).alias("table"),
            pos.alias("pos"),
        ).alias("source"),
    )
    return diff.select(F.to_json(env).alias("value"))
