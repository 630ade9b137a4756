"""Hadoop SequenceFile<LongWritable, Text> writer/reader — pure Python.

Sqoop's ``--as-sequencefile`` (SqoopOptions.java:86-92 FileLayout, written
by mapreduce/SequenceFileImportMapper.java) emits records of
``(LongWritable record-id, SqoopRecord)``. The SqoopRecord value is an
instance of the per-table *generated* class — meaningless to any reader
without that generated class on its classpath — so this engine's analog
stores the record's **delimited string form as a Text value** (the same
``SqoopRecord.toString(DelimiterSet)`` line the text layout writes),
which every Hadoop/Spark installation can read. The key keeps the
reference's LongWritable record-id contract.

Why pure Python: PySpark's ``saveAsNewAPIHadoopFile`` converts keys with
Pyrolite, which maps Python ints to ``IntWritable``/``LongWritable`` by
*magnitude* — a mixed-key-class SequenceFile is invalid and the write
fails mid-stream ("wrong key class: IntWritable is not LongWritable").
So, like the Avro container (avro_container.py), the container is written
against the public on-disk format (org.apache.hadoop.io.SequenceFile
javadoc, version-6 header):

  ``SEQ\\x06`` | key class name | value class name (Text.writeString:
  vint length + UTF-8) | compress flag | block-compress flag |
  [codec class if compressed] | metadata entry count (int32 BE) |
  16-byte sync marker; then per record:
  record-length(int32 BE) key-length(int32 BE) key-bytes value-bytes,
  with a sync escape (int32 -1 + sync marker) every ~2000 bytes.

Key = LongWritable (8-byte big-endian), value = Text (vint byte length +
UTF-8). ``compression="deflate"`` writes record-compressed values with
``org.apache.hadoop.io.compress.DefaultCodec`` (zlib). Round-trip through
Spark's own JVM ``sc.sequenceFile`` reader is pytest-pinned, so the
emitted bytes are proven Hadoop-compatible, not just self-consistent.

Scale: one container file per partition via ``foreachPartition``
(the reference's one-file-per-map-task layout); record ids are
``(partition_id << 33) + row_index`` — the ``monotonically_increasing_id``
convention, unique across a table of up to 2^33 rows per task. The
encoder is row-at-a-time Python on the export boundary only, the same
trade as the Avro container and the DB-API JDBC writer.
"""

from __future__ import annotations

import io
import os
import struct
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqoop_spark.errors import EngineError

MAGIC = b"SEQ\x06"
SYNC_SIZE = 16
#: Hadoop SequenceFile.Writer.SYNC_INTERVAL: a sync escape roughly every
#: 100 * (4 + SYNC_SIZE) bytes keeps files splittable mid-stream.
SYNC_INTERVAL = 100 * (4 + SYNC_SIZE)
KEY_CLASS = "org.apache.hadoop.io.LongWritable"
VALUE_CLASS = "org.apache.hadoop.io.Text"
DEFLATE_CODEC = "org.apache.hadoop.io.compress.DefaultCodec"


def _write_vlong(out: io.BytesIO, n: int) -> None:
    """WritableUtils.writeVLong — Hadoop's variable-length long."""
    if -112 <= n <= 127:
        out.write(struct.pack(">b", n))
        return
    length = -112
    if n < 0:
        n = ~n
        length = -120
    tmp = n
    while tmp != 0:
        tmp >>= 8
        length -= 1
    out.write(struct.pack(">b", length))
    size = -(length + 112) if length >= -120 else -(length + 120)
    for idx in range(size - 1, -1, -1):
        out.write(bytes([(n >> (8 * idx)) & 0xFF]))


def _read_vlong(buf: io.BufferedIOBase) -> int:
    first = struct.unpack(">b", buf.read(1))[0]
    if -112 <= first <= 127:
        return first
    negative = first < -120
    size = -(first + 120) if negative else -(first + 112)
    n = 0
    for _ in range(size):
        n = (n << 8) | buf.read(1)[0]
    return ~n if negative else n


def _text(s: str) -> bytes:
    """org.apache.hadoop.io.Text serialization: vint length + UTF-8."""
    raw = s.encode("utf-8")
    out = io.BytesIO()
    _write_vlong(out, len(raw))
    out.write(raw)
    return out.getvalue()


def _sync_for(path_tag: str, pid: int) -> bytes:
    import hashlib

    return hashlib.sha256(f"seq|{path_tag}|{pid}".encode()).digest()[:SYNC_SIZE]


def _write_seqfile(
    path: str, pairs: Iterator[tuple[int, str]], sync: bytes, codec: str | None
) -> None:
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(_text(KEY_CLASS))
        f.write(_text(VALUE_CLASS))
        f.write(struct.pack(">?", codec is not None))  # compress
        f.write(struct.pack(">?", False))  # block-compress
        if codec is not None:
            f.write(_text(codec))
        f.write(struct.pack(">i", 0))  # metadata: zero TreeMap entries
        f.write(sync)
        since_sync = 0
        for key, line in pairs:
            if since_sync >= SYNC_INTERVAL:
                f.write(struct.pack(">i", -1))
                f.write(sync)
                since_sync = 0
            kbytes = struct.pack(">q", key)
            vbytes = _text(line if line is not None else "")
            if codec is not None:
                vbytes = zlib.compress(vbytes)
            rec = struct.pack(">ii", len(kbytes) + len(vbytes), len(kbytes))
            f.write(rec)
            f.write(kbytes)
            f.write(vbytes)
            since_sync += len(rec) + len(kbytes) + len(vbytes)


def _line_column(
    df: DataFrame,
    field_delim: str,
    enclosed_by: str | None,
    escaped_by: str | None,
    optionally_enclosed: bool,
    null_string: str,
):
    """The record's delimited string form, built JVM-side with ``to_csv``
    under the same options as ``sinks.write_delimited`` (DelimiterSet /
    FieldFormatter semantics) — Python only ships finished lines."""
    # the CSV formatter trims trailing whitespace by default; Sqoop's
    # FieldFormatter never trims (lib/FieldFormatter.java has no trim path)
    opts = {
        "sep": field_delim,
        "nullValue": null_string,
        "emptyValue": "",
        "ignoreLeadingWhiteSpace": "false",
        "ignoreTrailingWhiteSpace": "false",
    }
    if enclosed_by is not None:
        opts["quote"] = enclosed_by
        opts["quoteAll"] = "false" if optionally_enclosed else "true"
    else:
        opts["quote"] = "\u0000"
    if escaped_by is not None:
        opts["escape"] = escaped_by
    return F.to_csv(F.struct(*[F.col(c) for c in df.columns]), opts)


def write_sequencefile(
    df: DataFrame,
    path: str,
    field_delim: str = ",",
    enclosed_by: str | None = None,
    escaped_by: str | None = None,
    optionally_enclosed: bool = True,
    null_string: str = "null",
    compression: str | None = None,
) -> None:
    """Distributed ``--as-sequencefile`` layout: one
    ``SequenceFile<LongWritable, Text>`` per partition under ``path``
    (part-NNNNN.seq + _SUCCESS), values formatted with the text sink's
    DelimiterSet/FieldFormatter options."""
    if compression not in (None, "none", "deflate"):
        raise EngineError(
            f"sequencefile: unsupported codec {compression!r} "
            "(record-compressed deflate/DefaultCodec or uncompressed)"
        )
    codec = DEFLATE_CODEC if compression == "deflate" else None
    lines = df.select(
        _line_column(
            df, field_delim, enclosed_by, escaped_by, optionally_enclosed,
            null_string,
        ).alias("line")
    )
    os.makedirs(path, exist_ok=True)
    # overwrite semantics: a re-export with fewer partitions must not
    # leave stale part files behind (same contract as the Avro container).
    for name in os.listdir(path):
        if name.endswith(".seq") or name == "_SUCCESS":
            os.unlink(os.path.join(path, name))
    tag = os.path.basename(os.path.normpath(path))

    def run(rows):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        pairs = (((pid << 33) + i, row["line"]) for i, row in enumerate(rows))
        _write_seqfile(
            os.path.join(path, f"part-{pid:05d}.seq"),
            pairs,
            _sync_for(tag, pid),
            codec,
        )

    lines.foreachPartition(run)
    with open(os.path.join(path, "_SUCCESS"), "w"):
        pass


def read_seqfile(path: str) -> list[tuple[int, str]]:
    """Read one SequenceFile written by :func:`_write_seqfile` (or any
    uncompressed / record-deflate ``<LongWritable, Text>`` file)."""
    with open(path, "rb") as f:
        buf = io.BufferedReader(f)
        if buf.read(4) != MAGIC:
            raise EngineError(f"{path}: not a version-6 SequenceFile")
        key_cls = buf.read(_read_vlong(buf)).decode()
        val_cls = buf.read(_read_vlong(buf)).decode()
        if key_cls != KEY_CLASS or val_cls != VALUE_CLASS:
            raise EngineError(
                f"{path}: unsupported classes {key_cls}/{val_cls} "
                f"(reader handles {KEY_CLASS}/{VALUE_CLASS})"
            )
        compressed = struct.unpack(">?", buf.read(1))[0]
        block = struct.unpack(">?", buf.read(1))[0]
        if block:
            raise EngineError(f"{path}: block-compressed files unsupported")
        if compressed:
            codec = buf.read(_read_vlong(buf)).decode()
            if codec != DEFLATE_CODEC:
                raise EngineError(f"{path}: unsupported codec {codec}")
        n_meta = struct.unpack(">i", buf.read(4))[0]
        for _ in range(n_meta):
            buf.read(_read_vlong(buf))
            buf.read(_read_vlong(buf))
        sync = buf.read(SYNC_SIZE)
        out: list[tuple[int, str]] = []
        while True:
            head = buf.read(4)
            if len(head) < 4:
                break
            rec_len = struct.unpack(">i", head)[0]
            if rec_len == -1:  # sync escape
                marker = buf.read(SYNC_SIZE)
                if marker != sync:
                    raise EngineError(f"{path}: corrupt sync marker")
                continue
            key_len = struct.unpack(">i", buf.read(4))[0]
            key = struct.unpack(">q", buf.read(key_len))[0]
            vraw = buf.read(rec_len - key_len)
            if compressed:
                vraw = zlib.decompress(vraw)
            vbuf = io.BufferedReader(io.BytesIO(vraw))
            text = vbuf.read(_read_vlong(vbuf)).decode("utf-8")
            out.append((key, text))
        return out


def read_sequencefile(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    field_delim: str = ",",
    enclosed_by: str | None = None,
    escaped_by: str | None = None,
    null_string: str = "null",
) -> DataFrame:
    """Parse a SequenceFile dataset back to rows — the export direction's
    file scan for the sequencefile layout. The Text lines are read by the
    JVM (``sc.sequenceFile`` — also the compatibility proof for the
    writer's bytes) and parsed with ``from_csv`` under the same options
    the writer used; round-trip is the identity (tested)."""
    rdd = spark.sparkContext.sequenceFile(path).values()
    lines = spark.createDataFrame(rdd.map(lambda v: (v,)), "line string")
    opts = {"sep": field_delim, "nullValue": null_string, "emptyValue": ""}
    if enclosed_by is not None:
        opts["quote"] = enclosed_by
    else:
        opts["quote"] = "\u0000"
    if escaped_by is not None:
        opts["escape"] = escaped_by
    ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema)
    parsed = lines.select(F.from_csv(F.col("line"), ddl, opts).alias("r"))
    return parsed.select("r.*")
