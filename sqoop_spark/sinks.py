"""File sinks/sources with Sqoop's serialization semantics.

Covers the reference's import FileLayouts (SqoopOptions.java:86-92) that
retain meaning on Spark:

- delimited text  — ``SqoopRecord.toString(DelimiterSet)`` semantics
  (lib/DelimiterSet.java:66-71 defaults: fields ``,``, lines ``\\n``, no
  enclose/escape; lib/FieldFormatter.java:56-143 enclose/escape rules;
  ``--null-string`` encoding ClassWriter.java:363-380) → Spark CSV writer
  options. Parse-back (lib/RecordParser.java's 6-state machine) → Spark
  CSV reader with the same options.
- parquet         — ``df.write.parquet`` (the lake table's native format).
- avro            — ``df.write.format("avro")`` behind an import-try (the
  spark-avro module is not bundled with pip pyspark).
- sequencefile    — pure-Python ``SequenceFile<LongWritable, Text>``
  container writer/reader (sqoop_spark/sequencefile.py; JVM-readback
  pinned), the ``--as-sequencefile`` layout.

Compression follows CodecMap (io/CodecMap.java:39-120): identifier →
Spark codec name; unknown identifiers raise the reference's wording.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from sqoop_spark.errors import EngineError

#: Sqoop defaults (lib/DelimiterSet.java:66-71).
DEFAULT_FIELD_DELIM = ","
DEFAULT_NULL_STRING = "null"

#: CodecMap identifiers → Spark text codec (io/CodecMap.java:39-120).
#: lzo/lzop need native hadoop libs the same way they do in the reference;
#: they're mapped to the nearest available codec-name here.
CODEC_MAP = {
    "none": None,
    "deflate": "deflate",
    "gzip": "gzip",
    "bzip2": "bzip2",
    "lz4": "lz4",
    "snappy": "snappy",
    "zstd": None,  # text writer: zstd unsupported by Hadoop text codecs here
}


def resolve_codec(identifier: str | None) -> str | None:
    if identifier is None:
        return None
    ident = identifier.lower()
    if ident not in CODEC_MAP:
        raise EngineError(f"Could not find codec: {identifier}")
    return CODEC_MAP[ident]


def write_delimited(
    df: DataFrame,
    path: str,
    field_delim: str = DEFAULT_FIELD_DELIM,
    enclosed_by: str | None = None,
    escaped_by: str | None = None,
    optionally_enclosed: bool = True,
    null_string: str = DEFAULT_NULL_STRING,
    compression: str | None = None,
) -> None:
    """Write delimited text with Sqoop's field-formatting semantics.

    ``enclosed_by`` + ``optionally_enclosed=False`` is ``--enclosed-by``
    (always quote); ``optionally_enclosed=True`` is
    ``--optionally-enclosed-by`` (quote only when needed) — mirroring
    FieldFormatter.escapeAndEnclose's mustEnclose flag.
    """
    writer = (
        df.write.mode("overwrite")
        .option("sep", field_delim)
        .option("nullValue", null_string)
        .option("emptyValue", "")
        # Sqoop's FieldFormatter never trims (no trim path in
        # lib/FieldFormatter.java); Spark's CSV writer trims trailing
        # whitespace unless told otherwise
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
    )
    if enclosed_by is not None:
        writer = writer.option("quote", enclosed_by).option(
            "quoteAll", not optionally_enclosed
        )
    else:
        # CSV writers always have a quote char; an unused one (\0) gives
        # Sqoop's default no-enclose behavior.
        writer = writer.option("quote", "\u0000")
    if escaped_by is not None:
        writer = writer.option("escape", escaped_by)
    codec = resolve_codec(compression)
    if codec:
        writer = writer.option("compression", codec)
    writer.csv(path)


def read_delimited(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    field_delim: str = DEFAULT_FIELD_DELIM,
    enclosed_by: str | None = None,
    escaped_by: str | None = None,
    null_string: str = DEFAULT_NULL_STRING,
) -> DataFrame:
    """Parse delimited text back — RecordParser.java:53-371 equivalence.

    The reference's export path re-parses its own text output via the
    generated ``parse()``; round-tripping ``write_delimited`` output
    through this reader must be the identity (tested).
    """
    reader = (
        spark.read.schema(schema)
        .option("sep", field_delim)
        .option("nullValue", null_string)
        .option("emptyValue", "")
    )
    if enclosed_by is not None:
        reader = reader.option("quote", enclosed_by)
    else:
        reader = reader.option("quote", "\u0000")
    if escaped_by is not None:
        reader = reader.option("escape", escaped_by)
    return reader.csv(path)


def export_foreach(
    df: DataFrame,
    processor,
    records_per_call: int = 100,
) -> None:
    """Per-partition push export — the stored-proc / FieldMapProcessor
    extension point (mapreduce/JdbcCallExportJob.java `--call`;
    lib/FieldMapProcessor.java used by hbase/HBasePutProcessor.java:1-205).

    ``processor(rows: list[Row]) -> None`` is invoked on executors with
    micro-batches of ``records_per_call`` rows (the analog of
    ``sqoop.export.records.per.statement`` batching,
    mapreduce/AsyncSqlOutputFormat.java:58-85) — e.g. an executemany, an
    HTTP bulk call, a KV put batch. The callable must be picklable.
    """
    n = max(1, records_per_call)

    def handle(it):
        buf = []
        for row in it:
            buf.append(row)
            if len(buf) >= n:
                processor(buf)
                buf = []
        if buf:
            processor(buf)

    df.foreachPartition(handle)


def write_avro(df: DataFrame, path: str, compression: str | None = None) -> None:
    """Avro sink (mapreduce/AvroImportMapper.java + AvroOutputFormat).

    Prefers the spark-avro JVM writer when the jar is on the classpath;
    otherwise falls back to the built-in pure-Python Object Container File
    writer (sqoop_spark.avro_container — same AvroUtil.toAvro value
    semantics, one part file per partition), so ``--as-avrodatafile``
    works out of the box on a pip-installed pyspark."""
    try:
        writer = df.write.mode("overwrite").format("avro")
        if compression:
            writer = writer.option("compression", compression)
        writer.save(path)
        return
    except Exception as exc:  # pragma: no cover - depends on spark-avro jar
        # Fall back ONLY when the JVM says the avro data source is absent
        # (pip-installed pyspark without the spark-avro jar). Any other
        # failure — bad path, schema, permissions, a genuine write error —
        # must surface, not be silently retried with a different writer.
        msg = str(exc)
        if not (
            "DATA_SOURCE_NOT_FOUND" in msg
            or ("Failed to find" in msg and "avro" in msg.lower())
        ):
            raise
    from sqoop_spark.avro_container import write_avro_container

    codec = {None: "null", "deflate": "deflate", "uncompressed": "null"}.get(
        compression, None
    )
    if codec is None:
        raise EngineError(
            f"avro container codec {compression!r} unsupported without the "
            "spark-avro jar (built-in writer: null/deflate)"
        )
    write_avro_container(df, path, codec=codec)
