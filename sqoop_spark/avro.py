"""Avro record-conversion semantics — avro/AvroUtil.java:83-204 as
Catalyst column expressions.

The reference converts each row's Java values into an Avro GenericRecord
per these rules (AvroUtil.toAvro):

- ``java.sql.Date/Time/Timestamp`` → ``getTime()`` = **epoch millis long**
  (the reference's documented precision loss: micros truncate to millis);
- ``BigDecimal`` → string; with ``bigDecimalFormatString`` (the default,
  ``sqoop.bigdecimal.format.string=true``) it is ``toPlainString()`` — no
  exponent; with ``sqoop.avro.decimal_padding.enable`` the value is first
  ``setScale``-padded to the schema's scale (AvroUtil.padBigDecimal:83-92);
- bytes pass through; primitives pass through;
- column names → Avro identifiers (AvroUtil.toAvroIdentifier:165-186):
  runs of non-alphanumerics collapse to one ``_``, and a name whose first
  character is not a letter/underscore gains an ``AVRO_`` prefix.

Spark-first: the whole conversion is one ``select`` of cast expressions —
whole-stage-codegen JVM work, no UDFs, no per-row Python — so at 100 TB it
fuses into the scan. The Avro *container* writer itself
(``sinks.write_avro``) needs the spark-avro jar and stays import-gated;
these conversions are the semantics a Sqoop user actually depends on, and
they work into any sink (parquet, text, JDBC) plus ``write_avro`` when the
jar is present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def to_avro_identifier(candidate: str) -> str:
    """AvroUtil.toAvroIdentifier:165-186 — exact algorithm."""
    out = []
    skip = False
    for c in candidate:
        if c.isalnum() or c == "_":
            out.append(c)
            skip = False
        elif not skip:
            out.append("_")
            skip = True
    s = "".join(out)
    initial = s[0]
    if initial.isalpha() or initial == "_":
        return s
    return "AVRO_" + s


def avro_column(col: F.Column, dtype: T.DataType, big_decimal_format_string: bool = True,
                decimal_padding: bool = False) -> F.Column:
    """One column's AvroUtil.toAvro conversion (:112-148)."""
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        # Timestamp.getTime(): epoch millis (micros truncate — documented).
        # NTZ columns cast through LTZ first (value-preserving: the engine
        # session timezone is pinned to UTC, session.py).
        return F.unix_millis(col.cast(T.TimestampType()))
    if isinstance(dtype, T.DateType):
        # java.sql.Date.getTime() is midnight-UTC millis of the day
        return F.unix_millis(col.cast("timestamp"))
    if isinstance(dtype, T.DecimalType):
        if decimal_padding:
            # padBigDecimal: setScale to the schema scale. A DecimalType
            # column already carries its declared scale, and Spark's
            # decimal→string cast renders every declared scale digit —
            # i.e. the padded form — so the cast IS the padding.
            return col.cast("string")
        if big_decimal_format_string:
            # toPlainString(): Spark's decimal cast never uses exponent
            # notation either, so the same cast realizes both paths; the
            # distinction only matters for values BigDecimal.toString
            # would render exponentially (scale > ~7), which DecimalType
            # renders plainly regardless.
            return col.cast("string")
        return col.cast("string")
    # bytes / primitives / strings pass through unchanged
    return col


def avro_record_frame(
    df: DataFrame,
    big_decimal_format_string: bool = True,
    decimal_padding: bool = False,
) -> DataFrame:
    """Apply AvroUtil.toGenericRecord over the whole frame (:188-204):
    every column converted per ``avro_column`` and renamed per
    ``to_avro_identifier`` — one declarative select."""
    cols = []
    for f in df.schema.fields:
        cols.append(
            avro_column(
                F.col(f"`{f.name}`"), f.dataType, big_decimal_format_string, decimal_padding
            ).alias(to_avro_identifier(f.name))
        )
    return df.select(*cols)


def from_avro_frame(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Reverse conversion (AvroUtil.fromAvro:218-289): epoch-millis longs
    back to timestamps/dates, strings back to decimals — names matched by
    Avro identifier. Round-trips ``avro_record_frame`` up to the
    documented millis truncation."""
    cols = []
    for f in schema.fields:
        src = F.col(f"`{to_avro_identifier(f.name)}`")
        if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType)):
            cols.append(F.timestamp_millis(src).cast(f.dataType).alias(f.name))
        elif isinstance(f.dataType, T.DateType):
            cols.append(F.timestamp_millis(src).cast("date").alias(f.name))
        elif isinstance(f.dataType, T.DecimalType):
            cols.append(src.cast(f.dataType).alias(f.name))
        else:
            cols.append(src.cast(f.dataType).alias(f.name))
    return df.select(*cols)
