"""AvroUtil conversion semantics (avro/AvroUtil.java:83-204) as column
expressions: epoch-millis temporals, decimal padding/plain strings,
identifier cleaning, and the documented round-trip."""

import datetime as dt
from decimal import Decimal

from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqoop_spark.avro import (
    avro_record_frame,
    from_avro_frame,
    to_avro_identifier,
)


def test_to_avro_identifier_parity():
    """AvroUtil.toAvroIdentifier:165-186: non-alnum runs collapse to one
    '_', non-letter initials get the AVRO_ prefix."""
    assert to_avro_identifier("order id") == "order_id"
    assert to_avro_identifier("a--b__c") == "a_b__c"
    assert to_avro_identifier("total$%amount") == "total_amount"
    assert to_avro_identifier("_leading") == "_leading"
    assert to_avro_identifier("9col") == "AVRO_9col"
    assert to_avro_identifier("clean") == "clean"


def test_avro_temporal_to_epoch_millis(spark):
    """Date/Time/Timestamp → getTime() epoch millis (AvroUtil:128-133);
    micros truncate to millis — the reference's documented loss."""
    ts = dt.datetime(2024, 3, 1, 12, 30, 45, 123456)
    d = dt.date(2024, 3, 1)
    df = spark.createDataFrame([(ts, d)], "ts timestamp, d date")
    row = avro_record_frame(df).collect()[0]
    assert row["ts"] == int(ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
    assert row["ts"] % 1000 == 123  # millis kept, micros dropped
    midnight = dt.datetime(2024, 3, 1, tzinfo=dt.timezone.utc)
    assert row["d"] == int(midnight.timestamp() * 1000)


def test_avro_decimal_padding_and_plain_string(spark):
    """BigDecimal → toPlainString; padding pads to the declared scale
    (AvroUtil.padBigDecimal:83-92, sqoop.avro.decimal_padding.enable)."""
    schema = T.StructType([T.StructField("v", T.DecimalType(12, 3))])
    df = spark.createDataFrame([(Decimal("12.5"),), (Decimal("0.001"),)], schema)
    got = [r["v"] for r in avro_record_frame(df, decimal_padding=True).collect()]
    assert got == ["12.500", "0.001"]  # padded to scale 3, no exponent
    # schema: converted frame carries string/long types, cleaned names
    df2 = spark.createDataFrame(
        [(1, Decimal("1.0"))],
        T.StructType(
            [T.StructField("order id", T.LongType()), T.StructField("v", T.DecimalType(4, 2))]
        ),
    )
    out = avro_record_frame(df2)
    assert out.columns == ["order_id", "v"]
    assert dict(out.dtypes)["v"] == "string"


def test_avro_roundtrip(spark, scratch):
    """to-Avro → (container) → from-Avro is the identity up to millis
    truncation — the reference's import-then-export contract. The parquet
    container stands in for the gated spark-avro jar; the conversions are
    identical either way."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("amount", T.DecimalType(10, 2)),
            T.StructField("name", T.StringType()),
        ]
    )
    rows = [
        (1, dt.datetime(2024, 1, 1, 8, 0, 0, 111000), Decimal("10.50"), "a"),
        (2, dt.datetime(2024, 6, 15, 23, 59, 59, 999000), Decimal("-3.07"), None),
    ]
    df = spark.createDataFrame(rows, schema)
    path = f"{scratch}/avro_rt"
    avro_record_frame(df, decimal_padding=True).write.parquet(path)
    back = from_avro_frame(spark.read.parquet(path), schema)
    got = sorted(back.collect(), key=lambda r: r["id"])
    assert [tuple(r) for r in got] == rows  # millis-precision inputs round-trip
