"""Incremental watermark predicates — Sqoop `--incremental` semantics.

Reproduces ``ImportTool.initIncrementalConstraints``
(reference: tool/ImportTool.java:299-443) declaratively:

- **append** mode: ``check_col > last_value AND check_col <= MAX(check_col)``
  (:383-385, :399-401); char/varchar check columns rejected (:316-333);
  if MAX is NULL (empty source) the predicate becomes ``check_col IS NULL``
  (:409-412).
- **lastmodified** mode: ``check_col >= last_value AND check_col < upper``
  (:386-387, :402-404). The reference's upper bound is the database server's
  CURRENT_TIMESTAMP (manager/SqlManager.java:978); this engine pins the
  deterministic analog ``MAX(event_ts) + 1 microsecond`` so a replay of the
  same tail is reproducible (SURVEY.md §1.4). The inclusive lower bound
  re-reads boundary rows; idempotent merge dedups them (mirrors
  TestIncrementalImport.testTimestampBoundary, :1234-1271).
- equal bounds ⇒ "No new rows detected" skip (:375-379).

The predicates are plain Catalyst filters, so they push down to the parquet/
lake scan (the Spark analog of Sqoop splicing the clause into per-split SQL,
mapreduce/db/DataDrivenDBRecordReader.java:78-131).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass
from enum import Enum
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqoop_spark.errors import InvalidCheckColumnError


class IncrementalMode(Enum):
    APPEND = "append"
    LASTMODIFIED = "lastmodified"


#: Types legal for an APPEND check column. Mirrors Sqoop's rejection of
#: character columns (ImportTool.java:316-333; test :993).
_APPEND_OK = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
)


@dataclass
class IncrementalSlice:
    df: DataFrame  # the bounded change slice
    lower: Any  # previous watermark (exclusive for append, inclusive for lastmodified)
    upper: Any  # new watermark after this slice
    empty: bool  # "No new rows detected"


def _check_column_type(df: DataFrame, check_column: str, mode: IncrementalMode):
    try:
        field = df.schema[check_column]
    except KeyError:
        raise InvalidCheckColumnError(f"check column not found: {check_column}") from None
    if mode is IncrementalMode.APPEND and not isinstance(field.dataType, _APPEND_OK):
        raise InvalidCheckColumnError(
            f"Character column ({check_column}) can not be used to determine "
            "which rows to incrementally import."
        )
    if mode is IncrementalMode.LASTMODIFIED and not isinstance(
        field.dataType, (T.TimestampType, T.TimestampNTZType, T.DateType)
    ):
        raise InvalidCheckColumnError(
            f"--incremental lastmodified requires a date/timestamp check "
            f"column, got {field.dataType.simpleString()} for {check_column}"
        )
    return field.dataType


def typed_lit(value: Any, dtype: T.DataType) -> F.Column:
    """A literal that compares exactly against a column of ``dtype``.

    PySpark converts a naive ``datetime`` literal to TIMESTAMP using the
    JVM *system* timezone, while TIMESTAMP→TIMESTAMP_NTZ casts render in
    the *session* timezone — when the two differ (driver environments
    vary), a watermark bound silently shifts by the offset. Routing
    datetimes through an ISO string → NTZ/TIMESTAMP cast keeps the wall
    time byte-exact with no timezone involved.
    """
    if isinstance(dtype, (T.TimestampNTZType, T.TimestampType)) and isinstance(
        value, dt.datetime
    ):
        return F.lit(value.isoformat(sep=" ")).cast(dtype)
    if isinstance(dtype, T.DateType) and isinstance(value, dt.date):
        return F.lit(value.isoformat()).cast(dtype)
    return F.lit(value).cast(dtype)


def incremental_slice(
    df: DataFrame,
    mode: IncrementalMode,
    check_column: str,
    last_value: Any = None,
    precomputed_max: Any = ...,
) -> IncrementalSlice:
    """Bound the change tail by the watermark; return slice + new watermark.

    ``precomputed_max`` lets callers that already probed MAX(check_column)
    (e.g. in a combined aggregation with batch-id discovery) skip the extra
    pass; pass the probed value (None meaning empty source).
    """
    dtype = _check_column_type(df, check_column, mode)
    c = F.col(check_column)

    def lit(v):
        # Literals MUST carry the check column's exact type with no
        # timezone round-trip — see typed_lit.
        return typed_lit(v, dtype)

    # Watermark probe — the MAX(check_col) scalar query the reference pushes
    # to the database (ImportTool.java:214-282). One map-side-combined agg.
    if precomputed_max is ...:
        upper = df.agg(F.max(c).alias("m")).collect()[0]["m"]
    else:
        upper = precomputed_max

    if upper is None:
        # Empty source: reference emits `check_col IS NULL` (:409-412).
        sliced = df.filter(c.isNull())
        return IncrementalSlice(df=sliced, lower=last_value, upper=last_value, empty=True)

    if mode is IncrementalMode.APPEND:
        pred = c <= lit(upper)
        if last_value is not None:
            if last_value >= upper:
                return IncrementalSlice(
                    df=df.limit(0), lower=last_value, upper=last_value, empty=True
                )
            pred = pred & (c > lit(last_value))
        return IncrementalSlice(df=df.filter(pred), lower=last_value, upper=upper, empty=False)

    # LASTMODIFIED: closed-open [last_value, max + 1µs).
    bound = upper + dt.timedelta(microseconds=1)
    if last_value is not None and last_value >= bound:
        return IncrementalSlice(
            df=df.limit(0), lower=last_value, upper=last_value, empty=True
        )
    pred = c < lit(bound)
    if last_value is not None:
        pred = pred & (c >= lit(last_value))
    return IncrementalSlice(df=df.filter(pred), lower=last_value, upper=bound, empty=False)
