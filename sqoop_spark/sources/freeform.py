"""Free-form query source — Sqoop ``--query 'SELECT ... WHERE $CONDITIONS'``.

Reference semantics (mapreduce/db/DataDrivenDBInputFormat.java:64,287-297;
mapreduce/DataDrivenImportJob.java:195-223; manager/SqlManager.java:731-747):

- the user query MUST contain the literal ``$CONDITIONS`` token; with more
  than one mapper a ``--split-by`` column is also required
  (``testFailNoConditions``, TestQuery.java:184);
- the bounding values come from
  ``SELECT MIN(split_col), MAX(split_col) FROM (query with $CONDITIONS→1=1)``
  or a user-supplied ``--boundary-query``;
- each split substitutes its own ``lo <= c < hi`` clause for ``$CONDITIONS``
  (last split closed), so the union of splits is exactly the query result;
- single-mapper mode substitutes ``1=1`` and skips the probe
  (DataDrivenDBInputFormat.java:151-158).

Spark realization: the query runs ONCE via ``spark.sql`` — Catalyst's
partition pruning + pushdown already gives per-task bounded scans, so
substituting ``1=1`` is the idiomatic fast path. ``split_assignments``
additionally attaches the reference's exact split id and repartitions on it,
for callers that need Sqoop's placement contract (and for tests proving the
union-of-splits == whole-query invariant at any parallelism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqoop_spark.errors import EngineError
from sqoop_spark.partitioning import (
    assign_range_split,
    date_split_points,
    decimal_split_points,
    float_split_points,
    integer_split_points,
    text_split_points,
)

CONDITIONS_TOKEN = "$CONDITIONS"


def _split_points_for(lo, hi, num_splits: int) -> list:
    """Dispatch on the bounding-value type — the splitter-per-SQL-type
    table of DataDrivenDBInputFormat.getSplitter (reference :129-139)."""
    import datetime as dt
    from decimal import Decimal

    if isinstance(lo, bool):
        raise EngineError("use BooleanSplitter predicates for boolean split-by")
    if isinstance(lo, int):
        return integer_split_points(int(lo), int(hi), num_splits)
    if isinstance(lo, dt.datetime):
        return date_split_points(lo, hi, num_splits)
    if isinstance(lo, dt.date):
        lo_dt = dt.datetime(lo.year, lo.month, lo.day)
        hi_dt = dt.datetime(hi.year, hi.month, hi.day)
        return [p.date() for p in date_split_points(lo_dt, hi_dt, num_splits)]
    if isinstance(lo, Decimal):
        return decimal_split_points(lo, hi, num_splits)
    if isinstance(lo, float):
        return float_split_points(lo, hi, num_splits)
    if isinstance(lo, str):
        return text_split_points(lo, hi, num_splits)
    raise EngineError(f"unsupported split-by value type: {type(lo).__name__}")


def _substitute(query: str, clause: str) -> str:
    return query.replace(CONDITIONS_TOKEN, f"({clause})")


def bounding_values(
    spark: SparkSession, query: str, split_by: str, boundary_query: str | None = None
) -> tuple:
    """MIN/MAX probe: ``SELECT MIN(c), MAX(c) FROM (q) t1`` or the user's
    ``--boundary-query`` (SqlManager.java:731-747)."""
    if boundary_query is not None:
        row = spark.sql(boundary_query).collect()[0]
        return row[0], row[1]
    probe = (
        f"SELECT MIN({split_by}) AS lo, MAX({split_by}) AS hi "
        f"FROM ({_substitute(query, '1 = 1')}) t1"
    )
    row = spark.sql(probe).collect()[0]
    return row["lo"], row["hi"]


def freeform_query(
    spark: SparkSession,
    query: str,
    split_by: str | None = None,
    num_mappers: int = 1,
    boundary_query: str | None = None,
    split_column_out: str | None = None,
    autoreset_to_one_mapper: bool = False,
) -> DataFrame:
    """Run a ``$CONDITIONS`` free-form query, optionally split ``-m N`` ways.

    Validation mirrors the reference: a missing ``$CONDITIONS`` token is an
    error (ImportTool.validateOptions — "must contain '$CONDITIONS'"); more
    than one mapper without ``--split-by`` is an error
    (SqlManager.importQuery guard).

    With ``num_mappers > 1`` the split ids use the reference's exact integer
    interval math and the result is repartitioned so split i is one
    partition — placement parity with Sqoop's per-split SELECTs, while the
    row set is identical to the unsplit query by construction.
    """
    if CONDITIONS_TOKEN not in query:
        raise EngineError(
            "Query must contain '$CONDITIONS' in WHERE clause."
        )
    if num_mappers > 1 and split_by is None:
        if autoreset_to_one_mapper:
            # SqlManager.java:637-649: no split key + --autoreset-to-one-mapper
            # downgrades to a single mapper instead of failing.
            num_mappers = 1
        else:
            raise EngineError(
                "When importing query results in parallel, you must specify --split-by."
            )

    if num_mappers <= 1:
        return spark.sql(_substitute(query, "1 = 1"))

    lo, hi = bounding_values(spark, query, split_by, boundary_query)
    df = spark.sql(_substitute(query, "1 = 1"))
    if lo is None:
        # empty source: the reference emits a single IS NULL split
        return df.filter(F.col(split_by).isNull())
    pts = _split_points_for(lo, hi, num_mappers)
    out = assign_range_split(df, split_by, pts, out_col="_split_id")
    out = out.repartitionByRange(len(pts) - 1, F.col("_split_id"))
    if split_column_out:
        return out.withColumnRenamed("_split_id", split_column_out)
    return out.drop("_split_id")
