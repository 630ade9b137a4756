"""Split-by partitioning & skew handling.

Reproduces the semantics of Sqoop's split machinery (reference:
mapreduce/db/DataDrivenDBInputFormat.java:140-254 and the per-type
splitters) as driver-side interval math + explicit Spark repartitioning:

- ``integer_split_points`` — IntegerSplitter.split (:39-186): even intervals
  with the remainder spread over the first splits, closed last interval,
  ``--split-limit`` re-derivation of the split count.
- ``date_split_points`` — DateSplitter (:30-120): integer splits on epoch
  micros.
- ``float_split_points`` — FloatSplitter (:53-94): linear interpolation.
- ``text_split_points`` — TextSplitter (:39-251): strings mapped to
  base-65536 fractions (max 8 chars), common prefix factored out. Kept for
  parity/inventory; the engine's real answer to text keys is hash
  partitioning + salting (lexicographic ranges skew on hot prefixes, which
  the reference itself warns about, :69-72).
- ``boolean_split_predicates`` — BooleanSplitter (:39-60).
- ``assign_range_split`` / ``repartition_by_split`` — the Spark side:
  a split-id column + ``repartition`` on it (the analog of per-split WHERE
  clauses feeding map tasks).
- ``detect_hot_keys`` / ``salted_key`` — hot-repo salting: keys whose
  frequency exceeds a threshold get a salt fan-out so one key's rows spread
  over several shuffle partitions; the salt NEVER reaches merge equality
  (SURVEY §7 hard parts — salt only the shuffle, not the merge condition).

At 10^10 scale the range splitters matter for ordered backfills (initial
snapshot loads); the CDC tail path uses hash buckets (lake/table.py).
"""

from __future__ import annotations

import datetime as dt
import math
from typing import Any, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MIN_INCREMENT = 10000 * dt.timedelta.resolution  # DateSplitter nanos guard


def integer_split_points(
    lo: int, hi: int, num_splits: int, split_limit: int = -1
) -> list[int]:
    """Boundary list [lo, b1, ..., hi] — IntegerSplitter.split semantics.

    Even intervals of floor size with the remainder distributed one to each
    of the first ``remainder`` intervals; a positive ``split_limit`` caps the
    interval width by re-deriving the split count
    (IntegerSplitter.java:39-102).
    """
    if num_splits < 1:
        num_splits = 1
    if lo > hi:
        raise ValueError(f"lo {lo} > hi {hi}")
    span = hi - lo
    split_size = span // num_splits
    if split_limit > 0 and span / num_splits > split_limit:
        # re-derive the split count so no interval exceeds split_limit
        # (IntegerSplitter.java:138-146)
        new_splits = span // split_limit
        return integer_split_points(
            lo, hi, new_splits if new_splits != num_splits else new_splits + 1, split_limit
        )
    remainder = span % num_splits
    points: list[int] = []
    cur = lo
    for i in range(num_splits + 1):
        points.append(cur)
        if cur >= hi:
            break
        cur += split_size
        cur += 1 if i < remainder else 0
    if len(points) == 1 or span <= num_splits:
        # singleton range, or fewer distinct values than splits: close with
        # an extra maxVal boundary (IntegerSplitter.java:160-184)
        points.append(hi)
    return points


def integer_split_predicates(
    col: str, lo: int, hi: int, num_splits: int, split_limit: int = -1
) -> list[str]:
    """Per-split WHERE clauses: ``c >= b_i AND c < b_{i+1}``, last closed
    (DataDrivenDBInputFormat.java:140-254 contract)."""
    pts = integer_split_points(lo, hi, num_splits, split_limit)
    preds = []
    for i in range(len(pts) - 1):
        if i == len(pts) - 2:
            preds.append(f"{col} >= {pts[i]} AND {col} <= {pts[i + 1]}")
        else:
            preds.append(f"{col} >= {pts[i]} AND {col} < {pts[i + 1]}")
    return preds


def date_split_points(
    lo: dt.datetime, hi: dt.datetime, num_splits: int, split_limit: int = -1
) -> list[dt.datetime]:
    """DateSplitter: delegate to integer splits on epoch micros (:30-120).

    ``split_limit`` is in SECONDS (DateSplitter.java:84-120: "the splitLimit
    value is in seconds" — converted to the epoch unit before delegating),
    capping each split's time width by re-deriving the split count.
    """
    epoch = dt.datetime(1970, 1, 1, tzinfo=lo.tzinfo)
    lo_us = int((lo - epoch).total_seconds() * 1_000_000)
    hi_us = int((hi - epoch).total_seconds() * 1_000_000)
    limit_us = split_limit * 1_000_000 if split_limit > 0 else -1
    return [
        epoch + dt.timedelta(microseconds=us)
        for us in integer_split_points(lo_us, hi_us, num_splits, limit_us)
    ]


def float_split_points(lo: float, hi: float, num_splits: int) -> list[float]:
    """FloatSplitter: linear interpolation, closed last interval (:53-94)."""
    if num_splits < 1:
        num_splits = 1
    step = (hi - lo) / num_splits
    pts = [lo + i * step for i in range(num_splits)]
    pts.append(hi)
    return pts


def decimal_split_points(lo, hi, num_splits: int) -> list:
    """BigDecimalSplitter: decimal interval interpolation
    (mapreduce/db/BigDecimalSplitter.java:40-155).

    ``tryDivide`` semantics: the step is (hi-lo)/num_splits in exact
    decimal arithmetic; a tiny-step floor (the reference's MIN_INCREMENT,
    10000 × Double.MIN_VALUE — here a practical 1e-9) keeps degenerate
    ranges progressing; the last boundary is pinned to hi (closed
    interval, matching IntegerSplitter's closed last split).
    """
    from decimal import Decimal

    lo, hi = Decimal(lo), Decimal(hi)
    if num_splits < 1:
        num_splits = 1
    if lo == hi:
        # zero-width range still yields one closed split [lo, hi], matching
        # IntegerSplitter's duplicate-hi closing branch
        return [lo, hi]
    span = hi - lo
    step = span / Decimal(num_splits)
    min_increment = Decimal("0.000000001")
    if step < min_increment:
        step = min_increment
    pts = []
    cur = lo
    # strictly < num_splits: with the min-increment floor engaged the loop
    # could otherwise emit num_splits+1 lows before the hi append
    while cur < hi and len(pts) < num_splits:
        pts.append(cur)
        cur += step
    pts.append(hi)
    return pts


def _sql_literal(v: Any) -> str:
    """Render a split boundary as a SQL literal the way the reference's
    ConnManager quotes per type (ConnManager.datetimeToQueryString:782-795
    for temporals; strings escaped '' per ANSI)."""
    import decimal

    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float, decimal.Decimal)):
        return str(v)
    if isinstance(v, dt.datetime):
        return f"'{v.isoformat(sep=' ')}'"
    if isinstance(v, dt.date):
        return f"'{v.isoformat()}'"
    return "'" + str(v).replace("'", "''") + "'"


def _points_to_predicates(col: str, pts: Sequence[Any]) -> list[str]:
    """Boundary points → per-split WHERE clauses, last interval closed
    (the DataDrivenDBInputFormat.getSplits contract)."""
    preds = []
    for i in range(len(pts) - 1):
        lo, hi = _sql_literal(pts[i]), _sql_literal(pts[i + 1])
        op = "<=" if i == len(pts) - 2 else "<"
        preds.append(f"{col} >= {lo} AND {col} {op} {hi}")
    return preds


def split_predicates_for_bounds(
    col: str, lo: Any, hi: Any, num_splits: int, split_limit: int = -1
) -> list[str]:
    """Typed splitter dispatch — DataDrivenDBInputFormat.getSplitter
    (:161-200): pick the per-type splitter from the bound values' type and
    render the per-split WHERE clauses. Integer bounds take the exact
    IntegerSplitter math (with --split-limit); temporals the DateSplitter
    epoch-micros delegation (split_limit in seconds); Decimal/float/text
    their interpolating splitters; boolean the 3-way fan-out."""
    import decimal

    if isinstance(lo, bool) or isinstance(hi, bool):
        return boolean_split_predicates(col, with_null=False)
    if isinstance(lo, int) and isinstance(hi, int):
        return integer_split_predicates(col, lo, hi, num_splits, split_limit)
    if isinstance(lo, dt.datetime) and isinstance(hi, dt.datetime):
        pts = date_split_points(lo, hi, num_splits, split_limit)
    elif isinstance(lo, dt.date) and isinstance(hi, dt.date):
        lo_dt = dt.datetime(lo.year, lo.month, lo.day)
        hi_dt = dt.datetime(hi.year, hi.month, hi.day)
        pts = [p.date() for p in date_split_points(lo_dt, hi_dt, num_splits, split_limit)]
    elif isinstance(lo, decimal.Decimal) or isinstance(hi, decimal.Decimal):
        pts = decimal_split_points(lo, hi, num_splits)
    elif isinstance(lo, float) or isinstance(hi, float):
        pts = float_split_points(float(lo), float(hi), num_splits)
    elif isinstance(lo, str) and isinstance(hi, str):
        pts = text_split_points(lo, hi, num_splits)
    else:
        raise ValueError(
            f"no splitter for --split-by bounds of type "
            f"{type(lo).__name__}/{type(hi).__name__}; supported: int, "
            "float, Decimal, str, date, datetime, bool"
        )
    # interpolating splitters can emit duplicate consecutive boundaries on
    # degenerate ranges — collapse them so no split is empty-by-construction
    dedup = [pts[0]]
    for p in pts[1:]:
        if p != dedup[-1]:
            dedup.append(p)
    if len(dedup) == 1:
        dedup.append(hi)
    return _points_to_predicates(col, dedup)


def boolean_split_predicates(col: str, with_null: bool = True) -> list[str]:
    """BooleanSplitter: ≤3 splits — FALSE, TRUE, IS NULL (:39-60)."""
    preds = [f"{col} = FALSE", f"{col} = TRUE"]
    if with_null:
        preds.append(f"{col} IS NULL")
    return preds


# -- text splitter (base-65536 fraction interpolation) -----------------------

_MAX_CHARS = 8  # TextSplitter considers at most 8 chars (:39-64)


def _string_to_fraction(s: str) -> float:
    f = 0.0
    scale = 1.0
    for ch in s[:_MAX_CHARS]:
        scale /= 65536.0
        f += ord(ch) * scale
    return f


def _fraction_to_string(f: float, max_chars: int = _MAX_CHARS) -> str:
    out = []
    for _ in range(max_chars):
        f *= 65536.0
        code = int(f)
        if code == 0 and f < 1e-12:
            break
        out.append(chr(min(code, 65535)))
        f -= code
    return "".join(out)


def text_split_points(lo: str, hi: str, num_splits: int) -> list[str]:
    """TextSplitter: common prefix factored, base-65536 interpolation
    (:39-251). Produces num_splits+1 boundary strings from lo to hi."""
    prefix_len = 0
    for a, b in zip(lo, hi):
        if a != b:
            break
        prefix_len += 1
    prefix = lo[:prefix_len]
    lo_f = _string_to_fraction(lo[prefix_len:])
    hi_f = _string_to_fraction(hi[prefix_len:])
    pts = float_split_points(lo_f, hi_f, num_splits)
    out = [prefix + _fraction_to_string(p) for p in pts]
    out[0], out[-1] = lo, hi
    return out


# -- Spark-side application ----------------------------------------------------


def assign_range_split(
    df: DataFrame, col: str, boundaries: Sequence[Any], out_col: str = "split_id"
) -> DataFrame:
    """Attach the split id implied by ``boundaries`` (driver-computed).

    Pure Catalyst CASE expression — pushes into codegen; no UDF.
    """
    c = F.col(col)
    expr = F.lit(len(boundaries) - 2)  # last (closed) interval
    for i in range(len(boundaries) - 2, 0, -1):
        expr = F.when(c < F.lit(boundaries[i]), F.lit(i - 1)).otherwise(expr)
    return df.withColumn(out_col, expr.cast("int"))


def repartition_by_split(
    df: DataFrame, col: str, num_splits: int, split_limit: int = -1
) -> DataFrame:
    """MIN/MAX probe + interval split + repartition — the full `-m N` analog.

    One bounding-values aggregation (the reference's
    ``SELECT MIN(c), MAX(c)`` probe, DataDrivenDBInputFormat.java:234-254),
    then an exact-interval repartition. For most workloads prefer
    ``df.repartitionByRange`` (sampling-based, no extra pass); this exists
    where reproducing Sqoop's exact interval math matters.
    """
    row = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).collect()[0]
    if row["lo"] is None:
        return df.withColumn("split_id", F.lit(0))
    pts = integer_split_points(int(row["lo"]), int(row["hi"]), num_splits, split_limit)
    out = assign_range_split(df, col, pts)
    # range-partition on split_id: split i → task i, exactly one split per
    # task (hash partitioning would collide small split-id domains)
    return out.repartitionByRange(len(pts) - 1, F.col("split_id"))


# -- hot-key salting --------------------------------------------------------------


def detect_hot_keys(
    df: DataFrame,
    key_cols: Sequence[str],
    rows_per_partition: int,
) -> DataFrame:
    """Keys whose row count exceeds ``rows_per_partition``.

    Returns (key_cols..., n_rows, n_salts) where n_salts =
    ceil(n_rows / rows_per_partition). One map-side-combined groupBy count.
    """
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > rows_per_partition)
        .withColumn(
            "n_salts", F.ceil(F.col("n_rows") / F.lit(rows_per_partition)).cast("int")
        )
    )


def salted_key(order_col: str, n_salts: int | F.Column) -> F.Column:
    """Deterministic salt in [0, n_salts) derived from the event order column.

    Deriving from ``order_col`` (not rand()) keeps the plan replayable —
    the same event always lands in the same salted partition.
    """
    return F.pmod(F.xxhash64(F.col(order_col)), F.lit(n_salts) if isinstance(n_salts, int) else n_salts)


def repartition_salted(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    num_partitions: int,
    n_salts: int = 8,
) -> DataFrame:
    """Shuffle rows by (key, salt) so a hot key spreads over ``n_salts``
    partitions. The salt column is dropped after the shuffle: downstream
    per-key operators (window reduce, merge join) still see the true key —
    salt affects placement only."""
    salted = df.withColumn("_salt", salted_key(order_col, n_salts))
    return salted.repartition(num_partitions, *key_cols, F.col("_salt")).drop("_salt")
