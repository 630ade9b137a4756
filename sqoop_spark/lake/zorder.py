"""Z-order (Morton) clustering value for multi-column sort-order rewrites.

``rewrite_clustered(column=[a, b])`` sorts each bucket by the interleaved
bits of the columns' normalized 16-bit bins, so consecutive rows — and
therefore the sequential files the writer splits them into — are close in
EVERY listed dimension at once. Each file's manifest zone maps then cover
a narrow range of *all* the columns, and :meth:`LakeTable.scan` prunes on
any of them (Delta OSS ``OPTIMIZE ZORDER BY``; Iceberg's multi-arg sort
order serves the same read pattern).

Quality vs correctness: the z-value only decides WHERE rows land; the
zone maps recorded per file are ground truth, so a skewed distribution
degrades pruning *effectiveness*, never pruning *soundness*. Bins are
uniform over the observed ``[min, max]`` (one bounded aggregate probe —
no window, no extra shuffle beyond the rewrite's own); strings map
through an order-preserving 7-byte prefix integer, so only their prefix
locality z-orders (ties sort arbitrarily within a bin — fine for zone
maps).

The whole z-value is ONE SQL-text expression (a single ``F.expr`` —
JVM-side, whole-stage-codegen'd, no per-row Python and no py4j call per
bit), built from literals probed in one job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

Z_BITS = 16
MAX_COLS = 3  # 3 × 16 bits fits a signed long


def value_sql(name: str, dtype: T.DataType) -> str:
    """Order-preserving DOUBLE mapping of a column, as SQL text. Raises
    on types with no usable order embedding."""
    q = f"`{name}`"
    if isinstance(dtype, (T.StringType,)):
        # 7-byte big-endian prefix: monotone in the string's byte order
        # for single-byte code points (clamped at 255 otherwise).
        terms = [
            f"least(coalesce(ascii(substring({q}, {i + 1}, 1)), 0), 255)"
            f" * {256 ** (6 - i)}"
            for i in range(7)
        ]
        return "CAST((" + " + ".join(terms) + ") AS DOUBLE)"
    if isinstance(dtype, T.DateType):
        return f"CAST(CAST({q} AS TIMESTAMP) AS DOUBLE)"
    if isinstance(
        dtype,
        (
            T.ByteType,
            T.ShortType,
            T.IntegerType,
            T.LongType,
            T.FloatType,
            T.DoubleType,
            T.DecimalType,
            T.TimestampType,
        ),
    ):
        return f"CAST({q} AS DOUBLE)"
    raise ValueError(
        f"zorder: column {name!r} has type {dtype.simpleString()} with no "
        "order-preserving embedding (supported: numeric, decimal, string, "
        "date, timestamp)"
    )


def zvalue_column(df: DataFrame, cols: list[str], schema: T.StructType):
    """The Morton-interleaved sort Column for ``cols`` over ``df``.

    One aggregate probe collects every column's value-range (a single
    1-row collect); the returned Column is pure SQL text over literals.
    NULLs bin to 0 (lowest z-region — they cluster together, and their
    files' zone maps simply don't constrain that column)."""
    if not 2 <= len(cols) <= MAX_COLS:
        raise ValueError(
            f"zorder: need 2..{MAX_COLS} columns, got {len(cols)}"
        )
    vals = {c: value_sql(c, schema[c].dataType) for c in cols}
    probe = df.select(
        *[
            e
            for c in cols
            for e in (
                F.expr(f"min({vals[c]})").alias(f"mn_{c}"),
                F.expr(f"max({vals[c]})").alias(f"mx_{c}"),
            )
        ]
    ).collect()[0]
    k = len(cols)
    bins = []
    for c in cols:
        mn, mx = probe[f"mn_{c}"], probe[f"mx_{c}"]
        if mn is None or mx is None or mx <= mn:
            bins.append("0")
            continue
        span = float(mx) - float(mn)
        bins.append(
            f"CAST(least({2 ** Z_BITS - 1}.0, greatest(0.0, "
            f"floor((coalesce({vals[c]}, {float(mn)!r}) - {float(mn)!r})"
            f" / {span!r} * {2 ** Z_BITS}.0))) AS BIGINT)"
        )
    terms = [
        f"((( ({bins[j]}) >> {b} ) & 1) << {b * k + j})"
        for b in range(Z_BITS)
        for j in range(k)
    ]
    return F.expr("(" + " | ".join(terms) + ")")
