"""Corpus-shaping operators: deterministic per-group quotas.

Large-scale training-data pipelines cap how much any one source may
contribute (the Common-Crawl per-domain cap: without it a handful of
boilerplate-heavy domains dominate the corpus). :func:`cap_per_group`
is that operator: keep at most ``n`` rows per group, chosen by an
explicit deterministic priority — never ``limit`` inside a group-by
loop, never a driver-side pass.

Scale shape: one window over ``(group_cols, order_cols)``. Spark ≥3.5
plans a ``WindowGroupLimit(Partial)`` BELOW the exchange (the same
optimization the engine's newest-wins merge rides, pinned in PLANS.md):
every map task forwards at most ``n`` rows per group it sees, so the
shuffle carries O(groups × n × tasks-touching-group) rows instead of
the whole corpus, and a skewed mega-domain cannot straggle the reduce.
At 100 TB the cap is exactly as expensive as the number of SURVIVING
rows, which is the point of the operator.

The priority must be total for determinism: callers pass order columns
whose tuple is unique per group (the driver query orders by
``n_chars DESC, doc_id`` — a stable "prefer longer documents" policy
with a unique tie-break).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sqoop_spark.errors import EngineError


def cap_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column | str],
    n: int,
) -> DataFrame:
    """At most ``n`` rows per ``group_cols`` group, the first ``n`` under
    ``order_cols`` — deterministic when the order is total per group.
    Output drops the internal rank column; row order is unspecified (as
    always in a distributed frame)."""
    if n < 1:
        raise EngineError(f"cap_per_group: n must be >= 1, got {n}")
    if not group_cols:
        raise EngineError("cap_per_group: group_cols must be non-empty")
    # collision-proof internal name: a plain "__rank" would silently
    # clobber-and-drop a caller's same-named column
    rank_col = "__cap_per_group_rank"
    while rank_col in df.columns:
        rank_col += "_"
    w = Window.partitionBy(*group_cols).orderBy(
        *[F.col(c) if isinstance(c, str) else c for c in order_cols]
    )
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= n)
        .drop(rank_col)
    )
