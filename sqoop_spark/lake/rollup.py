"""Incremental materialized-view maintenance from the snapshot changelog.

A rollup is a lake table of aggregates (GROUP BY ``group_cols``) over a
source lake table, kept current by consuming the source's changelog
instead of re-aggregating the source — at 10^10-event scale the source
re-scan is the cost that matters, and the changelog makes maintenance
O(delta):

- ``delta`` mode: the pre/post-image diff (``changes_between(...,
  pre_post=True)``, Iceberg's changelog-view row shape) turns every
  decomposable aggregate into a signed sum — insert/``update_after`` rows
  contribute ``+``, delete/``update_before`` rows contribute ``-``. One
  map-side-combined groupBy over the diff produces per-group deltas; a
  bucket-pruned join against the CURRENT rollup rows of the affected
  groups yields the new totals, and groups whose row count reaches zero
  are deleted. Supports ``count`` and ``sum`` (``avg = sum/count`` is a
  reader-side division). Cost: O(diff + affected rollup buckets) — the
  source is never read.

- ``recompute`` mode: for non-decomposable aggregates (min/max under
  deletes, count distinct, ...). The diff only names the AFFECTED groups
  (pre-images catch a row whose group column itself changed); those
  groups are re-aggregated from the source's current state via a
  broadcast-threshold semi-join and upserted; affected groups absent
  from the recompute are deleted. Cost: O(source scan restricted to
  affected groups) — pushdown/zone maps apply when the group column is
  clustered.

Exactly-once layering mirrors streaming/changelog.py consumers: the
consumer's position (last source version applied) lives in a JobStore;
every apply is a fenced merge on the rollup table with **batch id =
source version**, applied BEFORE the watermark save. A crash between
apply and save re-delivers a version whose fence makes it a no-op
(delta mode applies strictly per-version for this reason — a coalesced
range could extend past the crashed apply and double-count). Bootstrap
(no saved position, or one expired by ``expire_snapshots``) re-aggregates
the source fully and reconciles stale rollup groups with deletes, as one
fenced batch.

The reference has no analog — Sqoop can only re-import and re-aggregate
downstream; this is the "aggregate FROM the lake without re-reading it"
composition its incremental mode gestures at (ImportTool's
``--incremental`` docs) but cannot express.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqoop_spark.errors import EngineError
from sqoop_spark.lake.table import LakeTable

#: Sentinel order column NOT in any schema: selects dataset-precedence
#: apply in merge_apply (the diff row always wins), the same contract as
#: replicate_to_table — rollup batches are absolute new totals.
_PRECEDENCE = "_rollup_dataset_precedence"


@dataclass(frozen=True)
class RollupAgg:
    """One aggregate column: ``out`` = fn(expr) per group.

    ``fn``: ``count`` (expr ignored; COUNT(*) semantics), or ``sum`` of a
    SQL expression over source columns (NULL contributions count as 0 so
    delta arithmetic stays total — document ``sum(coalesce(x, 0))``
    semantics to consumers). Floating-point sums drift under long delta
    chains; prefer integer-typed expressions or periodic re-bootstrap.
    """

    out: str
    fn: str  # 'count' | 'sum'
    expr: str | None = None

    def __post_init__(self):
        if self.fn not in ("count", "sum"):
            raise EngineError(f"RollupAgg fn must be count|sum, got {self.fn!r}")
        if self.fn == "sum" and not self.expr:
            raise EngineError(f"RollupAgg {self.out}: sum needs an expr")


def _agg_exprs(aggs: list[RollupAgg]) -> list:
    out = []
    for a in aggs:
        if a.fn == "count":
            out.append(F.count(F.lit(1)).alias(a.out))
        else:
            out.append(F.sum(F.coalesce(F.expr(a.expr), F.lit(0))).alias(a.out))
    return out


def full_rollup(
    source: LakeTable,
    group_cols: list[str],
    aggs: list[RollupAgg],
    version: int | None = None,
) -> DataFrame:
    """The batch recompute the incremental path replaces: GROUP BY over
    the source's state (current, or a time-travel ``version``). Used for
    bootstrap and as the oracle twin in tests."""
    return source.read(version).groupBy(*group_cols).agg(*_agg_exprs(aggs))


def create_rollup(
    spark: SparkSession,
    path: str,
    source: LakeTable,
    group_cols: list[str],
    aggs: list[RollupAgg],
    num_buckets: int = 8,
) -> LakeTable:
    """Create the rollup lake table keyed on ``group_cols``, its schema
    inferred from a zero-row aggregate plan (count → bigint, sum → the
    expression's sum type). NULL group values are unsupported: rollup
    rows are keyed on the group and lake keys are non-null (the diff
    apply would hit merge's null-key guard)."""
    schema = (
        full_rollup(source, group_cols, aggs).limit(0).schema
    )
    return LakeTable.create(
        spark, path, schema, list(group_cols), num_buckets=num_buckets
    )


def _apply(rollup: LakeTable, batch: DataFrame, version: int):
    """Fence-checked apply: a redelivered source version (crash between
    apply and watermark save) is a no-op, same as CdcEngine.apply_batch."""
    from sqoop_spark.cdc.merge import merge_apply

    if version is not None and rollup.is_fenced(version):
        return None
    return merge_apply(
        rollup,
        batch,
        batch_id=version,
        order_col=_PRECEDENCE,  # dataset precedence: new totals always win
        reduce_batch=False,  # one row per group by construction
    )


def _bootstrap(source: LakeTable, rollup: LakeTable, group_cols, aggs, version: int):
    """Full re-aggregate + reconcile: upsert every live group's totals,
    delete rollup groups the source no longer has (stale after an expiry
    gap), one fenced batch."""
    fresh = full_rollup(source, group_cols, aggs, version=version)
    stale = (
        rollup.read()
        .join(fresh.select(*group_cols), on=list(group_cols), how="left_anti")
        .withColumn("_op", F.lit("delete"))
    )
    batch = fresh.withColumn("_op", F.lit("upsert")).unionByName(stale)
    return _apply(rollup, batch.withColumnRenamed("_op", "op"), version)


def bootstrap_rollup(
    source: LakeTable,
    rollup: LakeTable,
    group_cols: list[str],
    aggs: list[RollupAgg],
    job_store,
    job: str,
    version: int | None = None,
    option_key: str = "rollup.source.version",
) -> int:
    """Explicit (re-)bootstrap, optionally pinned to an old ``version`` —
    useful to seed a consumer at a historical snapshot and let the delta
    passes replay forward from there (tests and backfills). Returns
    batches applied (0 when the source has no commits or the version is
    already fenced)."""
    v = version if version is not None else (source.current_version() or 0)
    applied = 0
    if v >= 1:
        if _bootstrap(source, rollup, group_cols, aggs, v) is not None:
            applied = 1
    job_store.update(job, **{option_key: v})
    return applied


def maintain_rollup(
    source: LakeTable,
    rollup: LakeTable,
    group_cols: list[str],
    aggs: list[RollupAgg],
    job_store,
    job: str,
    mode: str = "delta",
    option_key: str = "rollup.source.version",
    recompute_fn=None,
) -> int:
    """One resumable maintenance pass; returns batches applied.

    ``mode='delta'``: per-version signed-sum maintenance (count/sum only).
    ``mode='recompute'``: affected-group re-aggregation; ``recompute_fn
    (source_state_df_grouped)`` may replace the default ``aggs`` plan with
    arbitrary aggregates — it receives the source state DataFrame
    restricted to affected groups and must return one row per group
    matching the rollup schema.
    """
    if mode not in ("delta", "recompute"):
        raise EngineError(f"maintain_rollup: unknown mode {mode!r}")
    from sqoop_spark.streaming.changelog import iter_changes

    opts = job_store.read(job)["options"]
    current = source.current_version() or 0
    last = opts.get(option_key)
    if (
        last is None
        or int(last) < 1
        or (current >= 1 and not source.manifest_exists(int(last)))
    ):
        return bootstrap_rollup(
            source, rollup, group_cols, aggs, job_store, job, option_key=option_key
        )
    last = int(last)
    if current <= last:
        return 0

    applied = 0
    if mode == "delta":
        # Strictly per-version: the fence (batch id = source version) can
        # only make redelivery a no-op if a crashed pass re-produces the
        # SAME batch — a coalesced range would extend past the crash point
        # and double-count the prefix.
        for v, diff in iter_changes(source, last, current, pre_post=True):
            sign = F.when(
                F.col("_change").isin("insert", "update_after"), F.lit(1)
            ).otherwise(F.lit(-1))
            delta_aggs = []
            for a in aggs:
                contrib = (
                    sign
                    if a.fn == "count"
                    else sign * F.coalesce(F.expr(a.expr), F.lit(0))
                )
                delta_aggs.append(F.sum(contrib).alias(f"_d_{a.out}"))
            deltas = diff.groupBy(*group_cols).agg(*delta_aggs)
            # Affected rollup buckets — same pruning shape as merge_apply's
            # probe; the join below then touches O(affected buckets).
            buckets = sorted(
                r["_b"]
                for r in deltas.select(rollup.bucket_expr().alias("_b"))
                .distinct()
                .collect()
            )
            old = rollup.read_buckets(buckets) if buckets else rollup.read().limit(0)
            out_type = {f.name: f.dataType for f in rollup.schema().fields}
            joined = deltas.join(old, on=list(group_cols), how="left")
            cnt_cols = [a for a in aggs if a.fn == "count"]
            new_cols = list(group_cols)
            for a in aggs:
                new_val = F.coalesce(F.col(a.out), F.lit(0)) + F.col(f"_d_{a.out}")
                new_cols.append(new_val.cast(out_type[a.out]).alias(a.out))
            out = joined.select(*new_cols)
            # A group vanishes when its row count hits zero. Without a
            # count agg there is no liveness signal — require one.
            if not cnt_cols:
                raise EngineError(
                    "delta rollup needs at least one count aggregate to "
                    "know when a group becomes empty"
                )
            liveness = cnt_cols[0].out
            batch = out.withColumn(
                "op",
                F.when(F.col(liveness) <= 0, F.lit("delete")).otherwise(
                    F.lit("upsert")
                ),
            )
            if _apply(rollup, batch, v) is not None:
                applied += 1
            job_store.update(job, **{option_key: v})
    else:
        # Recompute mode: ONE pass at the current version — absolute
        # values are idempotent, so the whole range's affected groups can
        # be re-aggregated together. The coalesced pre/post diff names
        # every affected group in one frame: a row whose GROUP column
        # changed contributes its old group via update_before/delete and
        # its new group via update_after/insert.
        affected = None
        for _v, diff in iter_changes(source, last, current, coalesce=True, pre_post=True):
            affected = diff.select(*group_cols).distinct()
        if affected is not None:
            src = source.read().join(
                F.broadcast(affected), on=list(group_cols), how="left_semi"
            )
            if recompute_fn is not None:
                fresh = recompute_fn(src)
            else:
                fresh = src.groupBy(*group_cols).agg(*_agg_exprs(aggs))
            gone = (
                affected.join(
                    fresh.select(*group_cols), on=list(group_cols), how="left_anti"
                )
            )
            # Deleted groups need the full rollup schema: join back their
            # current rollup rows (values irrelevant to a delete).
            gone_rows = rollup.read().join(
                F.broadcast(gone), on=list(group_cols), how="left_semi"
            )
            batch = fresh.withColumn("op", F.lit("upsert")).unionByName(
                gone_rows.withColumn("op", F.lit("delete"))
            )
            if _apply(rollup, batch, current) is not None:
                applied += 1
    job_store.update(job, **{option_key: current})
    return applied
