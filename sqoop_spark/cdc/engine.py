"""CdcEngine — the replay orchestrator.

Ties together the pieces: watermark slice → micro-batch split → vectorized
transforms → newest-wins merge-apply → fence/lineage commit → watermark save.
This is the Spark-native equivalent of Sqoop's
``sqoop job --exec`` loop (tool/JobTool.java + ImportTool.importTable,
reference: ImportTool.java:511-555) with the merge tool folded in.

Exactly-once contract: every micro-batch has a ``batch_id``; the lake commit
fences it atomically with the data. Resume after a crash replays the tail
from the last *saved* watermark (possibly re-reading applied batches) and
skips every fenced batch — final state is identical to an uninterrupted run
(FIXTURES.md §3.6).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqoop_spark.cdc.checkpoint import JobStore
from sqoop_spark.cdc.merge import MergeMode, MergeStats, merge_apply
from sqoop_spark.cdc.watermark import IncrementalMode, incremental_slice
from sqoop_spark.errors import EngineError, MergeKeyRequiredError, ValidationFailure
from sqoop_spark.lake import LakeTable
from sqoop_spark.transforms import fingerprint_content

#: Default target-table schema (BASELINE.json input_hint + engine watermark
#: columns per FIXTURES.md §1).
REPOS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("event_seq", T.LongType()),
        T.StructField("event_ts", T.TimestampType()),
    ]
)


@dataclass
class ReplayReport:
    batches: list[MergeStats] = field(default_factory=list)
    skipped_batch_ids: list[int] = field(default_factory=list)
    watermark: Any = None
    events_seen: int = 0
    wall_seconds: float = 0.0

    @property
    def rows_applied(self) -> int:
        return sum(b.rows_applied for b in self.batches)

    @property
    def counters_missing(self) -> bool:
        """True if any batch's events_in Observation missed — events_seen
        then under-counts and count-based validation must not abort."""
        return any(b.counters_missing for b in self.batches)

    def summary_line(self) -> str:
        """PerfCounters-style self-report — mirrors the reference's
        "Transferred N MB in S seconds (X KB/sec)" + "Retrieved N records."
        (util/PerfCounters.java:26-95; ImportJobBase.java:183-192), in
        events because change events are this engine's unit of transfer."""
        eps = self.events_seen / self.wall_seconds if self.wall_seconds else 0.0
        return (
            f"Applied {self.events_seen} change events in "
            f"{self.wall_seconds:.4g} seconds ({eps:,.0f} events/sec). "
            f"Retrieved {self.rows_applied} applied rows across "
            f"{len(self.batches)} batches."
        )


def _coerce_last_value(dtype: T.DataType, value: Any) -> Any:
    """Parse a stringified watermark back to the check column's type."""
    if value is None or not isinstance(value, str):
        return value
    import datetime as dt

    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return dt.datetime.fromisoformat(value)
    if isinstance(dtype, T.DateType):
        return dt.date.fromisoformat(value)
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return int(value)
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return float(value)
    if isinstance(dtype, T.DecimalType):
        from decimal import Decimal

        return Decimal(value)
    return value


class CdcEngine:
    def __init__(
        self,
        spark: SparkSession,
        table: LakeTable,
        merge_mode: MergeMode = MergeMode.UPSERT,
        salt_partitions: int = 0,
        fingerprint: bool = True,
        validate_counts: bool = True,
        merge_strategy: str = "cow",
        auto_compact_threshold: int = 16,
        dedup_id_cols: list[str] | None = None,
        dedup_arrival_col: str = "event_seq",
    ):
        if merge_strategy not in ("cow", "mor"):
            raise EngineError(f"unknown merge strategy: {merge_strategy}")
        self.spark = spark
        self.table = table
        self.merge_mode = merge_mode
        self.salt_partitions = salt_partitions
        self.fingerprint = fingerprint
        self.validate_counts = validate_counts
        self.merge_strategy = merge_strategy
        self.auto_compact_threshold = auto_compact_threshold
        # At-least-once sources (queue consumers, binlog reconnects) can
        # redeliver events. The keyed merge path absorbs redelivery for
        # free (newest-wins per key is idempotent), but blind append
        # (merge_mode=None) would double rows — set ``dedup_id_cols`` to
        # the event-identity columns to keep the FIRST arrival per id
        # within each batch (cdc.merge.first_arrival_dedup).
        self.dedup_id_cols = dedup_id_cols
        self.dedup_arrival_col = dedup_arrival_col

    # -- table bootstrap -----------------------------------------------------

    @classmethod
    def create_table(
        cls,
        spark: SparkSession,
        path: str,
        schema: T.StructType = REPOS_SCHEMA,
        key_columns: tuple[str, ...] = ("repo", "path"),
        num_buckets: int = 32,
        **kwargs,
    ) -> "CdcEngine":
        table = LakeTable.create(
            spark, path, schema, list(key_columns), num_buckets=num_buckets
        )
        return cls(spark, table, **kwargs)

    # -- transforms -----------------------------------------------------------

    def _transform(self, batch: DataFrame) -> DataFrame:
        """The vectorized row-transform stage (pandas/Arrow UDFs only).

        Normalization + sha256 fingerprint happen here, once — this is the
        codegen-replacement stage (SURVEY.md §2.7). Rows already carrying a
        content_sha are trusted only if recomputation is disabled.
        """
        if self.fingerprint and "content" in batch.columns:
            batch = fingerprint_content(batch)
        return batch

    # -- replay ------------------------------------------------------------------

    def apply_batch(
        self, batch: DataFrame, batch_id: int | None, **merge_kwargs
    ) -> MergeStats | None:
        """Apply one already-bounded micro-batch (fence-checked)."""
        if batch_id is not None and self.table.is_fenced(batch_id):
            return None
        if self.merge_mode is None:
            # No merge key configured → blind append, Sqoop's plain
            # `--incremental append` sink (ImportTool append path).
            if self.dedup_id_cols:
                from sqoop_spark.cdc.merge import first_arrival_dedup

                batch = first_arrival_dedup(
                    batch, self.dedup_id_cols, self.dedup_arrival_col
                )
            df = self._transform(batch)
            cols = [f.name for f in self.table.schema().fields]
            # Blind appends are append-shaped: a lost manifest race to a
            # parallel import job rebases safely (fence re-checked), so
            # the multi-writer Sqoop-parallel shape works out of the box.
            manifest = self.table.append(
                df.select(*[c for c in cols if c in df.columns]),
                batch_id=batch_id,
                retry_conflicts=2,
            )
            parent_paths = {
                e["path"] for e in self.table.manifest(manifest["parent"])["files"]
            }
            rows = sum(
                e["rows"]
                for e in manifest["files"]
                if e["path"] not in parent_paths
            )
            return MergeStats(batch_id, rows, 0, 0, rows, 0, 0, self.table.num_buckets)
        stats = merge_apply(
            self.table,
            batch,
            batch_id=batch_id,
            mode=self.merge_mode,
            salt_partitions=self.salt_partitions,
            # transforms run on the post-reduce survivors (one row per key):
            # same result, a dup-factor less Python-side work
            post_reduce_transform=self._transform,
            strategy=self.merge_strategy,
            auto_compact_threshold=self.auto_compact_threshold,
            **merge_kwargs,
        )
        if self.validate_counts:
            self._validate(stats)
        return stats

    def _validate(self, stats: MergeStats) -> None:
        """Row-count validation — RowCountValidator semantics.

        Reference: validation/RowCountValidator.java:36-60 compares source
        row count to target row count with an AbsoluteValidationThreshold.
        Here: every reduced-batch row must be accounted for as
        updated/inserted/deleted/noop'd; carried rows must equal
        old-touched minus (updated+deleted).
        """
        accounted = stats.updated + stats.inserted + stats.deleted
        if stats.rows_in and accounted > stats.rows_in:
            raise ValidationFailure(
                f"row-count validation failed for batch {stats.batch_id}: "
                f"{accounted} rows applied from {stats.rows_in} input rows"
            )
        if stats.deleted < 0 or stats.carried < 0:
            raise ValidationFailure(
                f"lineage counter mismatch for batch {stats.batch_id}: "
                f"carried={stats.carried} deleted={stats.deleted} "
                f"(old_touched must equal carried+updated+deleted)"
            )

    def run_incremental(
        self,
        events: DataFrame,
        mode: IncrementalMode = IncrementalMode.APPEND,
        check_column: str = "event_seq",
        job: str | None = None,
        job_store: JobStore | None = None,
        batch_col: str = "batch_id",
        last_value: Any = None,
        require_merge_for_lastmodified: bool = True,
        **merge_kwargs,
    ) -> ReplayReport:
        """One incremental run: slice by watermark, apply per micro-batch.

        With ``job``/``job_store`` set, the watermark round-trips through the
        saved job exactly like ``sqoop job --exec j1`` (JobTool.java:355-368),
        except the batch fence — not the saved value — is what guarantees
        exactly-once.
        """
        import time as _time

        _t0 = _time.time()
        if job is not None:
            if job_store is None:
                raise EngineError("job_store required when job is set")
            opts = job_store.read(job)["options"]
            last_value = opts.get("incremental.last.value", last_value)
        # The job store serializes non-JSON values (timestamps, decimals)
        # as strings, and CLI --last-value is always a string — coerce to
        # the check column's native type so watermark comparisons never mix
        # types (the reference auto-quotes per vendor instead,
        # ConnManager.datetimeToQueryString:782-795).
        last_value = _coerce_last_value(
            events.schema[check_column].dataType, last_value
        )

        if (
            mode is IncrementalMode.LASTMODIFIED
            and require_merge_for_lastmodified
            and self.table.total_rows() > 0
            and self.merge_mode is None
        ):
            raise MergeKeyRequiredError(
                "--merge-key or --append is required when using --incremental "
                "lastmodified and the output directory exists"
            )

        # One combined probe pass: MAX(check_col) + the distinct batch ids of
        # the in-slice rows. The upper bound (<= MAX) excludes nothing from
        # the batch-id set by definition, so collecting batch ids under the
        # lower-bound predicate alone is exact — this halves the probe scans
        # vs a separate watermark probe + DISTINCT pass.
        has_batches = batch_col in events.columns
        c = F.col(check_column)
        # typed literal — see watermark.typed_lit: naive datetimes must not
        # round-trip through system/session timezones against NTZ columns
        from sqoop_spark.cdc.watermark import typed_lit

        _lv = (
            typed_lit(last_value, events.schema[check_column].dataType)
            if last_value is not None
            else None
        )
        if mode is IncrementalMode.APPEND:
            in_slice = c > _lv if _lv is not None else F.lit(True)
        else:
            in_slice = c >= _lv if _lv is not None else F.lit(True)
        aggs = [F.max(c).alias("m")]
        if has_batches:
            aggs.append(
                F.collect_set(F.when(in_slice, F.col(batch_col))).alias("b")
            )
            # collect_set drops NULLs and the per-batch == filter would
            # too: a NULL batch id would be silently lost while the
            # watermark advanced past it — refuse instead.
            aggs.append(
                F.max(
                    F.when(in_slice & F.col(batch_col).isNull(), 1).otherwise(0)
                ).alias("null_batches")
            )
        probe = events.agg(*aggs).collect()[0]
        if has_batches and probe["null_batches"]:
            raise EngineError(
                f"NULL values in batch column '{batch_col}' within the "
                "incremental slice — every change event must carry a batch id"
            )

        sl = incremental_slice(
            events, mode, check_column, last_value, precomputed_max=probe["m"]
        )
        report = ReplayReport(watermark=sl.upper)
        if sl.empty:
            report.wall_seconds = _time.time() - _t0
            return report

        sliced = sl.df
        if not has_batches:
            sliced = sliced.withColumn(batch_col, F.lit(0).cast("long"))
            batch_ids = [0]
        else:
            batch_ids = sorted(probe["b"])

        # Fence namespace: a batch id can legitimately reappear in a LATER
        # incremental window (batch ids follow event_seq; a lastmodified
        # window follows event_ts), so the fence token is (slice lower
        # bound, batch id). Crash-resume re-runs the SAME lower bound (the
        # watermark is saved only after success, mirroring
        # ImportTool.saveIncrementalState) → same tokens → applied batches
        # no-op; a new window gets fresh tokens and its boundary re-reads
        # are deduped by the idempotent merge (the reference's reason for
        # requiring --merge-key with lastmodified).
        if last_value is None:
            _fence = int
        else:
            import hashlib as _hashlib

            def _fence(b):
                digest = _hashlib.sha256(
                    f"{check_column}|{last_value}|{b}".encode()
                ).digest()
                return int.from_bytes(digest[:8], "big") >> 1
        fenced = self.table.fenced_batch_ids()
        for b in batch_ids:
            if _fence(b) in fenced:
                report.skipped_batch_ids.append(b)
                continue
            batch = sliced.filter(F.col(batch_col) == b).drop(batch_col)
            stats = self.apply_batch(batch, _fence(b), **merge_kwargs)
            if stats is not None:
                report.batches.append(stats)
                report.events_seen += stats.rows_in

        report.wall_seconds = _time.time() - _t0
        if job is not None:
            job_store.update(job, **{"incremental.last.value": report.watermark})
            job_store.record_run(
                job,
                {
                    "watermark": report.watermark,
                    "batches": [b.batch_id for b in report.batches],
                    "skipped": report.skipped_batch_ids,
                    "rows_applied": report.rows_applied,
                },
            )
        return report

    def compact(self, buckets=None) -> None:
        """Collapse MoR deltas into base files (maintenance operation)."""
        self.table.compact(buckets)

    # -- full replay (bench path) ---------------------------------------------------

    def replay(
        self,
        events: DataFrame,
        batch_col: str = "batch_id",
        **merge_kwargs,
    ) -> ReplayReport:
        """Replay an entire change stream micro-batch by micro-batch."""
        return self.run_incremental(
            events,
            mode=IncrementalMode.APPEND,
            check_column="event_seq",
            batch_col=batch_col,
            **merge_kwargs,
        )
