"""Changelog tailing — the outbound half of the CDC loop.

``stream_apply`` (foreach.py) is the INBOUND direction: a change stream
lands in the lake table with epoch-fenced exactly-once commits. This
module is the OUTBOUND direction: downstream consumers follow the table's
commit log and receive each commit as a row-level diff
(``LakeTable.changes_between``), the way Debezium consumers follow a
binlog or an Iceberg incremental read follows snapshots.

The reference has no analog — Sqoop export is always a full-table push
(tool/ExportTool.java) — and this is precisely what it lacked for
pipeline composition: replicate, index, or aggregate FROM the lake
without re-reading it.

Consumption is pull-based and resumable: the consumer persists the last
version it applied (its own watermark — same JobStore round-trip as the
inbound watermark) and asks for everything newer. Per-commit granularity
keeps each diff O(changed buckets); a lagging consumer may coalesce a
version range into ONE diff (``iter_changes(..., coalesce=True)``)
because ``changes_between`` is transitive — the coalesced diff equals the
net effect of the per-commit diffs.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame

from sqoop_spark.errors import EngineError
from sqoop_spark.lake import LakeTable

#: Manifest operations that change table CONTENT. Maintenance commits
#: (compact / rewrite / cluster / rebucket / evolve) reorganize files or
#: metadata without changing the logical state — their diff is empty by
#: construction, so tailing skips them rather than paying a join to prove
#: emptiness. Row-level DML (delete / update / merge-into) and rollback
#: ARE content: a replica must receive GDPR erasures, manual corrections
#: and un-done batches as ordinary change rows.
_CONTENT_OPS = {
    "append",
    "delta-append",
    "merge",
    "overwrite",
    "delete",
    "update",
    "merge-into",
    "rollback",
}


def iter_changes(
    table: LakeTable,
    from_version: int,
    to_version: int | None = None,
    coalesce: bool = False,
    pre_post: bool = False,
) -> Iterator[tuple[int, DataFrame]]:
    """Yield ``(version, diff)`` for each content commit after
    ``from_version`` up to ``to_version`` (current when None).

    ``diff`` is the table schema + ``_change`` ('insert'/'update'/
    'delete') — apply order within one diff is irrelevant (one row per
    key). With ``coalesce=True`` the whole range collapses to a single
    ``(to_version, diff)`` pair: cheaper for a consumer that only wants
    the net state delta, at the cost of losing intermediate history.
    ``pre_post=True`` emits Iceberg changelog-view rows (updates split
    into ``update_before``/``update_after`` — see
    ``LakeTable.changes_between``); coalescing stays sound because the
    transitive diff's pre-images are the FROM-version values.
    """
    current = table.current_version() or 0
    to_v = to_version if to_version is not None else current
    if not (1 <= from_version <= to_v <= current):
        raise EngineError(
            f"iter_changes: version range [{from_version}, {to_v}] not "
            f"within committed [1, {current}]"
        )
    if not table.manifest_exists(from_version):
        raise EngineError(
            f"iter_changes: version {from_version} expired "
            "(removed by expire_snapshots) — consumer must re-bootstrap"
        )
    if coalesce:
        if to_v > from_version:
            yield to_v, table.changes_between(from_version, to_v, pre_post=pre_post)
        return
    for v in range(from_version + 1, to_v + 1):
        if not table.manifest_exists(v) or not table.manifest_exists(v - 1):
            raise EngineError(
                f"iter_changes: version {v if table.manifest_exists(v - 1) else v - 1} "
                "expired mid-range — re-run with coalesce=True from a live "
                "version or re-bootstrap"
            )
        if table.manifest(v)["operation"] not in _CONTENT_OPS:
            continue
        yield v, table.changes_between(v - 1, v, pre_post=pre_post)


def apply_changes(target: dict, diff: DataFrame, key_cols: list[str]) -> dict:
    """Apply one diff to a key→row dict — the reference consumer used by
    tests and the simplest possible replication sink. Real consumers do
    the same three-way apply against their own store (JDBC upsert/delete,
    search index, cache)."""
    for row in diff.collect():
        k = tuple(row[c] for c in key_cols)
        if row["_change"] == "delete":
            target.pop(k, None)
        else:
            target[k] = {c: row[c] for c in diff.columns if c != "_change"}
    return target


def replicate_to_table(
    source: LakeTable,
    replica,
    job_store,
    job: str,
    option_key: str = "changelog.replica.version",
    op_col: str = "op",
) -> int:
    """One resumable lake→lake replication pass: each content commit's diff
    becomes one fenced merge batch on the replica, with **batch id = source
    table version** — the foreachBatch contract (streaming/foreach.py) with
    the changelog as the source instead of a file stream.

    Exactly-once layering, same as the inbound direction:

    - the JobStore watermark (saved AFTER each apply) makes delivery
      at-least-once across crashes;
    - the replica's batch-id fence (commit-atomic with the data,
      ``CdcEngine.apply_batch``) makes redelivered diffs no-ops.

    ``replica`` is a CdcEngine over a table with the same key columns and
    order column as ``source``; dedicate one replica table per source
    (version numbers are the fence namespace). Bootstrap — first call, or a
    saved position that expired under ``expire_snapshots`` — performs a full
    resync as ONE fenced batch: the source snapshot as upserts, plus
    deletes for replica keys the snapshot no longer has (rows deleted while
    the consumer was down must not survive a re-bootstrap).

    Returns the number of batches applied (resync counts as one).

    Diffs are ABSOLUTE state transitions delivered in version order (the
    replica is provably at the v−1 state when diff v arrives — the
    watermark/fence pair enforces it), so they apply under **dataset
    precedence**: the diff row always wins, including a delete whose
    stored order value equals the replica row's. That is MergeReducerBase
    semantics, selected here by passing a sentinel order column the schema
    doesn't have (cdc/merge.py falls back to dataset precedence exactly
    when the order column isn't a table column). A MoR replica cannot
    express this — its read-time resolution orders by the STORED column,
    which would resurrect rows a same-seq delete removed — so the replica
    must be copy-on-write.
    """
    from pyspark.sql import functions as F

    if replica.merge_strategy != "cow":
        raise EngineError(
            "replicate_to_table requires a copy-on-write replica: diffs are "
            "absolute state transitions applied under dataset precedence, "
            "which MoR read-time resolution (ordered by the stored order "
            "column) cannot express"
        )
    # Not a real column: selects the dataset-precedence merge path.
    _precedence = "_changelog_dataset_precedence"
    opts = job_store.read(job)["options"]
    current = source.current_version() or 0
    last = opts.get(option_key)
    if (
        last is None
        or int(last) < 1
        or (current >= 1 and not source.manifest_exists(int(last)))
    ):
        applied = 0
        if current >= 1:
            snap = source.read(current)
            batch = snap.withColumn(op_col, F.lit("upsert"))
            if replica.table.total_rows() > 0:
                key_cols = replica.table.key_columns
                gone = (
                    replica.table.read()
                    .join(snap.select(*key_cols), key_cols, "left_anti")
                    .withColumn(op_col, F.lit("delete"))
                )
                batch = batch.unionByName(gone)
            if (
                replica.apply_batch(
                    batch,
                    batch_id=current,
                    order_col=_precedence,
                    reduce_batch=False,
                )
                is not None
            ):
                applied = 1
        job_store.update(job, **{option_key: current})
        return applied
    applied = 0
    for v, diff in iter_changes(source, int(last), current):
        batch = diff.withColumn(
            op_col,
            F.when(F.col("_change") == "delete", F.lit("delete")).otherwise(
                F.lit("upsert")
            ),
        ).drop("_change")
        # One row per key by construction — skip the newest-wins reduce
        # shuffle; the fence alone decides re-delivery.
        if (
            replica.apply_batch(
                batch,
                batch_id=v,
                order_col=_precedence,
                reduce_batch=False,
            )
            is not None
        ):
            applied += 1
        job_store.update(job, **{option_key: v})
    if current > int(last):
        job_store.update(job, **{option_key: current})
    return applied


def follow_changes(
    table: LakeTable,
    job_store,
    job: str,
    apply_fn,
    option_key: str = "changelog.last.version",
    bootstrap_fn=None,
) -> int:
    """One resumable consumption pass: apply every content commit newer
    than the consumer's saved watermark, then advance it.

    The outbound mirror of ``sqoop job --exec``: the consumer's position
    lives in the same JobStore as the inbound watermark, and crash-resume
    has at-least-once semantics — ``apply_fn(version, diff)`` runs BEFORE
    the watermark save, so a crash between apply and save re-delivers
    that diff on the next pass. Diffs are idempotent to re-apply (one row
    per key, ops are absolute states, as apply_changes shows), which
    upgrades the loop to effectively-once — the same
    fence-over-watermark layering the inbound side uses.

    Returns the number of diffs applied. First call (no saved position)
    starts from the current version: consumers bootstrap from a full
    read, not from replaying all history. A saved position that is no
    longer a usable diff base — 0 (bootstrapped before the first commit)
    or expired by expire_snapshots — re-bootstraps the same way.

    ``bootstrap_fn(version, snapshot_df)``: optional full-resync hook,
    called (before the watermark save, same at-least-once layering) on
    every bootstrap/re-bootstrap with the current snapshot — a consumer
    that materializes state (a JDBC replica, say) MUST pass one, or the
    base snapshot is silently never delivered and deletes that happened
    across an expiry gap are lost. With a hook the bootstrap pass counts
    as 1 applied batch; without one, a 0 return with an advanced saved
    version is the re-sync-yourself signal.
    """
    opts = job_store.read(job)["options"]
    current = table.current_version() or 0
    last = opts.get(option_key)
    # Re-bootstrap whenever the saved position is unusable as a diff base:
    # never saved, saved before the table had any commit (version 0), or
    # expired by expire_snapshots. Bootstrap = start from the current
    # version (full read, not history replay) — same as the first call.
    if (
        last is None
        or int(last) < 1
        or (current >= 1 and not table.manifest_exists(int(last)))
    ):
        applied = 0
        if bootstrap_fn is not None and current >= 1:
            # full resync BEFORE the watermark save (at-least-once, same
            # as the diff path): a crash mid-resync re-bootstraps
            bootstrap_fn(current, table.read(current))
            applied = 1
        job_store.update(job, **{option_key: current})
        return applied
    applied = 0
    for v, diff in iter_changes(table, int(last), current):
        apply_fn(v, diff)
        applied += 1
        job_store.update(job, **{option_key: v})
    if current > int(last):
        job_store.update(job, **{option_key: current})
    return applied
