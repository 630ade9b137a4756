"""Row-count validation — validation/RowCountValidator.java parity.

The reference validates an import/export by comparing the source row count
against the target row count through a pluggable threshold
(validation/RowCountValidator.java:36-60; AbsoluteValidationThreshold
accepts only equality; failure goes to AbortOnFailureHandler which raises
— validation/AbortOnFailureHandler.java). The CLI wires it via
``--validate --validator --validation-threshold --validation-failurehandler``
(tool/BaseSqoopTool.java validation options).

Here the same contract runs over DataFrame counts or the engine's lineage
counters: every change event must be accounted for as
applied (updated/inserted/deleted), deduped (lost the newest-wins race),
or skipped (no-op delete of an absent key).
"""

from __future__ import annotations

from dataclasses import dataclass

from sqoop_spark.errors import ValidationFailure


class AbsoluteValidationThreshold:
    """Accept iff counts differ by at most ``margin`` (reference default:
    equality — AbsoluteValidationThreshold compares value1 == value2)."""

    def __init__(self, margin: int = 0):
        self.margin = margin

    def accept(self, source: int, target: int) -> bool:
        return abs(source - target) <= self.margin


class PercentageValidationThreshold:
    """Accept iff the relative difference is at most ``pct`` (the
    reference's docs sketch a percentage threshold as the extension
    point; concrete class left to users there)."""

    def __init__(self, pct: float):
        self.pct = pct

    def accept(self, source: int, target: int) -> bool:
        if source == 0:
            return target == 0
        return abs(source - target) / source <= self.pct


@dataclass
class ValidationReport:
    source_count: int
    target_count: int
    ok: bool
    message: str


def validate_row_counts(
    source_count: int,
    target_count: int,
    threshold=None,
    abort_on_failure: bool = True,
) -> ValidationReport:
    """RowCountValidator.validate: compare counts, abort on mismatch.

    Failure message mirrors the reference's wording
    ("Validation failed by RowCountValidator", RowCountValidator.java:52-58).
    """
    threshold = threshold or AbsoluteValidationThreshold()
    ok = threshold.accept(source_count, target_count)
    msg = (
        "Validation succeeded"
        if ok
        else (
            "Validation failed by RowCountValidator. Reason: The expected "
            f"counter value was {source_count} but the actual value was "
            f"{target_count}"
        )
    )
    if not ok and abort_on_failure:
        raise ValidationFailure(msg)
    return ValidationReport(source_count, target_count, ok, msg)


def validate_replay(report, events_total: int, abort_on_failure: bool = True):
    """Validate a ReplayReport: events seen must equal the source total and
    every batch's counters must reconcile (rows_in = applied + carried-race
    + noops is enforced per-batch by the engine; this checks the whole-run
    envelope)."""
    return validate_row_counts(
        events_total, report.events_seen, abort_on_failure=abort_on_failure
    )
