"""Engine error types.

Message discipline mirrors the reference's user-facing errors so tests can
assert on them the way Sqoop's suites do (e.g. the exact incompatible-schema
message, reference:
mapreduce/parquet/hadoop/HadoopParquetMergeJobConfigurator.java:118-121).
"""

from __future__ import annotations


class EngineError(RuntimeError):
    """Base class for all sqoop_spark errors."""


class InvalidCheckColumnError(EngineError):
    """Append-mode check column must be numeric/date/timestamp.

    Mirrors Sqoop's rejection of char/varchar check columns
    (reference: tool/ImportTool.java:316-333 and
    TestIncrementalImport.testAppendWithString, :993).
    """


class MergeKeyRequiredError(EngineError):
    """lastmodified import into an existing target needs a merge key.

    Mirrors reference: tool/ImportTool.java:334-343 ("--merge-key or --append
    is required when using --incremental lastmodified and the output
    directory exists").
    """


class IncompatibleSchemaError(EngineError):
    """Schema evolution request is not mutual-read compatible.

    Mirrors the reference's parquet merge schema validation message
    "Cannot merge files, the Avro schemas are not compatible."
    (HadoopParquetMergeJobConfigurator.java:105-121).
    """


class ValidationFailure(EngineError):
    """Row-count validation failed beyond threshold.

    Mirrors reference: validation/RowCountValidator.java:36-60.
    """


class ConcurrentCommitError(EngineError):
    """Another writer committed the same snapshot version first."""
