"""CDC core: watermark slicing, newest-wins merge-apply, checkpointed replay."""

from sqoop_spark.cdc.watermark import IncrementalMode, incremental_slice
from sqoop_spark.cdc.merge import MergeMode, MergeStats, merge_apply, newest_wins_reduce
from sqoop_spark.cdc.checkpoint import JobStore
from sqoop_spark.cdc.engine import CdcEngine, ReplayReport

__all__ = [
    "IncrementalMode",
    "incremental_slice",
    "MergeMode",
    "MergeStats",
    "merge_apply",
    "newest_wins_reduce",
    "JobStore",
    "CdcEngine",
    "ReplayReport",
]
