"""Lake table layer: Iceberg-style snapshot tables over parquet.

``LakeTable`` implements the subset of Iceberg semantics the CDC engine
needs — atomic snapshot commits, snapshot-summary batch-id fencing,
bucket-partitioned data files with bucket-pruned copy-on-write rewrite, and
column-id-based schema evolution — with no external dependencies, so the
engine runs on stock PySpark. On a cluster with the Iceberg Spark runtime the
same engine API can bind to real Iceberg tables (``MERGE INTO`` +
write-audit-publish); the sandbox has no Iceberg jars, so this layer is the
default and the tested path.
"""

from sqoop_spark.lake.table import LakeTable, SnapshotInfo

__all__ = ["LakeTable", "SnapshotInfo"]
