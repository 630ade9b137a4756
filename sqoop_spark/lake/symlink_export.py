"""Symlink-format manifest export: the Presto/Athena/Hive interop path.

Delta Lake ships `GENERATE symlink_format_manifest` for engines that
predate native lake-format support: a ``_symlink_format_manifest/``
directory holding plain text files, one data-file URI per line, readable
by Hive's ``SymlinkTextInputFormat`` and by anything that can read a
file list (Presto/Athena external tables, DuckDB ``read_parquet([...])``,
plain scripts). This module is that generator for the engine's lake
tables — the lowest-common-denominator sibling of
:mod:`sqoop_spark.lake.iceberg_export`: no Avro, no metadata schema,
just "these are exactly the parquet files of snapshot v".

Same soundness rules as the Iceberg export: tombstone entries are
excluded, unmerged MoR deltas refuse (a file list cannot express
order-column resolution — compact first). Unlike the Iceberg export this
one is verifiable end-to-end by an EXTERNAL engine inside this sandbox:
DuckDB's parquet reader consumes the manifest's file list directly
(pytest pins value equality).

Reference context: Sqoop's own outputs were plain HDFS file sets that
Hive external tables pointed at (``hive/TableDefWriter.java:119``) — the
manifest reproduces that "just files" consumability for a versioned,
compacted lake table.
"""

from __future__ import annotations

import os
import uuid
from urllib.parse import quote, unquote

from sqoop_spark.errors import EngineError

MANIFEST_DIR = "_symlink_format_manifest"


def export_symlink_manifest(
    table, dest: str | None = None, version: int | None = None
) -> str:
    """Write ``<dest>/_symlink_format_manifest/manifest`` listing the
    absolute ``file:`` URIs of every live data file of ``table``'s
    snapshot at ``version`` (default current), one per line. Returns the
    manifest file path. Metadata-only; atomic replace."""
    m = table.manifest(version)
    entries = [e for e in m["files"] if not e.get("tombstone")]
    if any(e.get("delta") for e in entries):
        raise EngineError(
            "export_symlink_manifest: snapshot has unmerged MoR deltas — "
            "a file listing cannot express order-column resolution; run "
            "compact() first"
        )
    dest = dest or table.path
    d = os.path.join(dest, MANIFEST_DIR)
    os.makedirs(d, exist_ok=True)
    out = os.path.join(d, "manifest")
    # uuid-suffixed tmp (the same pattern as every concurrent-safe writer
    # in this repo): a fixed ".tmp" name would let two concurrent exports
    # truncate each other mid-write and promote a garbled manifest
    tmp = f"{out}.{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as f:
        for e in entries:
            full = os.path.abspath(os.path.join(table.path, e["path"]))
            # consumers parse each line as a URI (Hive SymlinkTextInputFormat,
            # Athena) — spaces/'%'/'#' in paths must be percent-encoded,
            # exactly as Delta's GENERATE does
            f.write(f"file://{quote(full)}\n")
    os.replace(tmp, out)
    return out


def read_manifest_paths(manifest_path: str) -> list[str]:
    """The data-file paths a manifest lists (``file:`` scheme stripped
    and percent-encoding decoded — local consumers want plain paths)."""
    with open(manifest_path) as f:
        return [
            unquote(line.strip().removeprefix("file://"))
            for line in f
            if line.strip()
        ]
