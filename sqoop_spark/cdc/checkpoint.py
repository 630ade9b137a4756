"""Saved jobs / checkpoints — Sqoop metastore semantics, exactly-once.

The reference persists a saved job's whole ``SqoopOptions`` (including
``incremental.last.value``) as property rows in HSQLDB
(metastore/GenericJobStorage.java:634-657,699-735) and re-runs the import
with the restored watermark (tool/JobTool.java:355-368;
ImportTool.saveIncrementalState :159-184). That save is NOT atomic with the
data landing — a crash between them double-imports.

This store keeps the same job model (create/read/update/delete/list, mirrors
JobTool's actions) but the watermark alone is only advisory: correctness
comes from the lake table's batch-id fence, which is committed *in the same
atomic snapshot* as the data. Resume = re-slice from the saved watermark and
let fenced batch ids no-op — crash anywhere yields the same final state.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any

from sqoop_spark.errors import EngineError


class JobStore:
    """Directory of ``<job>.json`` documents (one per saved job)."""

    def __init__(self, root: str):
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)

    def _path(self, name: str) -> str:
        if not name or "/" in name:
            raise EngineError(f"bad job name: {name!r}")
        return os.path.join(self.root, f"{name}.json")

    def create(self, name: str, options: dict[str, Any]) -> None:
        """Mirror ``sqoop job --create`` (duplicate name is an error)."""
        path = self._path(name)
        if os.path.exists(path):
            raise EngineError(f"job {name} already exists")
        self._write(path, {"name": name, "options": options, "runs": []})

    def read(self, name: str) -> dict[str, Any]:
        path = self._path(name)
        if not os.path.exists(path):
            raise EngineError(f"no such job: {name}")
        with open(path) as f:
            return json.load(f)

    def update(self, name: str, **option_updates: Any) -> None:
        """Mirror ImportTool.saveIncrementalState — persist the new watermark."""
        doc = self.read(name)
        doc["options"].update(option_updates)
        self._write(self._path(name), doc)

    def record_run(self, name: str, run_info: dict[str, Any]) -> None:
        doc = self.read(name)
        doc["runs"].append(run_info)
        self._write(self._path(name), doc)

    def delete(self, name: str) -> None:
        path = self._path(name)
        if not os.path.exists(path):
            raise EngineError(f"no such job: {name}")
        os.unlink(path)

    def list(self) -> list[str]:
        return sorted(
            f[:-5] for f in os.listdir(self.root) if f.endswith(".json")
        )

    def show(self, name: str) -> dict[str, Any]:
        return self.read(name)["options"]

    @staticmethod
    def _write(path: str, doc: dict) -> None:
        tmp = f"{path}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f, indent=1, default=str)
        os.replace(tmp, path)
