"""Versioned table snapshots — a minimal Delta-style commit log for
plain-parquet deployments.

The reference's upsert path rewrites rows in place and keeps history
only in `data_change_audit`; on an object store the engine-side
equivalent of its transactional behavior is immutable version
directories plus an atomically-swapped manifest pointer:

  root/
    v=1/ ... parquet ...
    v=2/ ...
    _manifest.json   {"version": 2, "path": "v=2", "note": ..., ...}

- Writers never mutate a published version; a new version becomes
  visible only when the manifest rename lands (os.replace is atomic on
  POSIX; on S3 the equivalent is a small pointer object PUT, which is
  atomic per-key).
- Readers resolve the pointer once and then read an immutable
  directory — no torn reads during concurrent publishes.
- Time travel = read any retained version; rollback = re-point the
  manifest (a metadata-only operation).
- On Delta/Iceberg deployments this module is superseded by the table
  format's own log; the merge operators don't care (they produce a
  DataFrame image either way).

At 100 TB: versions share nothing (full snapshots), so this is for
dimension/registry-scale tables — the reference's subjects /
local_subject_ids (millions of rows), not the fact tables, which use
partitioned appends (storage.write_partitioned) instead.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root.rstrip("/")

    # -- internals --------------------------------------------------

    def _manifest_path(self) -> str:
        return os.path.join(self.root, "_manifest.json")

    def _history_path(self) -> str:
        return os.path.join(self.root, "_history.json")

    def _read_json(self, path: str):
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def _write_json_atomic(self, path: str, obj) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(obj, f)
        os.replace(tmp, path)  # atomic pointer flip

    # -- API --------------------------------------------------------

    def latest_version(self) -> int | None:
        m = self._read_json(self._manifest_path())
        return m["version"] if m else None

    def versions(self) -> list[dict]:
        return self._read_json(self._history_path()) or []

    def write(self, df: DataFrame, *, note: str = "") -> int:
        """Publish a new version; returns its number. The version is
        invisible until the manifest flip, so a crashed writer leaves
        only an unreferenced directory (garbage, not corruption)."""
        os.makedirs(self.root, exist_ok=True)
        # number from max(history), NOT the manifest pointer: after a
        # rollback the pointer is an older version, and reusing its
        # successor's number would overwrite a retained snapshot
        history_max = max((e["version"] for e in self.versions()), default=0)
        version = history_max + 1
        rel = f"v={version}"
        df.write.mode("overwrite").parquet(os.path.join(self.root, rel))
        entry = {
            "version": version,
            "path": rel,
            "note": note,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        history = self.versions()
        history.append(entry)
        self._write_json_atomic(self._history_path(), history)
        self._write_json_atomic(self._manifest_path(), entry)
        return version

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Read the latest (or a time-traveled) version."""
        if version is None:
            m = self._read_json(self._manifest_path())
            if m is None:
                raise FileNotFoundError(f"no published version under {self.root}")
            rel = m["path"]
        else:
            matches = [e for e in self.versions() if e["version"] == version]
            if not matches:
                raise FileNotFoundError(f"version {version} not in history")
            rel = matches[0]["path"]
        return spark.read.parquet(os.path.join(self.root, rel))

    def rollback(self, version: int) -> None:
        """Re-point the manifest at an older retained version
        (metadata-only; no data rewrite)."""
        matches = [e for e in self.versions() if e["version"] == version]
        if not matches:
            raise FileNotFoundError(f"version {version} not in history")
        self._write_json_atomic(self._manifest_path(), matches[0])

    def vacuum(self, *, keep: int = 3) -> list[int]:
        """Drop all but the newest `keep` versions; the current
        pointer's version always survives in addition to the keep
        budget (so after a rollback, `keep` newest + the rolled-back
        current are retained). keep=0 retains only the current
        pointer; negative keep is an error (a bare `history[:-keep]`
        would make 0 a silent no-op). Returns removed versions."""
        import shutil

        if keep < 0:
            raise ValueError(f"keep must be >= 0, got {keep}")
        history = sorted(self.versions(), key=lambda e: e["version"])
        current = self.latest_version()
        survivors = (
            {e["version"] for e in history[max(0, len(history) - keep) :]}
            if keep > 0
            else set()
        )
        removable = [
            e
            for e in history
            if e["version"] not in survivors and e["version"] != current
        ]
        for e in removable:
            shutil.rmtree(os.path.join(self.root, e["path"]), ignore_errors=True)
        kept = [e for e in history if e not in removable]
        # rewrite history in ascending-version order (the sort above),
        # regardless of the on-disk append order — versions()/readers
        # may rely on monotone history after a rollback interleaves
        # appends
        self._write_json_atomic(self._history_path(), kept)
        return [e["version"] for e in removable]
