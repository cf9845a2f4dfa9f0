"""Snapshot-manifest tables — the Iceberg semantics the north rule's
checkpoint-resume story depends on, implemented over plain parquet (the
sandbox has no iceberg-spark-runtime jar; this is the same contract at
miniature scale, not the wire format):

  * every commit writes its data files under data/<commit-uuid>/ and a
    manifest metadata/snap-<n>.json listing the FULL file set of the
    snapshot (append = parent's files + new files), the parent id, and
    an operation summary — Iceberg's snapshot+manifest-list shape;
  * readers resolve metadata/version-hint.text -> current snapshot and
    read EXACTLY the manifest's files: data files written by a crashed
    job that never committed are invisible (the Iceberg correctness
    property that makes blind resume safe);
  * time travel: read(snapshot_id=...) pins any historical snapshot;
    rollback() moves the hint back without touching data;
  * the hint is replaced via atomic rename, so a reader sees either the
    old or the new snapshot, never a torn state.
"""

from __future__ import annotations

import json
import os
import time
import uuid


class SnapshotTable:
    def __init__(self, path: str):
        self.path = path
        self.data_dir = os.path.join(path, "data")
        self.meta_dir = os.path.join(path, "metadata")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.meta_dir, exist_ok=True)

    # -- metadata ------------------------------------------------------------
    def _hint_path(self) -> str:
        return os.path.join(self.meta_dir, "version-hint.text")

    def current_snapshot_id(self) -> int | None:
        try:
            with open(self._hint_path()) as fh:
                return int(fh.read().strip())
        except FileNotFoundError:
            return None

    def _manifest_path(self, snap_id: int) -> str:
        return os.path.join(self.meta_dir, f"snap-{snap_id}.json")

    def _load_manifest(self, snap_id: int) -> dict:
        with open(self._manifest_path(snap_id)) as fh:
            return json.load(fh)

    def snapshots(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.meta_dir)):
            if name.startswith("snap-") and name.endswith(".json"):
                with open(os.path.join(self.meta_dir, name)) as fh:
                    out.append(json.load(fh))
        return sorted(out, key=lambda m: m["snapshot_id"])

    # -- writes --------------------------------------------------------------
    def commit(self, df, operation: str = "append") -> int:
        """Write df's partitions as new data files and commit a snapshot.

        'append' keeps the parent's files; 'overwrite' replaces them.
        The manifest lands before the hint flips (atomic rename), so an
        interrupted commit leaves the table at its previous snapshot.
        """
        commit_dir = os.path.join(self.data_dir, uuid.uuid4().hex)
        df.write.mode("errorifexists").parquet(commit_dir)
        new_files = sorted(
            os.path.join(commit_dir, f)
            for f in os.listdir(commit_dir)
            if f.endswith(".parquet")
        )
        parent = self.current_snapshot_id()
        files = list(new_files)
        if operation == "append" and parent is not None:
            files = self._load_manifest(parent)["files"] + files
        snap_id = (parent or 0) + 1
        manifest = {
            "snapshot_id": snap_id,
            "parent_snapshot_id": parent,
            "timestamp_ms": int(time.time() * 1000),
            "operation": operation,
            "summary": {
                "added-data-files": len(new_files),
                "total-data-files": len(files),
            },
            "files": files,
        }
        with open(self._manifest_path(snap_id), "w") as fh:
            json.dump(manifest, fh)
        tmp = self._hint_path() + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(snap_id))
        os.replace(tmp, self._hint_path())  # atomic snapshot flip
        return snap_id

    def rollback(self, snapshot_id: int) -> None:
        if not os.path.exists(self._manifest_path(snapshot_id)):
            raise ValueError(f"unknown snapshot {snapshot_id}")
        tmp = self._hint_path() + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(snapshot_id))
        os.replace(tmp, self._hint_path())

    # -- reads ---------------------------------------------------------------
    def read(self, spark, snapshot_id: int | None = None):
        """Current-or-pinned snapshot read: exactly the manifest's files.
        An empty table (no commit yet) raises like a missing Iceberg
        table would."""
        snap = snapshot_id if snapshot_id is not None else self.current_snapshot_id()
        if snap is None:
            raise ValueError(f"no committed snapshot in {self.path}")
        files = self._load_manifest(snap)["files"]
        if not files:
            raise ValueError("snapshot has no data files")
        return spark.read.parquet(*files)
