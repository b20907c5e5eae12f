"""Snapshot-table storage layer — the Iceberg stand-in (SURVEY.md §7).

The north rule stores everything in Iceberg tables; this sandbox has no
Iceberg runtime jar (network blocked), so ``SnapshotTable`` reproduces the
two Iceberg properties the pipeline actually relies on, over plain parquet:

* **atomic snapshot commit** — data files land first, then a manifest JSON
  naming exactly those files is written via tmp-file + ``os.replace``
  (atomic on POSIX). Readers resolve the latest manifest; a crash mid-write
  leaves no partially-visible data. This is the table-level analog of the
  reference's ``.tmp`` + ``ATOMIC_MOVE`` per chunk
  (``/root/reference/agent/.../DataPumpImpl.java:55-61``,
  ``/root/reference/server/.../LogServerController.java:122-128``).
* **incremental reads** — each manifest records its parent; the diff of two
  manifests' file lists is the set of files added between snapshots (the
  analog of the reference's directory watch / Iceberg's incremental scan).

On a real cluster the same call sites switch to
``df.writeTo(table).append()`` / snapshot-ref reads — the pipeline code
only sees this module's API.

Layout::

    <root>/data/<snapshot-uuid>/part-*.parquet     (one dir per commit)
    <root>/manifests/snap-00000001.json            (file list + lineage)
    <root>/manifests/CURRENT                       (atomic pointer file)

Driver-side filesystem ops only (a commit is O(#files) metadata, never
data movement); executors touch parquet exclusively.
"""

from __future__ import annotations

import glob
import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    def __init__(self, root: str) -> None:
        self.root = root
        self._manifest_dir = os.path.join(root, "manifests")

    # ---------------------------------------------------------- write path

    def commit(
        self,
        df: DataFrame,
        mode: str = "append",
        lineage: dict | None = None,
    ) -> int:
        """Write ``df`` as a new snapshot; returns the snapshot id.

        mode='append': new snapshot = parent files + new files.
        mode='overwrite': new snapshot = new files only (the table-state
        analog used by the checkpoint table).
        """
        os.makedirs(self._manifest_dir, exist_ok=True)
        data_dir = os.path.join(self.root, "data", uuid.uuid4().hex)
        df.write.mode("overwrite").parquet(data_dir)
        new_files = sorted(
            p for p in glob.glob(os.path.join(data_dir, "part-*"))
            if not p.endswith(".crc")
        )
        parent = self.current_snapshot()
        files = list(new_files)
        if mode == "append" and parent is not None:
            files = self._manifest(parent)["files"] + files
        snap_id = (parent or 0) + 1
        manifest = {
            "snapshot": snap_id,
            "parent": parent,
            "files": files,
            "added_files": new_files,
            "schema": df.schema.json(),
            "lineage": lineage or {},
        }
        self._write_atomic(
            os.path.join(self._manifest_dir, f"snap-{snap_id:08d}.json"),
            json.dumps(manifest),
        )
        self._write_atomic(
            os.path.join(self._manifest_dir, "CURRENT"), str(snap_id)
        )
        return snap_id

    @staticmethod
    def _write_atomic(path: str, content: str) -> None:
        tmp = path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(content)
        os.replace(tmp, path)  # atomic on POSIX — the commit point

    # ----------------------------------------------------------- read path

    def current_snapshot(self) -> int | None:
        try:
            with open(os.path.join(self._manifest_dir, "CURRENT")) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def _manifest(self, snap_id: int) -> dict:
        with open(
            os.path.join(self._manifest_dir, f"snap-{snap_id:08d}.json")
        ) as f:
            return json.load(f)

    def exists(self) -> bool:
        return self.current_snapshot() is not None

    def read(self, spark: SparkSession, snapshot: int | None = None) -> DataFrame:
        """Read the table as of ``snapshot`` (default: latest)."""
        snap = snapshot if snapshot is not None else self.current_snapshot()
        if snap is None:
            raise FileNotFoundError(f"no snapshot in {self.root}")
        files = self._manifest(snap)["files"]
        if not files:
            schema = self._manifest(snap)["schema"]
            return spark.createDataFrame([], schema=_schema_from_json(schema))
        return spark.read.parquet(*files)

    def read_incremental(
        self, spark: SparkSession, since: int | None
    ) -> DataFrame | None:
        """Rows added after snapshot ``since`` (None = everything).
        Returns None when nothing new."""
        current = self.current_snapshot()
        if current is None or (since is not None and current <= since):
            return None
        if since is None:
            return self.read(spark, current)
        old = set(self._manifest(since)["files"])
        files = [f for f in self._manifest(current)["files"] if f not in old]
        if not files:
            return None
        return spark.read.parquet(*files)

    def lineage(self, snapshot: int | None = None) -> dict:
        snap = snapshot if snapshot is not None else self.current_snapshot()
        return self._manifest(snap)["lineage"] if snap else {}


def _schema_from_json(schema_json: str):
    from pyspark.sql.types import StructType

    return StructType.fromJson(json.loads(schema_json))
