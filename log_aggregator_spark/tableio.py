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
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession

# Never-manifested data dirs younger than this survive orphan GC — they may
# be a concurrent commit's files awaiting its manifest CAS (Iceberg's
# remove_orphan_files uses the same 3-day default for the same race).
ORPHAN_MIN_AGE_SEC: float = 3 * 24 * 3600


class ConcurrentCommitError(RuntimeError):
    """Another committer already published this snapshot id. Iceberg's
    commit is an atomic compare-and-swap on the metadata pointer; the
    stand-in gets the same guarantee from O_CREAT|O_EXCL on the snapshot
    manifest — the LOSING writer fails loudly instead of silently
    clobbering the winner's snapshot (lost update)."""


def _create_exclusive(path: str, content: str) -> None:
    fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
    try:
        os.write(fd, content.encode())
    finally:
        os.close(fd)


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
        snap_path = os.path.join(self._manifest_dir, f"snap-{snap_id:08d}.json")
        try:
            # CAS: two committers racing from the same parent both target
            # snap_id — exactly one O_EXCL create wins; the loser must
            # re-read and retry (or fail), never silently drop the winner.
            _create_exclusive(snap_path, json.dumps(manifest))
        except FileExistsError as e:
            raise ConcurrentCommitError(
                f"snapshot {snap_id} already committed in {self.root}; "
                "re-read the table and retry"
            ) from e
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

    def incremental_files(self, since: int | None) -> list[str]:
        """The file list ``read_incremental(since)`` would scan — the
        manifest diff, for metadata-only consumers (lineage)."""
        current = self.current_snapshot()
        if current is None or (since is not None and current <= since):
            return []
        if since is None:
            return list(self._manifest(current)["files"])
        old = set(self._manifest(since)["files"])
        return [f for f in self._manifest(current)["files"] if f not in old]

    def lineage(self, snapshot: int | None = None) -> dict:
        snap = snapshot if snapshot is not None else self.current_snapshot()
        return self._manifest(snap)["lineage"] if snap else {}

    # ---------------------------------------------------- maintenance ops

    def compact(
        self, spark: SparkSession, target_file_mb: int = 128
    ) -> int:
        """Small-file compaction (Iceberg's ``rewrite_data_files`` analog):
        an append-per-run table accumulates one file set per commit, and at
        scale scan cost is dominated by file COUNT (open/footer/seek per
        file), not bytes. Rewrite the current row set into
        ~``target_file_mb``-sized files and commit it as an overwrite
        snapshot — readers switch atomically; history (and time travel to
        pre-compaction snapshots) is preserved until ``expire_snapshots``.
        ``coalesce`` (not ``repartition``) — compaction must not pay a
        shuffle."""
        cur = self.current_snapshot()
        if cur is None:
            raise FileNotFoundError(f"no snapshot in {self.root}")
        files = self._manifest(cur)["files"]
        total_bytes = sum(os.path.getsize(f) for f in files)
        n_out = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))
        df = self.read(spark).coalesce(n_out)
        return self.commit(
            df, mode="overwrite",
            lineage={**self.lineage(cur), "compacted_from": cur},
        )

    def expire_snapshots(
        self, keep_last: int = 2, orphan_min_age_sec: float = ORPHAN_MIN_AGE_SEC
    ) -> dict:
        """Iceberg's ``expire_snapshots`` + ``remove_orphan_files`` pair:
        drop manifests older than the newest ``keep_last`` snapshots, then
        delete every data file referenced by NO surviving manifest.
        CURRENT is untouched (always among the kept). Incremental
        reads/time travel older than the horizon stop working, exactly as
        in Iceberg. Returns {'expired': [...], 'deleted_files': n}.

        ``orphan_min_age_sec`` guards the concurrent-committer race
        (ADVICE r2): a live committer writes its data/<uuid> dirs BEFORE
        the manifest CAS, so a never-manifested dir younger than the
        threshold may be an in-flight commit, not a crash orphan — it is
        skipped (Iceberg's remove_orphan_files defaults to 3 days for
        exactly this). Dirs referenced only by the manifests being expired
        were committed and superseded — they delete regardless of age."""
        cur = self.current_snapshot()
        if cur is None:
            return {"expired": [], "deleted_files": 0}
        keep = set(range(max(1, cur - keep_last + 1), cur + 1))
        expired = []
        referenced: set[str] = set()
        expired_refs: set[str] = set()
        for path in sorted(glob.glob(os.path.join(self._manifest_dir, "snap-*.json"))):
            snap_id = int(os.path.basename(path)[5:13])
            if snap_id in keep:
                referenced.update(self._manifest(snap_id)["files"])
            else:
                expired_refs.update(self._manifest(snap_id)["files"])
                os.remove(path)
                expired.append(snap_id)
        deleted = _gc_data_dir(
            os.path.join(self.root, "data"), referenced, expired_refs,
            orphan_min_age_sec,
        )
        return {"expired": expired, "deleted_files": deleted}


def _gc_data_dir(
    data_root: str,
    referenced: set[str],
    expired_refs: set[str] = frozenset(),
    orphan_min_age_sec: float = ORPHAN_MIN_AGE_SEC,
) -> int:
    """Delete whole unreferenced commit dirs under ``data_root`` (every
    commit wrote exactly one ``data/<uuid>`` dir, so orphan granularity is
    the dir). A dir referenced only by expired manifests is settled history
    — deleted immediately; a dir referenced by NO manifest ever is deleted
    only past ``orphan_min_age_sec`` (it may belong to an in-flight
    concurrent commit — see expire_snapshots). Driver-side metadata-only
    walk."""
    import shutil
    import time as _time

    cutoff = _time.time() - orphan_min_age_sec
    deleted = 0
    for d in glob.glob(os.path.join(data_root, "*")):
        parts = [
            p for p in glob.glob(os.path.join(d, "part-*"))
            if not p.endswith(".crc")
        ]
        if parts and any(p in referenced for p in parts):
            continue
        was_manifested = any(p in expired_refs for p in parts)
        if not was_manifested:
            try:
                if os.path.getmtime(d) >= cutoff:
                    continue  # possible in-flight commit — too young to GC
            except OSError:
                continue
        deleted += len(parts)
        shutil.rmtree(d, ignore_errors=True)
    return deleted


def _schema_from_json(schema_json: str):
    from pyspark.sql.types import StructType

    return StructType.fromJson(json.loads(schema_json))


class IcebergTable:
    """The real-Iceberg backend the north rule names — the same
    commit/read/read_incremental/lineage surface as ``SnapshotTable``, over
    a catalog table via the public Iceberg–Spark integration (DataFrame
    ``writeTo`` V2 API + the ``.snapshots`` metadata table + incremental
    reads with ``start-snapshot-id``/``end-snapshot-id``).

    Requirements (a real deployment, not this sandbox — no network, no
    runtime jar): the ``iceberg-spark-runtime`` jar on the classpath and a
    catalog configured, e.g.::

        spark.sql.catalog.lake = org.apache.iceberg.spark.SparkCatalog
        spark.sql.catalog.lake.type = hadoop      # or hive/rest
        spark.sql.catalog.lake.warehouse = s3://.../warehouse

    Construction performs a capability check and fails with these
    instructions when the runtime is absent, so the switch is a flipped
    constructor (``IcebergTable(spark, "lake.db.routed")`` in place of
    ``SnapshotTable(path)``), not a rewrite."""

    def __init__(self, spark: SparkSession, name: str) -> None:
        if not self.available(spark):
            raise RuntimeError(
                "Iceberg runtime not on the classpath: add the "
                "iceberg-spark-runtime jar and a spark.sql.catalog.<name> "
                "configuration (see IcebergTable docstring), or use the "
                "SnapshotTable parquet backend"
            )
        self.spark = spark
        self.name = name

    @staticmethod
    def available(spark: SparkSession) -> bool:
        try:
            spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
                "org.apache.iceberg.spark.SparkCatalog"
            )
            return True
        except Exception:
            return False

    # same surface as SnapshotTable ---------------------------------------

    def commit(self, df: DataFrame, mode: str = "append", lineage: dict | None = None) -> int:
        w = df.writeTo(self.name)
        if mode == "append":
            w.append()
        else:
            w.createOrReplace()
        if lineage:
            props = ", ".join(
                f"'lineage.{k}'='{v}'" for k, v in lineage.items()
            )
            self.spark.sql(f"ALTER TABLE {self.name} SET TBLPROPERTIES ({props})")
        return self.current_snapshot() or 0

    def current_snapshot(self) -> int | None:
        rows = self.spark.sql(
            f"SELECT snapshot_id FROM {self.name}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return int(rows[0][0]) if rows else None

    def exists(self) -> bool:
        return self.spark.catalog.tableExists(self.name)

    def read(self, spark: SparkSession, snapshot: int | None = None) -> DataFrame:
        r = spark.read.format("iceberg")
        if snapshot is not None:
            r = r.option("snapshot-id", str(snapshot))
        return r.load(self.name)

    def read_incremental(self, spark: SparkSession, since: int | None) -> DataFrame | None:
        current = self.current_snapshot()
        if current is None or current == since:
            return None
        if since is None:
            return self.read(spark, current)
        return (
            spark.read.format("iceberg")
            .option("start-snapshot-id", str(since))
            .option("end-snapshot-id", str(current))
            .load(self.name)
        )

    def lineage(self, snapshot: int | None = None) -> dict:
        props = {
            r["key"]: r["value"]
            for r in self.spark.sql(f"SHOW TBLPROPERTIES {self.name}").collect()
        }
        return {
            k[len("lineage."):]: v
            for k, v in props.items()
            if k.startswith("lineage.")
        }

    # ------------------------------------------------------ maintenance ops
    # Same surface as SnapshotTable.compact/expire_snapshots so the
    # backend-parameterized contract suite (tests/test_storage_contract.py)
    # exercises maintenance uniformly — here they delegate to Iceberg's own
    # procedures, which is how a real deployment runs them.

    def compact(self, spark: SparkSession, target_file_mb: int = 128) -> int:
        """Iceberg's ``rewrite_data_files`` procedure (the engine-native
        form of SnapshotTable.compact)."""
        catalog = self.name.split(".", 1)[0]
        spark.sql(
            f"CALL {catalog}.system.rewrite_data_files("
            f"table => '{self.name}', "
            f"options => map('target-file-size-bytes', "
            f"'{target_file_mb * 1024 * 1024}'))"
        )
        return self.current_snapshot() or 0

    def expire_snapshots(
        self, keep_last: int = 2, orphan_min_age_sec: float = ORPHAN_MIN_AGE_SEC
    ) -> dict:
        """Iceberg's ``expire_snapshots`` + ``remove_orphan_files`` pair —
        the engine-native form of SnapshotTable.expire_snapshots (which
        documents the same min-age orphan guard Iceberg defaults to)."""
        import datetime

        catalog = self.name.split(".", 1)[0]
        expired = self.spark.sql(
            f"CALL {catalog}.system.expire_snapshots("
            f"table => '{self.name}', retain_last => {keep_last})"
        ).collect()
        cutoff = datetime.datetime.now(datetime.timezone.utc) - datetime.timedelta(
            seconds=orphan_min_age_sec
        )
        orphans = self.spark.sql(
            f"CALL {catalog}.system.remove_orphan_files("
            f"table => '{self.name}', "
            f"older_than => TIMESTAMP '{cutoff:%Y-%m-%d %H:%M:%S}')"
        ).collect()
        return {"expired": [r[0] for r in expired], "deleted_files": len(orphans)}


class GroupMember:
    """Read-side handle for one table inside a :class:`TableGroup` — the
    same read/exists/lineage surface as a standalone SnapshotTable, so
    callers don't care whether a table commits alone or transactionally
    with its siblings."""

    def __init__(self, group: "TableGroup", name: str) -> None:
        self._group = group
        self.name = name

    def read(self, spark: SparkSession, snapshot: int | None = None) -> DataFrame:
        return self._group.read_member(spark, self.name, snapshot)

    def exists(self) -> bool:
        return self._group.member_exists(self.name)

    def lineage(self, snapshot: int | None = None) -> dict:
        return self._group.lineage(snapshot)


class TableGroup:
    """Atomic MULTI-table commit: one manifest names the complete file
    lists of every member table, one CURRENT pointer swap makes them all
    visible together.

    This closes the duplicate-append crash window the per-table design had
    (routed appended, then crash before the checkpoint overwrite → retry
    re-appends; the reference has the same window between payload append
    and its ``.lastSeq`` write, ``DataPumpDecoderSort.java:48-51``). With
    one commit there IS no between: a crash anywhere before the swap
    leaves the previous snapshot fully visible (orphaned data dirs are
    inert garbage — exactly Iceberg's orphan-file model), and the retry
    reprocesses the same input once.

    Manifest layout: ``{"snapshot": N, "parent": P, "tables": {name:
    {"files": [...], "added_files": [...], "schema": ...}}, "lineage":
    {...}}``; per-member append/overwrite semantics match SnapshotTable;
    the snap file is O_EXCL-created (CAS, see ConcurrentCommitError)."""

    def __init__(self, root: str) -> None:
        self.root = root
        self._manifest_dir = os.path.join(root, "manifests")

    # ---------------------------------------------------------- write path

    def commit(
        self,
        tables: dict[str, tuple[DataFrame, str]],
        lineage: dict | None = None,
    ) -> int:
        """tables: name → (df, mode) with mode in {'append', 'overwrite'}.
        Members absent from ``tables`` carry forward unchanged. Returns the
        new snapshot id; nothing is visible until the single CURRENT swap
        at the end."""
        os.makedirs(self._manifest_dir, exist_ok=True)
        parent = self.current_snapshot()
        parent_tables = self._manifest(parent)["tables"] if parent else {}

        # Member writes are independent Spark jobs over disjoint data dirs;
        # submit them from driver threads so the scheduler overlaps them
        # (a group commit otherwise pays #members × job latency serially —
        # the dominant per-micro-batch floor in the streaming dedup fold).
        # The manifest is assembled after ALL writes complete, in the
        # caller's member order, so concurrency never reaches visibility:
        # the single CURRENT swap below still publishes all-or-nothing.
        def _write(item: tuple[str, tuple[DataFrame, str]]) -> tuple[str, dict]:
            name, (df, mode) = item
            data_dir = os.path.join(self.root, "data", uuid.uuid4().hex)
            df.write.mode("overwrite").parquet(data_dir)
            new_files = sorted(
                p for p in glob.glob(os.path.join(data_dir, "part-*"))
                if not p.endswith(".crc")
            )
            files = list(new_files)
            if mode == "append" and name in parent_tables:
                files = parent_tables[name]["files"] + files
            return name, {
                "files": files,
                "added_files": new_files,
                "schema": df.schema.json(),
            }

        items = list(tables.items())
        if not items:
            # Carry-forward-only commit (e.g. compact() found every named
            # member empty): still publish a snapshot, like the serial loop
            # this threaded form replaced — ThreadPoolExecutor(0) would raise.
            entries: dict[str, dict] = {}
        elif len(items) == 1:
            entries = dict([_write(items[0])])
        else:
            with ThreadPoolExecutor(max_workers=len(items)) as pool:
                entries = dict(pool.map(_write, items))
        for name, t in parent_tables.items():
            if name not in entries:
                entries[name] = {**t, "added_files": []}

        snap_id = (parent or 0) + 1
        manifest = {
            "snapshot": snap_id,
            "parent": parent,
            "tables": entries,
            "lineage": lineage or {},
        }
        self._publish(snap_id, manifest)
        return snap_id

    def _publish(self, snap_id: int, manifest: dict) -> None:
        """The commit point: CAS-create the snap manifest, then swap
        CURRENT. Split out so crash-injection tests can kill the job right
        before visibility."""
        snap_path = os.path.join(self._manifest_dir, f"snap-{snap_id:08d}.json")
        try:
            _create_exclusive(snap_path, json.dumps(manifest))
        except FileExistsError as e:
            raise ConcurrentCommitError(
                f"snapshot {snap_id} already committed in {self.root}; "
                "re-read the group and retry"
            ) from e
        SnapshotTable._write_atomic(
            os.path.join(self._manifest_dir, "CURRENT"), str(snap_id)
        )

    # ----------------------------------------------------------- read path

    def table(self, name: str) -> GroupMember:
        return GroupMember(self, name)

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

    def member_exists(self, name: str) -> bool:
        snap = self.current_snapshot()
        return snap is not None and name in self._manifest(snap)["tables"]

    def read_member(
        self, spark: SparkSession, name: str, snapshot: int | None = None
    ) -> DataFrame:
        snap = snapshot if snapshot is not None else self.current_snapshot()
        if snap is None:
            raise FileNotFoundError(f"no snapshot in {self.root}")
        entry = self._manifest(snap)["tables"][name]
        if not entry["files"]:
            return spark.createDataFrame(
                [], schema=_schema_from_json(entry["schema"])
            )
        return spark.read.parquet(*entry["files"])

    def lineage(self, snapshot: int | None = None) -> dict:
        snap = snapshot if snapshot is not None else self.current_snapshot()
        return self._manifest(snap)["lineage"] if snap else {}

    # ---------------------------------------------------- maintenance ops

    def compact(
        self,
        spark: SparkSession,
        names: list[str] | None = None,
        target_file_mb: int = 128,
    ) -> int:
        """Small-file compaction for append-heavy members (the routed and
        metrics tables gain one file set per run): rewrite each named
        member's rows into ~target_file_mb files (coalesce, no shuffle) and
        publish ONE new group snapshot; untouched members carry forward.
        See SnapshotTable.compact for the rationale."""
        cur = self.current_snapshot()
        if cur is None:
            raise FileNotFoundError(f"no snapshot in {self.root}")
        entries = self._manifest(cur)["tables"]
        names = names if names is not None else list(entries)
        dfs: dict[str, tuple[DataFrame, str]] = {}
        for n in names:
            files = entries[n]["files"]
            if not files:
                continue
            total = sum(os.path.getsize(f) for f in files)
            n_out = max(1, round(total / (target_file_mb * 1024 * 1024)))
            dfs[n] = (self.read_member(spark, n).coalesce(n_out), "overwrite")
        return self.commit(
            dfs, lineage={**self.lineage(cur), "compacted_from": cur}
        )

    def expire_snapshots(
        self, keep_last: int = 2, orphan_min_age_sec: float | None = None
    ) -> dict:
        """Expire group manifests older than the newest ``keep_last`` and
        GC every data dir referenced by no surviving manifest. Crash
        orphans (never-manifested dirs) are deleted only past the min-age
        guard — see SnapshotTable.expire_snapshots for the concurrent-
        committer race this protects."""
        if orphan_min_age_sec is None:
            orphan_min_age_sec = ORPHAN_MIN_AGE_SEC
        cur = self.current_snapshot()
        if cur is None:
            return {"expired": [], "deleted_files": 0}
        keep = set(range(max(1, cur - keep_last + 1), cur + 1))
        expired = []
        referenced: set[str] = set()
        expired_refs: set[str] = set()
        for path in sorted(glob.glob(os.path.join(self._manifest_dir, "snap-*.json"))):
            snap_id = int(os.path.basename(path)[5:13])
            if snap_id in keep:
                for entry in self._manifest(snap_id)["tables"].values():
                    referenced.update(entry["files"])
            else:
                for entry in self._manifest(snap_id)["tables"].values():
                    expired_refs.update(entry["files"])
                os.remove(path)
                expired.append(snap_id)
        deleted = _gc_data_dir(
            os.path.join(self.root, "data"), referenced, expired_refs,
            orphan_min_age_sec,
        )
        return {"expired": expired, "deleted_files": deleted}


# ---------------------------------------------------------- bucketed layout


def write_bucketed(
    df,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
    sort_cols: tuple[str, ...] = (),
) -> None:
    """Persist ``df`` in Spark's bucketed managed-table layout (the
    warehouse analog of an Iceberg ``bucket(N, col)`` partition transform):
    rows are hash-distributed into ``n_buckets`` files by ``bucket_col``
    and optionally sorted within each bucket.

    Why it matters at 100 TB: a table bucketed on its join/agg key carries
    its partitioning IN THE LAYOUT — every downstream
    join-on-key against another table bucketed the same way, and every
    groupBy(key), plans with ZERO shuffle Exchange (Catalyst reads the
    bucket spec from the catalog and reuses the distribution; with
    ``sort_cols`` the sort-merge join's sort disappears too). For the
    routed corpus re-read by doc_id-keyed consumers (dedup, packing,
    resume audits), bucketing converts the biggest recurring shuffle into
    a plain co-located scan. ``tests/test_bucketing.py`` asserts the
    shuffle-free plans.
    """
    w = df.write.format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.mode("overwrite").saveAsTable(table_name)
