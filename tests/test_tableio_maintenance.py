"""Storage maintenance: small-file compaction + snapshot expiry / orphan GC
(the Iceberg rewrite_data_files / expire_snapshots / remove_orphan_files
trio, on the stand-in)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from log_aggregator_spark.tableio import SnapshotTable, TableGroup


def _n_data_files(root):
    return len([
        p for p in glob.glob(os.path.join(root, "data", "*", "part-*"))
        if not p.endswith(".crc")
    ])


def test_compact_reduces_files_preserves_rows(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    for i in range(5):
        t.commit(spark.range(i * 10, (i + 1) * 10).repartition(4)
                 .select(F.col("id").alias("x")))
    assert t.current_snapshot() == 5
    before_files = len(t._manifest(5)["files"])
    assert before_files >= 20  # 5 commits × 4 files

    snap = t.compact(spark)
    assert snap == 6
    after_files = len(t._manifest(6)["files"])
    assert after_files < before_files
    assert sorted(r["x"] for r in t.read(spark).collect()) == list(range(50))
    # history preserved until expiry: time travel to pre-compaction works
    assert t.read(spark, snapshot=5).count() == 50
    assert t.lineage()["compacted_from"] == 5


def test_expire_snapshots_gc_orphans(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    for i in range(4):
        t.commit(spark.range(i * 5, (i + 1) * 5).select(F.col("id").alias("x")))
    t.compact(spark)  # snapshot 5: fresh file set; 1-4 now redundant history

    # fake a crash orphan: a data dir never referenced by any manifest
    orphan = os.path.join(str(tmp_path / "t"), "data", "deadbeef")
    os.makedirs(orphan)
    open(os.path.join(orphan, "part-00000-crash.parquet"), "wb").write(b"x")

    res = t.expire_snapshots(keep_last=1)
    assert res["expired"] == [1, 2, 3, 4]
    assert res["deleted_files"] > 0
    # min-age guard (ADVICE r2): the FRESH never-manifested dir survives —
    # it is indistinguishable from a concurrent commit's pre-CAS files
    assert os.path.exists(orphan)
    # past the age threshold it is a true crash orphan and goes
    res2 = t.expire_snapshots(keep_last=1, orphan_min_age_sec=0)
    assert res2["deleted_files"] == 1
    assert not os.path.exists(orphan)
    # current snapshot intact and readable
    assert sorted(r["x"] for r in t.read(spark).collect()) == list(range(20))
    # only the kept snapshot's files remain on disk
    assert _n_data_files(str(tmp_path / "t")) == len(t._manifest(5)["files"])
    # time travel past the horizon is gone, loudly
    with pytest.raises(FileNotFoundError):
        t._manifest(2)


def test_group_compact_and_expire(spark, tmp_path):
    g = TableGroup(str(tmp_path / "g"))
    for i in range(3):
        g.commit({
            "routed": (spark.range(i * 10, (i + 1) * 10)
                       .repartition(3).select(F.col("id").alias("x")), "append"),
            "ckpt": (spark.range(5).select(F.col("id").alias("y")), "overwrite"),
        })
    routed_files = len(g._manifest(3)["tables"]["routed"]["files"])
    assert routed_files == 9

    snap = g.compact(spark, names=["routed"])
    assert snap == 4
    assert len(g._manifest(4)["tables"]["routed"]["files"]) < routed_files
    # untouched member carried forward identically
    assert g._manifest(4)["tables"]["ckpt"]["files"] == g._manifest(3)["tables"]["ckpt"]["files"]
    assert sorted(r["x"] for r in g.table("routed").read(spark).collect()) == list(range(30))

    res = g.expire_snapshots(keep_last=1)
    assert res["expired"] == [1, 2, 3]
    assert sorted(r["x"] for r in g.table("routed").read(spark).collect()) == list(range(30))
    assert g.table("ckpt").read(spark).count() == 5


def test_group_empty_commit_is_carry_forward(spark, tmp_path):
    """commit({}) publishes a snapshot with every member carried forward —
    reachable via compact() when every named member is empty (e.g. right
    after compact_clusters emptied the label remap); the threaded write
    pool must not choke on zero items."""
    g = TableGroup(str(tmp_path / "g"))
    g.commit({
        "labels": (spark.range(5).select(F.col("id").alias("x")), "append"),
        "remap": (
            spark.createDataFrame([], schema="old_label long, new_label long"),
            "overwrite",
        ),
    })
    snap = g.compact(spark, names=["remap"])  # empty member -> zero writes
    assert snap == 2
    assert g._manifest(2)["tables"]["labels"]["files"] == g._manifest(1)["tables"]["labels"]["files"]
    assert g.read_member(spark, "remap").count() == 0
    assert g.commit({}) == 3  # pure carry-forward commit
    assert g.table("labels").read(spark).count() == 5
