"""Time travel / versioning over plain parquet tables: snapshots are
hard-link footprints (zero data copy), readable as ordinary parquet;
restore is an undoable mutation; vacuum unlinks only the dropped
snapshot's references."""

from __future__ import annotations

import os

from pyspark.sql import Row

from prisma_migrator_spark.writers.upsert import (
    _part_files,
    upsert_parquet_cow,
)
from prisma_migrator_spark.writers.versioning import (
    list_versions,
    read_version,
    restore_version,
    snapshot_version,
    vacuum_versions,
    version_diff,
)


def _table(spark, path, n=400, files=4):
    spark.createDataFrame(
        [Row(k=i, v=f"v{i}", ts=10) for i in range(n)]
    ).repartitionByRange(files, "k").write.mode("overwrite").parquet(path)


def _contents(spark, path):
    return {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}


def test_snapshot_is_zero_copy_and_time_travels(spark, tmp_path):
    path = str(tmp_path / "t.parquet")
    _table(spark, path)
    v0_expect = _contents(spark, path)

    n = snapshot_version(path, note="before first merge")
    assert n == 0
    # zero copy: every snapshot file shares its inode with the
    # original — no data was read or written
    originals = {os.path.basename(f): os.stat(f).st_ino for f in _part_files(path)}
    vdir = path + ".versions/v0"
    for f in _part_files(vdir):
        assert os.stat(f).st_ino == originals[os.path.basename(f)]

    batch = spark.createDataFrame(
        [Row(k=5, v="UPD", ts=20), Row(k=9999, v="new", ts=20)]
    )
    upsert_parquet_cow(spark, batch, path, ["k"])

    # current moved on; v0 still reads the pre-merge table
    assert _contents(spark, path)[5] == "UPD"
    old = {r["k"]: r["v"] for r in read_version(spark, path, 0).collect()}
    assert old == v0_expect

    meta = list_versions(path)
    assert meta[0]["version"] == 0
    assert meta[0]["note"] == "before first merge"
    assert meta[0]["n_files"] == 4


def test_version_diff_classifies_changes(spark, tmp_path):
    path = str(tmp_path / "t.parquet")
    _table(spark, path, n=10, files=2)
    snapshot_version(path)

    from prisma_migrator_spark.writers.upsert import delete_keys_cow

    upsert_parquet_cow(
        spark,
        spark.createDataFrame([Row(k=3, v="CH", ts=20), Row(k=100, v="n", ts=20)]),
        path,
        ["k"],
    )
    delete_keys_cow(spark, spark.createDataFrame([Row(k=7)]), path, ["k"])

    diff = {
        (r["k"], r["change_type"])
        for r in version_diff(spark, path, 0, None, ["k"]).collect()
    }
    assert diff == {(3, "changed"), (100, "added"), (7, "removed")}


def test_restore_is_undoable(spark, tmp_path):
    path = str(tmp_path / "t.parquet")
    _table(spark, path, n=50, files=2)
    v0_expect = _contents(spark, path)
    snapshot_version(path)

    upsert_parquet_cow(
        spark, spark.createDataFrame([Row(k=1, v="X", ts=2)]), path, ["k"]
    )
    changed = _contents(spark, path)
    assert changed[1] == "X"

    rep = restore_version(spark, path, 0)
    assert rep["restored_version"] == 0
    assert _contents(spark, path) == v0_expect

    # the pre-restore state was snapshotted: restoring THAT undoes
    # the restore — history is linear, nothing is lost
    back = restore_version(spark, path, rep["pre_restore_version"])
    assert _contents(spark, path) == changed
    assert back["pre_restore_version"] > rep["pre_restore_version"]


def test_vacuum_keeps_newest_and_current_survives(spark, tmp_path):
    path = str(tmp_path / "t.parquet")
    _table(spark, path, n=30, files=2)
    for i in range(4):
        snapshot_version(path, note=f"s{i}")
        upsert_parquet_cow(
            spark,
            spark.createDataFrame([Row(k=i, v=f"u{i}", ts=i)]),
            path,
            ["k"],
        )

    rep = vacuum_versions(path, keep_last=2)
    assert rep["removed"] == [0, 1] and rep["kept"] == [2, 3]
    assert [m["version"] for m in list_versions(path)] == [2, 3]

    # shared inodes: vacuum dropped v0/v1 references only — the
    # current table and the kept snapshots still read fine
    assert len(_contents(spark, path)) == 30
    assert len(read_version(spark, path, 2).collect()) == 30
