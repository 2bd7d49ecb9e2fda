"""Replace sink, snapshot expiration / orphan-file vacuum, and
concurrent-writer compare-and-swap (round-2 lake lifecycle features)."""

import glob
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ds_floodexposure_monitoring_spark.operators.merge import merge_into
from ds_floodexposure_monitoring_spark.sources.lake import CommitConflictError, LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)


def _batch(spark, rows):
    return spark.createDataFrame(
        [(c, t, x, lsn) for (c, t, x, lsn) in rows],
        "conv_id string, turn_idx int, text string, lsn long",
    )


def _data_files(t):
    return sorted(glob.glob(os.path.join(t.path, "data", "**", "*.parquet"), recursive=True))


def test_replace_swaps_contents_wholesale(spark, tmpdir_path):
    t = LakeTable.create(spark, f"{tmpdir_path}/t", SCHEMA, n_buckets=4)
    merge_into(t, _batch(spark, [("a", 0, "old", 1), ("b", 0, "old", 2)]))
    t.replace(
        spark.createDataFrame([("c", 0, "new")], "conv_id string, turn_idx int, text string")
    )
    got = [(r.conv_id, r.text) for r in t.scan().collect()]
    assert got == [("c", "new")]
    # previous snapshot still readable until expired (time travel)
    old = {r.conv_id for r in t.scan(version=t.version - 1).collect()}
    assert old == {"a", "b"}


def test_replace_requires_merge_keys(spark, tmpdir_path):
    t = LakeTable.create(spark, f"{tmpdir_path}/t", SCHEMA, n_buckets=4)
    with pytest.raises(ValueError, match="merge key"):
        t.replace(spark.createDataFrame([("x",)], "text string"))


def test_expire_snapshots_deletes_replaced_files_keeps_retention(spark, tmpdir_path):
    t = LakeTable.create(spark, f"{tmpdir_path}/t", SCHEMA, n_buckets=4)
    merge_into(t, _batch(spark, [("a", 0, "v1", 1)]))
    merge_into(t, _batch(spark, [("a", 0, "v2", 2)]))  # rewrites a's file
    merge_into(t, _batch(spark, [("a", 0, "v3", 3)]))
    n_before = len(_data_files(t))
    live = {f.path for f in t.files()}
    report = t.expire_snapshots(keep_last=2)
    assert report["expired_snapshots"] > 0 and report["deleted_files"] > 0
    # every surviving physical file is referenced by a retained snapshot
    survivors = {os.path.relpath(p, t.path) for p in _data_files(t)}
    retained_refs = {
        d["path"] for s in t.snapshots() for d in s["files"]
    }
    assert survivors == retained_refs
    assert live <= survivors  # HEAD untouched
    assert len(_data_files(t)) < n_before
    # time travel within retention still works...
    assert [r.text for r in t.scan(version=t.version - 1).collect()] == ["v2"]
    assert [r.text for r in t.scan().collect()] == ["v3"]
    # ...and expired versions are gone
    with pytest.raises(FileNotFoundError):
        t.snapshot(1)


def test_vacuum_removes_orphans_from_failed_writes(spark, tmpdir_path):
    t = LakeTable.create(spark, f"{tmpdir_path}/t", SCHEMA, n_buckets=4)
    merge_into(t, _batch(spark, [("a", 0, "v1", 1)]))
    orphan_dir = os.path.join(t.path, "data", "cdeadbeef0000", "b=0")
    os.makedirs(orphan_dir)
    orphan = os.path.join(orphan_dir, "part-junk.parquet")
    with open(orphan, "w") as f:
        f.write("not really parquet")  # uncommitted write debris
    t.expire_snapshots(keep_last=1)
    assert not os.path.exists(orphan)
    assert [r.text for r in t.scan().collect()] == ["v1"]


def test_orphan_grace_period_spares_young_files(spark, tmpdir_path):
    t = LakeTable.create(spark, f"{tmpdir_path}/t", SCHEMA, n_buckets=4)
    merge_into(t, _batch(spark, [("a", 0, "v1", 1)]))
    orphan = os.path.join(t.path, "data", "fresh.parquet")
    with open(orphan, "w") as f:
        f.write("in-flight write")
    t.expire_snapshots(keep_last=1, orphan_grace_sec=3600)
    assert os.path.exists(orphan)  # might belong to a concurrent writer


def test_concurrent_writers_cas_loser_retries(spark, tmpdir_path):
    path = f"{tmpdir_path}/t"
    a = LakeTable.create(spark, path, SCHEMA, n_buckets=4)
    b = LakeTable.load(spark, path)
    v0 = a.version
    assert b.version == v0

    # writer A wins
    merge_into(a, _batch(spark, [("a", 0, "from-a", 1)]))
    # writer B planned against v0 -> its commit must be rejected
    with pytest.raises(CommitConflictError):
        b.commit(set(), [], operation="test", expected_parent_version=v0)
    # clean retry after reload: B re-reads HEAD and merges on top
    merge_into(b, _batch(spark, [("b", 0, "from-b", 2)]))
    got = {r.conv_id: r.text for r in a.scan().collect()}
    assert got == {"a": "from-a", "b": "from-b"}


def test_raw_snapshot_race_exactly_one_winner(spark, tmpdir_path):
    """Even two commits planned against the same version (no
    expected_parent_version passed) cannot both win: the exclusive
    snapshot-file create arbitrates."""
    path = f"{tmpdir_path}/t"
    a = LakeTable.create(spark, path, SCHEMA, n_buckets=4)
    b = LakeTable.load(spark, path)
    a.current(), b.current()  # both plan against v1
    a.commit(set(), [], operation="test-a")
    # force b to build the same next version number from its stale head
    b._head = b.snapshot(1)
    with pytest.raises(CommitConflictError):
        b._write_snapshot({**b.snapshot(1), "version": 2})
