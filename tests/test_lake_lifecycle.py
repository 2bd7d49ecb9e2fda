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


# ---------------------------------------------------------- change feed


def _feed(t, v0, v1):
    return {
        (r.conv_id, r.turn_idx): (r.change_type, r.text, r.change_lsn)
        for r in t.scan_changes(v0, v1).collect()
    }


def test_scan_changes_insert_update_delete(spark, tmpdir_path):
    from ds_floodexposure_monitoring_spark.operators.compact import merge_append

    t = LakeTable.create(spark, f"{tmpdir_path}/t", SCHEMA, n_buckets=4)
    merge_append(t, _batch(spark, [("a", 0, "a0", 1), ("b", 0, "b0", 2), ("c", 0, "c0", 3)]))
    v1 = t.version

    df = spark.createDataFrame(
        [("a", 0, "a1", 10, "U"), ("d", 0, "d0", 11, "I"), ("c", 0, None, 12, "D")],
        "conv_id string, turn_idx int, text string, lsn long, op string",
    )
    merge_append(t, df, op_col="op")
    v2 = t.version

    feed = _feed(t, v1, v2)
    assert feed == {
        ("a", 0): ("update", "a1", 10),
        ("d", 0): ("insert", "d0", 11),
        ("c", 0): ("delete", "c0", 12),  # pre-image payload, tombstone LSN
    }
    # unchanged key 'b' absent; full-window feed sees d/a/b as inserts
    assert ("b", 0) not in feed
    full = _feed(t, 1, v2)
    assert full[("b", 0)] == ("insert", "b0", 2)
    assert full[("a", 0)] == ("insert", "a1", 10)
    assert ("c", 0) not in full  # dead at both ends -> no change


def test_scan_changes_compaction_is_silent(spark, tmpdir_path):
    from ds_floodexposure_monitoring_spark.operators.compact import compact, merge_append

    t = LakeTable.create(spark, f"{tmpdir_path}/t", SCHEMA, n_buckets=2)
    merge_append(t, _batch(spark, [("a", 0, "a0", 1), ("b", 0, "b0", 2)]))
    merge_append(t, _batch(spark, [("a", 0, "a1", 3)]))
    v_before = t.version
    assert compact(t, min_files_per_bucket=1) is not None
    # pure rewrite: feed across the compaction commit is empty
    assert _feed(t, v_before, t.version) == {}


def test_scan_changes_out_of_order_lsn_not_reported(spark, tmpdir_path):
    """A later batch whose row LOSES LWW to the base (stale cross-batch
    delivery) must not appear in the feed — snapshot diff, not log tail."""
    from ds_floodexposure_monitoring_spark.operators.compact import merge_append

    t = LakeTable.create(spark, f"{tmpdir_path}/t", SCHEMA, n_buckets=2)
    merge_append(t, _batch(spark, [("a", 0, "fresh", 100)]))
    v1 = t.version
    merge_append(t, _batch(spark, [("a", 0, "stale", 50), ("b", 0, "new", 51)]))
    feed = _feed(t, v1, t.version)
    assert feed == {("b", 0): ("insert", "new", 51)}


def test_scan_changes_across_schema_evolution(spark, tmpdir_path):
    from ds_floodexposure_monitoring_spark.operators.compact import merge_append

    t = LakeTable.create(spark, f"{tmpdir_path}/t", SCHEMA, n_buckets=2)
    merge_append(t, _batch(spark, [("a", 0, "a0", 1)]))
    v1 = t.version
    df = spark.createDataFrame(
        [("b", 0, "b0", "gpt", 2)],
        "conv_id string, turn_idx int, text string, model string, lsn long",
    )
    merge_append(t, df)
    rows = {(r.conv_id): (r.change_type, r.model) for r in t.scan_changes(v1).collect()}
    assert rows == {"b": ("insert", "gpt")}  # old side aligned to new schema


# ---------------------------------------------------------- point lookup


def test_lookup_prunes_files_and_matches_scan(spark, tmpdir_path):
    from ds_floodexposure_monitoring_spark.operators.compact import merge_append

    t = LakeTable.create(spark, f"{tmpdir_path}/t", SCHEMA, n_buckets=8)
    rows = [(f"conv{i}", j, f"t{i}-{j}", i * 100 + j) for i in range(40) for j in range(3)]
    merge_append(t, _batch(spark, rows))
    merge_append(t, _batch(spark, [("conv7", 0, "updated", 99_999)]))

    flist = t.prune_for_keys(["conv7"])
    assert 1 <= len(flist) < len(t.files())  # metadata pruning really pruned
    got = sorted((r.conv_id, r.turn_idx, r.text) for r in t.lookup(["conv7"]).collect())
    want = sorted(
        (r.conv_id, r.turn_idx, r.text)
        for r in t.scan().where(F.col("conv_id") == "conv7").collect()
    )
    assert got == want and got[0][2] == "updated"

    # multi-key lookup spanning buckets
    many = t.lookup(["conv3", "conv19"]).collect()
    assert {r.conv_id for r in many} == {"conv3", "conv19"}


def test_compaction_sorts_files_by_merge_key(spark, tmpdir_path):
    import glob as _glob

    import pyarrow.parquet as pq

    from ds_floodexposure_monitoring_spark.operators.compact import compact, merge_append

    t = LakeTable.create(spark, f"{tmpdir_path}/t", SCHEMA, n_buckets=2)
    rows = [(f"c{i:03d}", j, "x", i * 10 + j) for i in range(50) for j in range(2)]
    merge_append(t, _batch(spark, rows))
    merge_append(t, _batch(spark, [("c000", 1, "y", 10_000)]))
    assert compact(t, min_files_per_bucket=1) is not None
    for p in _glob.glob(f"{t.path}/data/**/*.parquet", recursive=True):
        rel = p.replace(t.path + "/", "")
        if rel not in {f.path for f in t.files()}:
            continue
        tb = pq.read_table(p, columns=["conv_id", "turn_idx"]).to_pydict()
        pairs = list(zip(tb["conv_id"], tb["turn_idx"]))
        assert pairs == sorted(pairs), f"{rel} not key-sorted"


