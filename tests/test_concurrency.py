"""Optimistic-concurrency commit retry (LakeTable.commit_retrying):
a lost commit race revalidates against the new HEAD and retries the
metadata commit alone — no data recompute — exactly like Iceberg's
SnapshotProducer retry loop. Conflicts a retry cannot prove safe
(overlapping buckets, schema races, rewritten inputs) raise
CommitConflictError and leave the table consistent at the winner's
state. (The reference runs one cron process per pipeline and has no
concurrent-writer story at all.)"""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from ds_floodexposure_monitoring_spark.datagen.transcripts import transcript_schema
from ds_floodexposure_monitoring_spark.operators.compact import (
    compact,
    merge_append,
)
from ds_floodexposure_monitoring_spark.sources.lake import (
    CommitConflictError,
    LakeTable,
)

DDL = "lsn long, conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def _batch(spark, lo, n, tag):
    rows = [
        (lo + i, f"c{(lo + i) % 40:03d}", (lo + i) % 7, "user",
         f"{tag}-{lo + i}", None,
         dt.datetime(2024, 1, 1) + dt.timedelta(minutes=lo + i))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, DDL)


def _inject_before_first_commit(monkeypatch, trigger_op, intruder):
    """Monkeypatch LakeTable.commit so the first commit whose operation
    matches ``trigger_op`` runs ``intruder()`` first — a concurrent
    writer landing between plan time and commit time, the real race
    window."""
    real = LakeTable.commit
    state = {"armed": True}

    def racing(self, removed_paths, added_files, **kwargs):
        if state["armed"] and kwargs.get("operation") == trigger_op:
            state["armed"] = False
            intruder()
        return real(self, removed_paths, added_files, **kwargs)

    monkeypatch.setattr(LakeTable, "commit", racing)


def test_append_retries_past_concurrent_append(spark, tmpdir_path, monkeypatch):
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "a"), transcript_schema(), n_buckets=4
    )
    merge_append(t, _batch(spark, 0, 120, "base"), batch_id="b0")

    def intruder():
        other = LakeTable.load(spark, t.path)
        merge_append(other, _batch(spark, 1000, 80, "intruder"), batch_id="bx")

    _inject_before_first_commit(monkeypatch, "merge-append", intruder)
    st = merge_append(t, _batch(spark, 2000, 80, "mine"), batch_id="b1")
    assert st.snapshot_version == t.version

    # both the intruder's and our rows are live; nothing was lost/doubled
    got = {r.text for r in t.scan().select("text").collect()}
    assert sum(x.startswith("intruder-") for x in got) == 80
    assert sum(x.startswith("mine-") for x in got) == 80
    assert {"b0", "bx", "b1"} <= t.committed_batch_ids()
    # the retried commit's parent chain goes through the intruder
    ops = [s["summary"]["operation"] for s in t.snapshots()]
    assert ops.count("merge-append") == 3


def test_rewrite_retries_past_metadata_only_commit(spark, tmpdir_path, monkeypatch):
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "r"), transcript_schema(), n_buckets=2
    )
    for i in range(3):
        merge_append(t, _batch(spark, i * 100, 100, f"t{i}"), batch_id=f"b{i}")
    want = sorted((r.conv_id, r.turn_idx, r.text) for r in t.scan().collect())

    def intruder():
        other = LakeTable.load(spark, t.path)
        # advances HEAD without touching any file: an empty batch
        merge_append(other, _batch(spark, 0, 0, "e"), batch_id="empty")

    _inject_before_first_commit(monkeypatch, "compact-major", intruder)
    st = compact(t, min_files_per_bucket=2)
    assert st is not None
    got = sorted((r.conv_id, r.turn_idx, r.text) for r in t.scan().collect())
    assert got == want and got
    assert "empty" in t.committed_batch_ids()


def test_rewrite_conflict_same_bucket_raises(spark, tmpdir_path, monkeypatch):
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "c"), transcript_schema(), n_buckets=2
    )
    for i in range(3):
        merge_append(t, _batch(spark, i * 100, 100, f"t{i}"), batch_id=f"b{i}")

    def intruder():
        other = LakeTable.load(spark, t.path)
        # 40 keys over 2 buckets: guaranteed to land in a victim bucket
        merge_append(other, _batch(spark, 5000, 60, "hot"), batch_id="hot")

    _inject_before_first_commit(monkeypatch, "compact-major", intruder)
    with pytest.raises(CommitConflictError, match="buckets this"):
        compact(t, min_files_per_bucket=2)
    # table is consistent at the winner's state: intruder applied, no
    # compaction artifacts visible
    got = {r.text for r in t.scan().select("text").collect()}
    assert sum(x.startswith("hot-") for x in got) == 60
    assert t.current()["summary"]["operation"] == "merge-append"


def test_same_batch_id_race_is_exactly_once(spark, tmpdir_path, monkeypatch):
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "x"), transcript_schema(), n_buckets=2
    )
    merge_append(t, _batch(spark, 0, 50, "base"), batch_id="b0")
    dup = _batch(spark, 900, 40, "dup")

    def intruder():
        other = LakeTable.load(spark, t.path)
        merge_append(other, dup, batch_id="dup-batch")

    _inject_before_first_commit(monkeypatch, "merge-append", intruder)
    st = merge_append(t, dup, batch_id="dup-batch")  # duplicate delivery
    # exactly-once: the winner's snapshot is returned, nothing re-applied
    snaps = [s for s in t.snapshots() if s.get("batch_id") == "dup-batch"]
    assert len(snaps) == 1
    assert st.snapshot_version == snaps[0]["version"]
    assert t.scan().where(F.col("text").startswith("dup-")).count() == 40
    # the loser's write stats are zeroed and flagged — they would
    # otherwise describe orphaned files absent from the winner snapshot
    assert st.duplicate_batch is True
    assert st.rows_written == 0 and st.added_files == 0


def test_rebucket_race_raises(spark, tmpdir_path, monkeypatch):
    """A merge racing a concurrent rebucket() must NOT retry: its data
    files carry bucket values hashed under the OLD modulus — committing
    them under the new layout silently corrupts bucket-pruned lookups."""
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "rb"), transcript_schema(), n_buckets=2
    )
    merge_append(t, _batch(spark, 0, 100, "base"), batch_id="b0")

    def intruder():
        other = LakeTable.load(spark, t.path)
        other.rebucket(4)

    _inject_before_first_commit(monkeypatch, "merge-append", intruder)
    with pytest.raises(CommitConflictError, match="rebucket"):
        merge_append(t, _batch(spark, 2000, 60, "mine"), batch_id="b1")
    # re-planning against fresh state (new layout) succeeds cleanly
    st = merge_append(t, _batch(spark, 2000, 60, "mine"), batch_id="b1")
    assert st.snapshot_version == t.version
    got = {r.text for r in t.scan().select("text").collect()}
    assert sum(x.startswith("mine-") for x in got) == 60
    assert t.n_buckets == 4


def test_schema_race_raises(spark, tmpdir_path, monkeypatch):
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "s"), transcript_schema(), n_buckets=2
    )
    merge_append(t, _batch(spark, 0, 50, "base"), batch_id="b0")
    wide = _batch(spark, 800, 30, "wide").withColumn("extra", F.lit(1))

    def intruder():
        other = LakeTable.load(spark, t.path)
        merge_append(other, wide, batch_id="evolver")

    _inject_before_first_commit(monkeypatch, "merge-append", intruder)
    with pytest.raises(CommitConflictError, match="schema"):
        merge_append(t, _batch(spark, 2000, 30, "mine"), batch_id="b1")
    # re-planning against fresh state succeeds
    st = merge_append(t, _batch(spark, 2000, 30, "mine"), batch_id="b1")
    assert st.snapshot_version == t.version
    assert "extra" in [f.name for f in t.schema().fields]


def test_rewritten_input_files_raise(spark, tmpdir_path):
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "f"), transcript_schema(), n_buckets=2
    )
    for i in range(3):
        merge_append(t, _batch(spark, i * 100, 100, f"t{i}"), batch_id=f"b{i}")
    stale_version = t.version
    stale_paths = {f.path for f in t.files()}
    compact(t, min_files_per_bucket=2)  # rewrites those files

    with pytest.raises(CommitConflictError, match="removed by a concurrent"):
        t.commit_retrying(
            stale_paths, [], operation="stale-rewrite",
            validation="rewrite", expected_parent_version=stale_version,
        )


def test_commit_retrying_guards(spark, tmpdir_path):
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "g"), transcript_schema(), n_buckets=2
    )
    with pytest.raises(ValueError, match="unknown conflict validation"):
        t.commit_retrying(set(), [], validation="yolo",
                          expected_parent_version=t.version)
    with pytest.raises(ValueError, match="removed_paths"):
        t.commit_retrying({"x"}, [], validation="append",
                          expected_parent_version=t.version)
