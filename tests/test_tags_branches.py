"""Snapshot tags + branches with write-audit-publish (Iceberg
tag/branch/fast-forward analog): metadata-only pointers, expire-proof
tags, branch ingest invisible on main until an atomic publish."""

import os

import pytest
from pyspark.sql import functions as F

from ds_floodexposure_monitoring_spark.datagen.transcripts import transcript_schema
from ds_floodexposure_monitoring_spark.operators.compact import merge_append
from ds_floodexposure_monitoring_spark.sources.lake import (
    CommitConflictError,
    LakeTable,
)

DDL = "lsn long, conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def _batch(spark, lo, n, text="t"):
    rows = [
        (lo + i, f"c{(lo + i) % 10}", (lo + i) // 10, "user", f"{text}-{lo + i}", None, None)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, DDL)


@pytest.fixture()
def table(spark, tmpdir_path):
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), transcript_schema(), n_buckets=8
    )
    merge_append(t, _batch(spark, 0, 50), batch_id="b0")
    return t


def test_tag_protects_from_expiry_and_time_travels(spark, table):
    v_tagged = table.version
    table.tag("audited", replace=False)
    want = sorted(r.text for r in table.scan().collect())
    for i in range(1, 4):
        merge_append(table, _batch(spark, 50 * i, 50, text=f"t{i}"), batch_id=f"b{i}")
    table.expire_snapshots(keep_last=1)
    # untagged history is gone, the tagged version still scans exactly
    assert table.tag_version("audited") == v_tagged
    got = sorted(r.text for r in table.scan(version=v_tagged).collect())
    assert got == want
    retained = {s["version"] for s in table.snapshots()}
    assert v_tagged in retained and len(retained) == 2
    # dropping the tag releases it for the next expiry
    table.drop_tag("audited")
    table.expire_snapshots(keep_last=1)
    assert v_tagged not in {s["version"] for s in table.snapshots()}


def test_tag_name_collision_and_missing(spark, table):
    table.tag("x")
    with pytest.raises(ValueError):
        table.tag("x")
    table.tag("x", replace=True)
    with pytest.raises(KeyError):
        table.tag_version("nope")


def test_wap_branch_ingest_then_publish(spark, table):
    main_before = sorted(r.text for r in table.scan().collect())
    audit = table.create_branch("audit")
    merge_append(audit, _batch(spark, 1000, 30, text="staged"), batch_id="staged1")
    merge_append(audit, _batch(spark, 2000, 30, text="staged"), batch_id="staged2")
    # WRITE happened on the branch; main is untouched (the audit gap)
    assert sorted(r.text for r in table.scan().collect()) == main_before
    staged = audit.scan().where(F.col("text").startswith("staged")).count()
    assert staged == 60
    assert table.branches().keys() == {"main", "audit"}
    # AUDIT passed -> PUBLISH: main fast-forwards atomically
    snap = table.publish_branch("audit")
    assert table.version == snap["version"]
    assert table.scan().where(F.col("text").startswith("staged")).count() == 60
    assert "audit" not in table.branches()


def test_publish_refuses_diverged_branch(spark, table):
    audit = table.create_branch("audit")
    merge_append(audit, _batch(spark, 1000, 10), batch_id="staged")
    # main moves on independently -> the branch no longer descends from it
    merge_append(table, _batch(spark, 5000, 10), batch_id="mainline")
    with pytest.raises(CommitConflictError):
        table.publish_branch("audit")
    # branch survives the failed publish for inspection
    assert "audit" in table.branches()
    table.drop_branch("audit")
    assert "audit" not in table.branches()


def test_branch_head_protected_from_expiry(spark, table):
    audit = table.create_branch("audit")
    merge_append(audit, _batch(spark, 1000, 10), batch_id="staged")
    v_branch = audit.version
    for i in range(1, 5):
        merge_append(table, _batch(spark, 50 * i, 50), batch_id=f"b{i}")
    table.expire_snapshots(keep_last=1)
    assert v_branch in {s["version"] for s in table.snapshots()}
    assert audit.scan().count() > 0  # branch still fully readable


def test_branch_validation(spark, table):
    with pytest.raises(ValueError):
        table.create_branch("main")
    with pytest.raises(ValueError):
        table.create_branch("a.b")
    table.create_branch("ok")
    with pytest.raises(FileExistsError):
        table.create_branch("ok")
    with pytest.raises(FileNotFoundError):
        table.on_branch("ghost")
    with pytest.raises(ValueError):
        table.drop_branch("main")


def test_pipeline_wap_flow(spark, tmpdir_path):
    """End-to-end WAP: a CDC pipeline ingests to a branch; main flips
    only at publish and matches the branch byte-for-byte."""
    from ds_floodexposure_monitoring_spark.datagen import (
        ChangeLogSpec,
        generate_changelog,
    )
    from ds_floodexposure_monitoring_spark.streaming.runner import CDCPipeline

    log = os.path.join(tmpdir_path, "log")
    generate_changelog(
        spark,
        ChangeLogSpec(
            n_events=2_000, n_convs=40, n_shards=2, dup_rate=0.05,
            delete_rate=0.02, ooo_window=50, schema_change_at=None,
            events_per_file=500, seed=3,
        ),
        log,
    )
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), transcript_schema(), n_buckets=8
    )
    audit = t.create_branch("ingest")
    pipe = CDCPipeline(
        spark, log, audit, os.path.join(tmpdir_path, "ckpt"),
        max_events_per_batch=1_000, mode="mor",
    )
    pipe.run_until_caught_up()
    assert t.scan().count() == 0  # main blind to the staged ingest
    want = sorted(
        (r.conv_id, r.turn_idx, r.text) for r in audit.scan().collect()
    )
    assert want
    t.publish_branch("ingest")
    got = sorted((r.conv_id, r.turn_idx, r.text) for r in t.scan().collect())
    assert got == want


def test_publish_after_expiry_of_intermediate_branch_snapshots(spark, table):
    """ADVICE r2: expire_snapshots during branch ingest must not break a
    later publish — every snapshot on the branch's ancestry back to
    main's head (the fork floor) stays protected while the branch
    exists, so the fast-forward walk always completes."""
    audit = table.create_branch("audit")
    for i in range(4):
        merge_append(audit, _batch(spark, 1000 * (i + 1), 20, text="staged"),
                     batch_id=f"staged{i}")
        audit.expire_snapshots(keep_last=1)  # --expire-every during ingest
    snap = table.publish_branch("audit")
    assert table.version == snap["version"]
    assert table.scan().where(F.col("text").startswith("staged")).count() == 80


def test_dropped_branch_batches_replay_onto_main(spark, table):
    """ADVICE r2: replay detection is scoped to the branch's ancestry.
    After a failed-audit recovery (ingest to branch, drop_branch), the
    same batch ids must re-apply to MAIN — not be silently skipped
    because the branch's retained snapshots still carry them."""
    audit = table.create_branch("audit")
    merge_append(audit, _batch(spark, 1000, 30, text="staged"), batch_id="bx")
    assert "bx" in audit.committed_batch_ids()
    assert "bx" not in table.committed_batch_ids()  # main's ancestry only
    table.drop_branch("audit")
    # re-ingest the same batch id against main: applies, not skipped
    merge_append(table, _batch(spark, 1000, 30, text="recovered"), batch_id="bx")
    assert "bx" in table.committed_batch_ids()
    assert table.scan().where(F.col("text").startswith("recovered")).count() == 30


def test_publish_cas_rejects_concurrent_main_commit(spark, table):
    """ADVICE r2: publish re-validates main's head right before the
    pointer swap — a commit that landed on main after the ancestry check
    must fail the publish instead of being silently discarded."""
    audit = table.create_branch("audit")
    merge_append(audit, _batch(spark, 1000, 10, text="staged"), batch_id="s1")

    real_current = LakeTable.current

    state = {"raced": False}

    def racing_current(self):
        snap = real_current(self)
        # after publish reads main's head once, land a mainline commit
        if self is table and not state["raced"]:
            state["raced"] = True
            mainline = LakeTable.load(self.spark, self.path)
            merge_append(mainline, _batch(self.spark, 9000, 5, text="race"),
                         batch_id="race")
        return snap

    LakeTable.current = racing_current
    try:
        with pytest.raises(CommitConflictError):
            table.publish_branch("audit")
    finally:
        LakeTable.current = real_current
    # the racing commit survived; main never lost it
    fresh = LakeTable.load(spark, table.path)
    assert fresh.scan().where(F.col("text").startswith("race")).count() == 5
