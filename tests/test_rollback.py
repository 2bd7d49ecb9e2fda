"""Snapshot rollback + metadata tables."""

import os

import pytest
from ds_floodexposure_monitoring_spark.datagen.transcripts import transcript_schema
from ds_floodexposure_monitoring_spark.operators.merge import merge_into
from ds_floodexposure_monitoring_spark.sources.lake import LakeTable

DDL = "lsn long, conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def _state(t, version=None):
    return sorted((r.conv_id, r.turn_idx, r.text) for r in t.scan(version=version).collect())


def test_rollback_restores_state_and_keeps_history(spark, tmpdir_path):
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"), transcript_schema(), n_buckets=4)
    merge_into(t, spark.createDataFrame([(1, "c1", 0, "user", "good", None, None)], DDL), batch_id="b1")
    v_good = t.version
    good = _state(t)
    merge_into(t, spark.createDataFrame([(2, "c1", 0, "user", "BAD", None, None)], DDL), batch_id="b2")
    assert _state(t) != good

    snap = t.rollback(v_good)
    assert snap["summary"]["operation"] == "rollback"
    assert _state(t) == good                      # HEAD restored
    assert _state(t, version=v_good + 1)[0][2] == "BAD"  # bad commit still inspectable
    # a post-rollback merge applies on the restored state; the rolled-back
    # row's higher LSN is gone with its file list, so LSN 1.5-style
    # replays are judged against the restored rows
    merge_into(t, spark.createDataFrame([(3, "c1", 0, "user", "fixed", None, None)], DDL), batch_id="b3")
    assert _state(t)[0][2] == "fixed"

    with pytest.raises(ValueError, match="not before HEAD"):
        t.rollback(t.version)

    h = {r.version: r.operation for r in t.history().collect()}
    assert h[snap["version"]] == "rollback"
    assert h[1] == "create"

    m = t.file_manifest().collect()
    assert len(m) == len(t.files())
    assert all(r.rows > 0 for r in m)
