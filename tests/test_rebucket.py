"""Partition evolution: rebucket() re-hashes the table into a new
bucket count; state, point-lookup pruning, and subsequent merges must
all keep working under the new layout."""

import os

import pytest
from ds_floodexposure_monitoring_spark.datagen.transcripts import transcript_schema
from ds_floodexposure_monitoring_spark.operators.merge import merge_into
from ds_floodexposure_monitoring_spark.sources.lake import LakeTable

DDL = "lsn long, conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def _state(t):
    return sorted((r.conv_id, r.turn_idx, r.text) for r in t.scan().collect())


def test_rebucket_preserves_state_and_layout_invariants(spark, tmpdir_path):
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"), transcript_schema(), n_buckets=4)
    rows = [(i + 1, f"c{i % 30}", i // 30, "user", f"t-{i}", None, None) for i in range(300)]
    # include a tombstone so the guard survives the rewrite
    merge_into(t, spark.createDataFrame(rows, DDL), batch_id="seed")
    merge_into(
        t,
        spark.createDataFrame(
            [(1000, "c1", 0, "user", None, None, None, "D")], DDL + ", op string"
        ),
        op_col="op",
        batch_id="del",
    )
    before = _state(t)
    snap = t.rebucket(16)
    assert snap["summary"]["operation"] == "rebucket" and t.n_buckets == 16
    assert _state(t) == before
    # every file's bucket is in the new space
    assert all(0 <= f.bucket < 16 for f in t.files())
    # point lookup prunes under the new layout and still answers correctly
    flist = t.prune_for_keys(["c5"])
    assert 0 < len(flist) < len(t.files())
    assert sorted(r.turn_idx for r in t.lookup(["c5"]).collect()) == sorted(
        x[1] for x in before if x[0] == "c5"
    )
    # the tombstone still guards: stale pre-delete event loses
    merge_into(
        t,
        spark.createDataFrame([(500, "c1", 0, "user", "stale", None, None)], DDL),
        batch_id="stale",
    )
    assert ("c1", 0, "stale") not in _state(t)
    # a same-count rebucket is rejected
    with pytest.raises(ValueError, match="already has"):
        t.rebucket(16)

    # rollback ACROSS the rebucket must restore the old bucket layout
    # with the old files — mixed layout would corrupt all bucket math
    v_pre_rebucket = snap["version"] - 1
    t.rollback(v_pre_rebucket)
    assert t.n_buckets == 4
    assert all(0 <= f.bucket < 4 for f in t.files())
    assert _state(t) == before
    # point lookup still exact under the restored layout
    assert sorted(r.turn_idx for r in t.lookup(["c5"]).collect()) == sorted(
        x[1] for x in before if x[0] == "c5"
    )
