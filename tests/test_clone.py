"""Zero-copy table clone (Delta SHALLOW CLONE analog): metadata-only,
O(files) driver work, full isolation of both sides afterward, and the
clone's own vacuum can never touch shared source files."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from ds_floodexposure_monitoring_spark.datagen.transcripts import transcript_schema
from ds_floodexposure_monitoring_spark.operators.compact import compact, merge_append
from ds_floodexposure_monitoring_spark.operators.dml import delete_where
from ds_floodexposure_monitoring_spark.sources.lake import LakeTable

DDL = "lsn long, conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def _batch(spark, lo, n, tag):
    rows = [
        (lo + i, f"c{(lo + i) % 40:03d}", (lo + i) % 7, "user",
         f"{tag}-{lo + i}", None,
         dt.datetime(2024, 1, 1) + dt.timedelta(minutes=lo + i))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, DDL)


def _state(t):
    return sorted((r.conv_id, r.turn_idx, r.text) for r in t.scan().collect())


@pytest.fixture()
def source(spark, tmpdir_path):
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "src"), transcript_schema(), n_buckets=4
    )
    for i in range(3):
        merge_append(t, _batch(spark, i * 200, 200, f"b{i}"), batch_id=f"b{i}")
    return t


def test_clone_is_metadata_only_and_equal(spark, tmpdir_path, source):
    clone = source.clone(os.path.join(tmpdir_path, "cl"))
    # zero data copies: the clone's data dir is empty, every file ref is
    # an absolute path into the source
    assert os.listdir(os.path.join(clone.path, "data")) == []
    assert all(os.path.isabs(f.path) for f in clone.files())
    assert _state(clone) == _state(source)
    assert clone.version == 1
    assert clone.merge_keys == source.merge_keys
    assert clone.n_buckets == source.n_buckets
    # MOR state carries: the staged table has unresolved deltas
    assert clone.current()["requires_resolve"] is True
    with pytest.raises(FileExistsError):
        source.clone(clone.path)


def test_isolation_both_directions(spark, tmpdir_path, source):
    clone = source.clone(os.path.join(tmpdir_path, "cl"))
    before = _state(source)

    # mutate the CLONE: a new batch + compaction + COW delete
    merge_append(clone, _batch(spark, 9000, 50, "clonebatch"), batch_id="cb")
    compact(clone, min_files_per_bucket=1)
    delete_where(clone, "turn_idx = 3")
    assert _state(source) == before  # source untouched
    got = _state(clone)
    assert not any(t == 3 for _, t, _2 in got)
    assert sum(x.startswith("clonebatch-") for _, _2, x in got) > 0

    # mutate the SOURCE: the clone must not see it
    clone_state = got
    merge_append(source, _batch(spark, 5000, 60, "srcbatch"), batch_id="sb")
    assert _state(clone) == clone_state
    assert sum(x.startswith("srcbatch-") for _, _2, x in _state(source)) == 60


def test_clone_vacuum_never_touches_shared_files(spark, tmpdir_path, source):
    clone = source.clone(os.path.join(tmpdir_path, "cl"))
    # clone rewrites everything (compaction), dropping the shared refs
    compact(clone, min_files_per_bucket=1)
    clone.expire_snapshots(keep_last=1)
    # the source's physical files all survive and the source still reads
    assert len(_state(source)) > 0
    # clone's post-compaction state is self-contained under its own root
    assert all(not os.path.isabs(f.path) for f in clone.files())
    assert _state(clone) == _state(source)


def test_clone_then_merge_semantics(spark, tmpdir_path, source):
    """The clone is a full table: LWW ordering vs the shared base files
    works across the clone boundary."""
    clone = source.clone(os.path.join(tmpdir_path, "cl"))
    # overwrite an existing key with a higher LSN on the clone
    merge_append(
        clone, _batch(spark, 20_000, 10, "upd"), batch_id="upd"
    )
    got = {(c, t): x for c, t, x in _state(clone)}
    assert sum(1 for v in got.values() if v.startswith("upd-")) == 10
