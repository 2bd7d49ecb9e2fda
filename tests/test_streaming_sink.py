"""lake_cdc streaming source → lake_sink foreachBatch → replica table:
end-to-end lake-to-lake replication with exactly-once semantics."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from ds_floodexposure_monitoring_spark.datagen.transcripts import transcript_schema
from ds_floodexposure_monitoring_spark.operators.compact import merge_append
from ds_floodexposure_monitoring_spark.operators.dml import delete_where_mor
from ds_floodexposure_monitoring_spark.sources.lake import LakeTable
from ds_floodexposure_monitoring_spark.sources.pyds import register_lake_sources
from ds_floodexposure_monitoring_spark.streaming.sink import lake_sink

DDL = "lsn long, conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def _batch(spark, lo, n):
    rows = [
        (lo + i, f"c{(lo + i) % 40:03d}", (lo + i) % 7, "user",
         f"t-{lo + i}", None,
         dt.datetime(2024, 1, 1) + dt.timedelta(minutes=lo + i))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, DDL)


def _live(t):
    return sorted(tuple(r) for r in t.scan().collect())


@pytest.fixture()
def source(spark, tmpdir_path):
    register_lake_sources(spark)
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "src"), transcript_schema(), n_buckets=4
    )
    merge_append(t, _batch(spark, 0, 200), batch_id="b0")
    merge_append(t, _batch(spark, 120, 200), batch_id="b1")
    delete_where_mor(t, "turn_idx = 2")
    return t


def _replicate(spark, src, replica, ckpt, starting=1):
    q = (
        spark.readStream.format("lake_cdc")
        .option("path", src.path)
        .option("startingVersion", str(starting))
        .load()
        .writeStream.foreachBatch(lake_sink(replica, tag="repl"))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_replication_converges_and_resumes(spark, tmpdir_path, source):
    replica = LakeTable.create(
        spark, os.path.join(tmpdir_path, "dst"), transcript_schema(), n_buckets=4
    )
    ckpt = os.path.join(tmpdir_path, "ckpt")
    _replicate(spark, source, replica, ckpt)
    assert _live(replica) == _live(source)
    assert len(_live(replica)) > 0

    # more commits on the source, SAME checkpoint: only the new diff
    # flows, and the replica converges again (deletes included)
    merge_append(source, _batch(spark, 400, 80), batch_id="b2")
    delete_where_mor(source, "turn_idx = 5")
    _replicate(spark, source, replica, ckpt)
    assert _live(replica) == _live(source)


def test_sink_epoch_idempotent(spark, tmpdir_path, source):
    """A replayed foreachBatch epoch (same epoch_id, same data — the
    crash-between-commit-and-checkpoint window) must be a no-op."""
    replica = LakeTable.create(
        spark, os.path.join(tmpdir_path, "dst"), transcript_schema(), n_buckets=4
    )
    feed = source.scan_changes(1).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
        "change_lsn", "change_type",
    )
    sink = lake_sink(replica, tag="repl")
    sink(feed, 0)
    v_after = replica.version
    state = _live(replica)
    sink(feed, 0)  # redelivered epoch
    assert replica.version == v_after
    assert _live(replica) == state
    assert state == _live(source)
