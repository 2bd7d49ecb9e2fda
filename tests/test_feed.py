"""Change-feed subscription (sources/feed.py): durable per-consumer
cursor, at-least-once redelivery before ack, loud lag detection after
retention, independent consumer groups."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ds_floodexposure_monitoring_spark.operators.compact import compact, merge_append
from ds_floodexposure_monitoring_spark.sources.feed import (
    FeedCursor,
    FeedLagError,
)
from ds_floodexposure_monitoring_spark.sources.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
    ]
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, lsn long")


@pytest.fixture()
def feed_table(spark, tmpdir_path):
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), SCHEMA,
        merge_keys=("k",), n_buckets=2,
    )
    merge_append(t, _batch(spark, [(1, "a", 1), (2, "b", 2)]), batch_id="b1")
    merge_append(t, _batch(spark, [(2, "b2", 3), (3, "c", 4)]), batch_id="b2")
    return t


def _changes(df):
    return sorted((r.k, r.v, r.change_type) for r in df.collect())


def test_poll_ack_poll_lifecycle(spark, tmpdir_path, feed_table):
    t = feed_table
    cur = FeedCursor(os.path.join(tmpdir_path, "feed"), "rollup")
    # no position yet: starts at the oldest retained snapshot (genesis)
    b = cur.poll(t)
    assert b is not None and b.to_version == t.version
    assert _changes(b.df) == [
        (1, "a", "insert"), (2, "b2", "insert"), (3, "c", "insert"),
    ]
    b.ack()
    assert cur.position() == t.version
    assert cur.poll(t) is None  # caught up
    # a new commit opens exactly one new window
    merge_append(t, _batch(spark, [(1, "a2", 5)]), batch_id="b3")
    b2 = cur.poll(t)
    assert (b2.from_version, b2.to_version) == (b.to_version, t.version)
    assert _changes(b2.df) == [(1, "a2", "update")]
    b2.ack()
    assert cur.poll(t) is None


def test_crash_before_ack_redelivers_same_window(spark, tmpdir_path, feed_table):
    t = feed_table
    d = os.path.join(tmpdir_path, "feed")
    cur = FeedCursor(d, "c1")
    b = cur.poll(t)
    want = _changes(b.df)
    # crash: a NEW cursor object (fresh process) re-polls the SAME window
    cur2 = FeedCursor(d, "c1")
    b2 = cur2.poll(t)
    assert (b2.from_version, b2.to_version) == (b.from_version, b.to_version)
    assert _changes(b2.df) == want
    b2.ack()
    assert cur2.poll(t) is None
    # the first (dead) poll's ack is now stale and must refuse
    with pytest.raises(RuntimeError, match="stale ack"):
        b.ack()


def test_independent_consumers(spark, tmpdir_path, feed_table):
    t = feed_table
    d = os.path.join(tmpdir_path, "feed")
    a, b = FeedCursor(d, "a"), FeedCursor(d, "b")
    pa_ = a.poll(t)
    pa_.ack()
    assert a.poll(t) is None
    pb = b.poll(t)  # b is untouched by a's ack
    assert pb is not None and _changes(pb.df) == [
        (1, "a", "insert"), (2, "b2", "insert"), (3, "c", "insert"),
    ]
    pb.ack()
    assert FeedCursor.list_consumers(d) == {"a": t.version, "b": t.version}


def test_lag_past_retention_is_loud(spark, tmpdir_path, feed_table):
    t = feed_table
    cur = FeedCursor(os.path.join(tmpdir_path, "feed"), "slow")
    b = cur.poll(t)
    b.ack()  # acked at current head
    # churn + expire beyond the consumer's position
    for i in range(4):
        merge_append(t, _batch(spark, [(10 + i, f"x{i}", 10 + i)]),
                     batch_id=f"churn-{i}")
    compact(t, min_files_per_bucket=1)
    t.expire_snapshots(keep_last=2, orphan_grace_sec=0)
    with pytest.raises(FeedLagError, match="no longer retained"):
        cur.poll(t)
    # explicit recovery: reset to a retained version, poll works again
    oldest = sorted(s["version"] for s in t.snapshots())[0]
    cur.reset(oldest)
    b2 = cur.poll(t)
    assert b2 is not None
    b2.ack()
    assert cur.poll(t) is None


def test_reset_to_head_gives_latest_only(spark, tmpdir_path, feed_table):
    t = feed_table
    cur = FeedCursor(os.path.join(tmpdir_path, "feed"), "tail")
    cur.reset(t.version)  # latest-only semantics
    assert cur.poll(t) is None
    merge_append(t, _batch(spark, [(9, "z", 9)]), batch_id="b9")
    b = cur.poll(t)
    assert _changes(b.df) == [(9, "z", "insert")]
    b.ack()


def test_bad_consumer_id(tmpdir_path):
    with pytest.raises(ValueError, match="bad consumer_id"):
        FeedCursor(tmpdir_path, "a/b")
