"""TIMESTAMP AS OF addressing: version_at maps a wall-clock time to
the newest retained snapshot on the branch's own ancestry."""

import datetime
import os
import time

import pytest
from pyspark.sql import types as T

from ds_floodexposure_monitoring_spark.operators.merge import merge_into
from ds_floodexposure_monitoring_spark.sources.lake import LakeTable

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.StringType()),
])
DDL = "lsn long, k long, v string"


def _mk(spark, root):
    return LakeTable.create(spark, os.path.join(root, "t"), SCHEMA,
                            merge_keys=("k",), n_buckets=2)


def test_version_at_walks_commit_times(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path)
    stamps = []
    for i in range(3):
        merge_into(t, spark.createDataFrame([(i + 1, i, f"v{i}")], DDL),
                   batch_id=f"b{i}")
        stamps.append((time.time(), t.version))
        time.sleep(0.05)
    now = time.time()
    assert t.version_at(now) == t.version
    for at, ver in stamps:
        assert t.version_at(at + 0.01) == ver
    # datetime form (aware and naive-UTC)
    dt = datetime.datetime.fromtimestamp(stamps[0][0] + 0.01,
                                         tz=datetime.timezone.utc)
    assert t.version_at(dt) == stamps[0][1]
    assert t.version_at(dt.replace(tzinfo=None)) == stamps[0][1]
    # as-of scan composes
    rows = sorted((r.k, r.v) for r in
                  t.scan(version=t.version_at(stamps[1][0] + 0.01)).collect())
    assert rows == [(0, "v0"), (1, "v1")]


def test_version_at_ignores_side_branches(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path)
    merge_into(t, spark.createDataFrame([(1, 1, "a")], DDL), batch_id="b1")
    b = t.create_branch("side")
    merge_into(b, spark.createDataFrame([(2, 2, "x")], DDL), batch_id="s1")
    # the branch commit is NEWER and higher-versioned, but main's
    # as-of-now must answer with main's head
    assert t.version_at(time.time()) == t.version
    assert b.version > t.version


def test_version_at_refuses_expired_history(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path)
    t0 = time.time()
    time.sleep(0.05)
    for i in range(4):
        merge_into(t, spark.createDataFrame([(i + 1, i, f"v{i}")], DDL),
                   batch_id=f"b{i}")
    t.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError, match="expired"):
        t.version_at(t0)
