"""Read-optimized scan (Hudi RO vs RT parity): RO reads only base
files — per-bucket last-resolution state, no MOR fold — and its lag is
reportable from metadata alone."""

import os

from pyspark.sql import types as T

from ds_floodexposure_monitoring_spark.operators.compact import (
    compact,
    merge_append,
)
from ds_floodexposure_monitoring_spark.operators.merge import merge_into
from ds_floodexposure_monitoring_spark.sources.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)
DDL = "lsn long, k long, v string, op string"


def _state(df):
    return sorted((r.k, r.v) for r in df.collect())


def _mk(spark, root, name):
    return LakeTable.create(
        spark, os.path.join(root, name), SCHEMA, merge_keys=("k",), n_buckets=4
    )


def test_ro_tracks_compaction_state(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path, "t")
    merge_append(t, spark.createDataFrame(
        [(1, 1, "a"), (2, 2, "b")], "lsn long, k long, v string"))
    merge_append(t, spark.createDataFrame(
        [(3, 1, "a2"), (4, 3, "c")], "lsn long, k long, v string"))
    # never compacted: RO sees nothing, lag counts every delta row
    assert _state(t.scan_read_optimized()) == []
    assert t.ro_lag_rows() == 4

    compact(t, min_files_per_bucket=1)
    assert _state(t.scan_read_optimized()) == _state(t.scan())
    assert t.ro_lag_rows() == 0

    # new deltas: RT advances, RO stays at the compaction state
    merge_append(t, spark.createDataFrame(
        [(5, 2, "b2"), (6, 4, "d")], "lsn long, k long, v string"))
    assert _state(t.scan()) == [(1, "a2"), (2, "b2"), (3, "c"), (4, "d")]
    assert _state(t.scan_read_optimized()) == [(1, "a2"), (2, "b"), (3, "c")]
    assert t.ro_lag_rows() == 2

    compact(t, min_files_per_bucket=1)
    assert _state(t.scan_read_optimized()) == _state(t.scan())


def test_ro_equals_rt_on_cow_table(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path, "cow")
    merge_into(t, spark.createDataFrame(
        [(1, 1, "a", "U"), (2, 2, "b", "U")], DDL), op_col="op", batch_id="b1")
    merge_into(t, spark.createDataFrame(
        [(3, 1, "a2", "U"), (4, 2, None, "D")], DDL), op_col="op", batch_id="b2")
    # COW merges write base files: RO is always current
    assert _state(t.scan_read_optimized()) == _state(t.scan()) == [(1, "a2")]
    assert t.ro_lag_rows() == 0


def test_ro_hides_tombstoned_rows_kept_in_bases(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path, "tomb")
    merge_append(t, spark.createDataFrame(
        [(1, 1, "a"), (2, 2, "b")], "lsn long, k long, v string"))
    merge_into(t, spark.createDataFrame(
        [(3, 2, None, "D")], DDL), op_col="op", batch_id="d1")
    compact(t, min_files_per_bucket=1)  # no watermark: tombstone survives
    assert _state(t.scan_read_optimized()) == [(1, "a")]
    # time travel composes: RO of the pre-delete snapshot
    assert _state(t.scan_read_optimized(version=2)) == []  # only deltas then
