"""count_rows: aggregate pushdown to manifests (Iceberg
count(*)-from-manifests analog). Exact on resolved snapshots —
including ones that still hold physical tombstone rows — and falls
back to the distributed resolved scan on MOR snapshots or when a
file's tombstone count is unknown."""

import dataclasses
import os

import pytest

from ds_floodexposure_monitoring_spark.datagen.transcripts import transcript_schema
from ds_floodexposure_monitoring_spark.operators.compact import compact, merge_append
from ds_floodexposure_monitoring_spark.operators.merge import merge_into
from ds_floodexposure_monitoring_spark.sources.lake import LakeTable

DDL = (
    "lsn long, conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp, op string"
)


def _rows(spark, lo, hi, deletes=()):
    rows = [
        (i + 1, f"c{i % 10}", i // 10, "user", f"t-{i}", None, None, "U")
        for i in range(lo, hi)
    ]
    rows += [(hi + j + 1, c, ti, None, None, None, None, "D")
             for j, (c, ti) in enumerate(deletes)]
    return spark.createDataFrame(rows, DDL)


@pytest.fixture()
def table(spark, tmpdir_path):
    return LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), transcript_schema(), n_buckets=8
    )


def test_cow_merge_counts_from_metadata(spark, table):
    merge_into(table, _rows(spark, 0, 100), op_col="op", batch_id="b1")
    # COW merge leaves a resolved snapshot: metadata answers directly
    assert not table.current().get("requires_resolve", False)
    assert table.count_rows() == table.scan().count() == 100


def test_tombstones_subtracted_not_counted(spark, table):
    merge_into(table, _rows(spark, 0, 100), op_col="op", batch_id="b1")
    # delete 7 live keys: tombstones persist as hidden physical rows
    doomed = [("c1", 0), ("c1", 1), ("c2", 0), ("c3", 3), ("c4", 2),
              ("c5", 5), ("c6", 6)]
    merge_into(table, _rows(spark, 100, 100, doomed), op_col="op", batch_id="b2")
    fs = table.files()
    assert sum(f.tombstones for f in fs) == len(doomed)
    assert sum(f.rows for f in fs) == 100  # physical incl. tombstones
    assert table.count_rows() == table.scan().count() == 100 - len(doomed)


def test_mor_falls_back_to_scan(spark, table):
    merge_append(table, _rows(spark, 0, 100), op_col="op", batch_id="b1")
    merge_append(  # re-deliver 50 updates: physical dup versions
        table, _rows(spark, 50, 150, [("c1", 0)]), op_col="op", batch_id="b2"
    )
    assert table.current().get("requires_resolve", False)
    physical = sum(f.rows for f in table.files())
    live = table.scan().count()
    assert physical > live  # metadata sum would over-count
    assert table.count_rows() == live
    # major compaction resolves: metadata takes over and still agrees
    compact(table, min_files_per_bucket=1)
    assert not table.current().get("requires_resolve", False)
    assert table.count_rows() == live
    assert all(f.tombstones is not None for f in table.files())


def test_unknown_tombstone_count_falls_back(spark, table):
    merge_into(table, _rows(spark, 0, 60), op_col="op", batch_id="b1")
    snap = dict(table.current())
    files = [dataclasses.replace(f, tombstones=None) for f in table.files(snap)]
    snap["files"] = [f.to_json() for f in files]
    # legacy manifest (no tombstone counts): count_rows must scan
    table._head = snap
    assert table.count_rows() == 60


def test_time_travel_count(spark, table):
    merge_into(table, _rows(spark, 0, 40), op_col="op", batch_id="b1")
    v1 = table.version
    merge_into(table, _rows(spark, 40, 90, [("c0", 0)]), op_col="op", batch_id="b2")
    assert table.count_rows(version=v1) == 40
    assert table.count_rows() == 89


@pytest.mark.parametrize("mode", ["arrow", "jvm"])
def test_both_writer_modes_carry_tombstone_counts(
    spark, tmpdir_path, mode, monkeypatch
):
    monkeypatch.setenv("SPARK_GRAFT_WRITER", mode)
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, f"t-{mode}"), transcript_schema(),
        n_buckets=4,
    )
    merge_into(t, _rows(spark, 0, 50, [("c1", 1)]), op_col="op", batch_id="b1")
    fs = t.files()
    # arrow mode counts exactly; jvm mode proves counts from footer
    # min/max stats (files here are all-live or tombstone-sorted enough
    # that row groups are uniform at this size — if any file were
    # unprovable, count_rows falls back and the assert still holds)
    assert t.count_rows() == t.scan().count() == 49
    assert sum(f.rows for f in fs) == 50


# ----------------------------------------------------- col_bounds
import datetime as _dt


def _ts_rows(spark, lo, hi, deletes=()):
    base = _dt.datetime(2024, 1, 1)
    rows = [
        (i + 1, f"c{i % 10}", i // 10, "user", f"t-{i}", None,
         base + _dt.timedelta(hours=i), "U")
        for i in range(lo, hi)
    ]
    rows += [(hi + j + 1, c, ti, None, None, None, None, "D")
             for j, (c, ti) in enumerate(deletes)]
    return spark.createDataFrame(rows, DDL)


@pytest.fixture()
def stat_table(spark, tmpdir_path):
    return LakeTable.create(
        spark, os.path.join(tmpdir_path, "ts"), transcript_schema(),
        n_buckets=4, stat_cols=("turn_idx", "ts"),
    )


def test_col_bounds_numeric_and_timestamp(spark, stat_table):
    merge_into(stat_table, _ts_rows(spark, 0, 80), op_col="op", batch_id="b1")
    assert not stat_table.current().get("requires_resolve", False)
    assert stat_table.col_bounds("turn_idx") == (0, 7)
    lo, hi = stat_table.col_bounds("ts")
    assert lo == _dt.datetime(2024, 1, 1)
    assert hi == _dt.datetime(2024, 1, 1) + _dt.timedelta(hours=79)


def test_col_bounds_refuses_unprovable(spark, stat_table, tmpdir_path):
    merge_into(stat_table, _ts_rows(spark, 0, 80), op_col="op", batch_id="b1")
    # tombstones: a deleted row may hold the extreme -> None
    merge_into(stat_table, _ts_rows(spark, 80, 80, [("c1", 0)]),
               op_col="op", batch_id="b2")
    assert stat_table.col_bounds("turn_idx") is None
    # untracked column: no stats anywhere -> None
    bare = LakeTable.create(
        spark, os.path.join(tmpdir_path, "bare"), transcript_schema(),
        n_buckets=4,
    )
    merge_into(bare, _ts_rows(spark, 0, 10), op_col="op", batch_id="b1")
    assert bare.col_bounds("turn_idx") is None


def test_col_bounds_mor_unresolved_none(spark, stat_table):
    merge_append(stat_table, _ts_rows(spark, 0, 50), op_col="op", batch_id="b1")
    merge_append(stat_table, _ts_rows(spark, 25, 75), op_col="op", batch_id="b2")
    assert stat_table.current().get("requires_resolve", False)
    assert stat_table.col_bounds("turn_idx") is None
    # major compact resolves (no deletes -> no tombstones): bounds return
    compact(stat_table, min_files_per_bucket=1)
    assert stat_table.col_bounds("turn_idx") == (0, 7)


def test_col_bounds_guards(spark, stat_table):
    merge_into(stat_table, _ts_rows(spark, 0, 10), op_col="op", batch_id="b1")
    with pytest.raises(ValueError, match="numeric/temporal"):
        stat_table.col_bounds("text")
    with pytest.raises(ValueError, match="unknown column"):
        stat_table.col_bounds("nope")


# ------------------------------------------------------------- SUM pushdown

@pytest.fixture()
def sum_table(spark, tmpdir_path):
    """Integral stat col `turn_idx` tracked for SUM pushdown."""
    return LakeTable.create(
        spark, os.path.join(tmpdir_path, "st"), transcript_schema(),
        n_buckets=4, stat_cols=("turn_idx", "ts"),
    )


def test_col_sum_resolved(spark, sum_table):
    from pyspark.sql import functions as F

    merge_into(sum_table, _rows(spark, 0, 100), op_col="op", batch_id="b1")
    want = sum_table.scan().agg(F.sum("turn_idx")).collect()[0][0]
    assert sum_table.col_sum("turn_idx") == want
    # the answer came from manifests: every file carries the entry
    assert all((f.col_sums or {}).get("turn_idx") for f in sum_table.files())


def test_col_sum_none_on_mor_and_tombstones(spark, sum_table):
    merge_append(sum_table, _rows(spark, 0, 100), op_col="op", batch_id="b1")
    assert sum_table.current().get("requires_resolve", False)
    assert sum_table.col_sum("turn_idx") is None  # unresolved MOR
    compact(sum_table, min_files_per_bucket=1)
    assert sum_table.col_sum("turn_idx") == sum_table.scan().agg(
        {"turn_idx": "sum"}).collect()[0][0]
    # deletes leave tombstone rows after a COW merge: unprovable
    merge_into(sum_table, _rows(spark, 100, 100, [("c1", 0), ("c2", 0)]),
               op_col="op", batch_id="b2")
    assert sum_table.col_sum("turn_idx") is None
    # a tombstone-erasing compaction restores the metadata answer
    compact(sum_table, min_files_per_bucket=1, tombstone_watermark_lsn=2**62)
    assert sum_table.col_sum("turn_idx") == sum_table.scan().agg(
        {"turn_idx": "sum"}).collect()[0][0]


def test_col_sum_rejects_non_integral(spark, sum_table):
    with pytest.raises(ValueError, match="integral"):
        sum_table.col_sum("ts")
    with pytest.raises(ValueError, match="unknown column"):
        sum_table.col_sum("nope")


def test_col_sum_none_on_legacy_manifest(spark, sum_table):
    """Files whose manifest entries lack col_sums (legacy / footer-
    derived) make the fold unprovable, never wrong."""
    merge_into(sum_table, _rows(spark, 0, 50), op_col="op", batch_id="b1")
    snap = dict(sum_table.current())
    stripped = []
    for d in snap["files"]:
        d = dict(d)
        d.pop("col_sums", None)
        stripped.append(d)
    snap["files"] = stripped
    import json
    from ds_floodexposure_monitoring_spark.sources.lake import DataFile
    fs = [DataFile.from_json(d) for d in stripped]
    assert all(f.col_sums is None for f in fs)
    # simulate by asking col_sum over a files list via monkeypatched snapshot
    orig = sum_table.files
    try:
        sum_table.files = lambda s=None: fs
        assert sum_table.col_sum("turn_idx") is None
    finally:
        sum_table.files = orig


def test_partition_col_sums(spark, tmpdir_path):
    """Per-partition SUM fold: exact vs GROUP BY scan on an identity-
    partitioned resolved table; None under MOR / unpartitioned."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "ps"),
        T.StructType([
            T.StructField("k", T.LongType(), False),
            T.StructField("g", T.StringType(), True),
            T.StructField("v", T.IntegerType(), True),
        ]),
        merge_keys=("k",), n_buckets=4, stat_cols=("v",), partition_by="g",
    )
    rows = [(i, f"g{i % 3}", i if i % 7 else None, 1) for i in range(200)]
    df = spark.createDataFrame(rows, "k long, g string, v int, lsn long")
    merge_append(t, df, batch_id="b1")
    assert t.partition_col_sums("v") is None  # unresolved MOR
    compact(t, min_files_per_bucket=1)
    got = t.partition_col_sums("v")
    want = {
        r["g"]: r["s"]
        for r in t.scan().groupBy("g").agg(F.sum("v").alias("s")).collect()
    }
    assert got == want
    with pytest.raises(ValueError, match="integral"):
        t.partition_col_sums("g")


def test_partition_col_sums_none_on_unpartitioned(spark, sum_table):
    merge_into(sum_table, _rows(spark, 0, 50), op_col="op", batch_id="b1")
    assert sum_table.partition_col_sums("turn_idx") is None
