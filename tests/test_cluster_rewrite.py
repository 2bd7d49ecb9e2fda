"""Sort-order clustering rewrite (Iceberg rewrite_data_files sort
strategy analog): after cluster_rewrite(by=("ts",)) a time-bounded read
opens only the files whose now-tight ts range overlaps, and the table
state is byte-identical."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from ds_floodexposure_monitoring_spark.datagen.transcripts import transcript_schema
from ds_floodexposure_monitoring_spark.operators.compact import (
    cluster_rewrite,
    merge_append,
)
from ds_floodexposure_monitoring_spark.sources.lake import LakeTable

DDL = "lsn long, conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def _spanning_batch(spark, lo, n, tag):
    """Every batch spans the FULL 30-day window: ingest-order files all
    overlap on ts, the worst case clustering exists to fix."""
    rows = [
        (lo + i, f"c{(lo + i) % 200:04d}", (lo + i) // 200, "user",
         f"{tag}-{lo + i}", None,
         dt.datetime(2024, 1, 1) + dt.timedelta(hours=(i * 7) % (30 * 24)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, DDL)


@pytest.fixture()
def staged(spark, tmpdir_path):
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "cl"), transcript_schema(),
        n_buckets=4, stat_cols=("ts",),
    )
    for i in range(3):
        merge_append(t, _spanning_batch(spark, i * 1000, 600, f"b{i}"),
                     batch_id=f"b{i}")
    return t


def test_cluster_rewrite_prunes_range_reads(spark, staged):
    t = staged
    lo, hi = dt.datetime(2024, 1, 10), dt.datetime(2024, 1, 12)
    want = sorted(
        (r.conv_id, r.turn_idx, r.text)
        for r in t.scan().where(F.col("ts").between(lo, hi)).collect()
    )
    kept_before = len(t.prune_for_range("ts", lo, hi))
    n_before = len(t.files())
    total_rows = t.scan().count()

    st = cluster_rewrite(t, ("ts",), target_rows_per_file=120)
    assert st is not None and st.mode == "cluster"
    cur = t.current()
    assert cur["requires_resolve"] is False
    assert all(f.base for f in t.files())

    # state identical
    got = sorted(
        (r.conv_id, r.turn_idx, r.text)
        for r in t.scan().where(F.col("ts").between(lo, hi)).collect()
    )
    assert got == want and got
    assert t.scan().count() == total_rows

    # the clustered layout actually prunes: a 2-day window out of 30
    # keeps a strict minority of files (before: every file overlapped)
    kept_after = len(t.prune_for_range("ts", lo, hi))
    n_after = len(t.files())
    assert kept_before == n_before  # worst case confirmed
    assert kept_after < n_after / 2
    # scan_range equals scan+filter on the clustered table
    got_sr = sorted(
        (r.conv_id, r.turn_idx, r.text)
        for r in t.scan_range("ts", lo, hi)
        .where(F.col("ts").between(lo, hi)).collect()
    )
    assert got_sr == want


def _independent_batch(spark, lo, n, tag):
    """ts and turn_idx vary independently (pseudo-random interleave), so
    linear ts-order would leave turn_idx unclustered — the case z-order
    exists for."""
    rows = [
        (lo + i, f"c{(lo + i) % 300:04d}", ((lo + i) * 13) % 997, "user",
         f"{tag}-{lo + i}", None,
         dt.datetime(2024, 1, 1) + dt.timedelta(minutes=((lo + i) * 37) % 43200))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, DDL)


def test_zorder_prunes_both_dimensions(spark, tmpdir_path):
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "zo"), transcript_schema(),
        n_buckets=4, stat_cols=("ts", "turn_idx"),
    )
    for i in range(3):
        merge_append(t, _independent_batch(spark, i * 2400, 2400, f"b{i}"),
                     batch_id=f"b{i}")
    want = sorted(
        (r.conv_id, r.turn_idx, r.text) for r in t.scan().collect()
    )

    st = cluster_rewrite(t, ("ts", "turn_idx"), target_rows_per_file=60,
                         order="zorder")
    assert st is not None and st.rows_before == st.rows_after
    assert t.current()["summary"]["cluster_order"] == "zorder"

    got = sorted((r.conv_id, r.turn_idx, r.text) for r in t.scan().collect())
    assert got == want and got

    n = len(t.files())
    assert n >= 12  # enough files for pruning ratios to mean something
    # a ~13% window on EACH dimension independently prunes: z-order files
    # are compact cubes, so both per-file envelopes are tight
    lo_ts = dt.datetime(2024, 1, 10)
    hi_ts = dt.datetime(2024, 1, 14)
    kept_ts = len(t.prune_for_range("ts", lo_ts, hi_ts))
    kept_ti = len(t.prune_for_range("turn_idx", 400, 530))
    assert kept_ts < 0.6 * n, (kept_ts, n)
    assert kept_ti < 0.6 * n, (kept_ti, n)
    # and the pruned range reads stay exact
    want_ti = sorted(
        (r.conv_id, r.turn_idx) for r in t.scan()
        .where(F.col("turn_idx").between(400, 530))
        .select("conv_id", "turn_idx").collect()
    )
    got_ti = sorted(
        (r.conv_id, r.turn_idx) for r in t.scan_range("turn_idx", 400, 530)
        .where(F.col("turn_idx").between(400, 530))
        .select("conv_id", "turn_idx").collect()
    )
    assert got_ti == want_ti and got_ti


def test_zorder_guards(spark, tmpdir_path):
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "zg"), transcript_schema(),
        n_buckets=2, stat_cols=("ts", "role"),
    )
    merge_append(t, _independent_batch(spark, 0, 60, "a"), batch_id="a")
    with pytest.raises(ValueError, match="zorder needs >= 2"):
        cluster_rewrite(t, ("ts",), order="zorder")
    with pytest.raises(ValueError, match="non-orderable-numeric"):
        cluster_rewrite(t, ("ts", "role"), order="zorder")
    with pytest.raises(ValueError, match="unknown cluster order"):
        cluster_rewrite(t, ("ts",), order="hilbert")


def test_zorder_date_column(spark, tmpdir_path):
    """DateType z-order columns rank via unix_date (epoch days); their
    bounds — manifest ISO strings or datetime.date from the agg
    fallback — must convert to the same basis instead of crashing."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("day", T.DateType(), True),
    ])
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "zd"), schema,
        n_buckets=2, stat_cols=("day", "turn_idx"),
    )
    ddl = "lsn long, conv_id string, turn_idx int, text string, day date"
    rows = [
        (i, f"c{i % 100:03d}", (i * 13) % 500, f"t-{i}",
         dt.date(2024, 1, 1) + dt.timedelta(days=(i * 7) % 365))
        for i in range(1200)
    ]
    merge_append(t, spark.createDataFrame(rows, ddl), batch_id="b0")
    want = sorted((r.conv_id, r.turn_idx, r.text) for r in t.scan().collect())

    st = cluster_rewrite(t, ("day", "turn_idx"), target_rows_per_file=80,
                         order="zorder")
    assert st is not None and st.rows_before == st.rows_after
    got = sorted((r.conv_id, r.turn_idx, r.text) for r in t.scan().collect())
    assert got == want and got
    # pruning on the date dimension actually works post-cluster
    n = len(t.files())
    kept = len(t.prune_for_range("day", dt.date(2024, 3, 1), dt.date(2024, 4, 1)))
    assert kept < n


def test_cluster_rewrite_guards_and_tombstones(spark, tmpdir_path):
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "cg"), transcript_schema(),
        n_buckets=2, stat_cols=(),
    )
    merge_append(t, _spanning_batch(spark, 0, 50, "a"), batch_id="a")
    with pytest.raises(ValueError, match="no manifest stats"):
        cluster_rewrite(t, ("ts",))

    # tombstones survive the rewrite (resurrection protection)
    t2 = LakeTable.create(
        spark, os.path.join(tmpdir_path, "ct"), transcript_schema(),
        n_buckets=2, stat_cols=("ts",),
    )
    merge_append(t2, _spanning_batch(spark, 0, 50, "a"), batch_id="a")
    dels = spark.createDataFrame(
        [(10_000, "c0001", 0, "user", None, None, dt.datetime(2024, 1, 2), "D")],
        DDL + ", op string",
    )
    merge_append(t2, dels, batch_id="del", op_col="op")
    live_before = t2.scan().count()
    cluster_rewrite(t2, ("ts",), target_rows_per_file=40)
    assert t2.scan().count() == live_before
    # the tombstone row physically survives in the clustered files
    internals = t2.scan(include_internal=True)
    assert internals.where(F.col("_tombstone")).count() == 1
