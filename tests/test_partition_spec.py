"""Value-partition transforms (Iceberg partition-spec analog): writers
split files by days(ts)-style transform values, reads bounded on the
source column prune at exact partition granularity, whole partitions
drop by metadata alone, and MOR pruning is key-range-closure sound."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from ds_floodexposure_monitoring_spark.datagen.transcripts import transcript_schema
from ds_floodexposure_monitoring_spark.operators.compact import compact, merge_append
from ds_floodexposure_monitoring_spark.operators.merge import merge_into
from ds_floodexposure_monitoring_spark.sources.lake import (
    LakeTable,
    _parse_partition_spec,
    _partition_value_range,
)

DDL = "lsn long, conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def _batch(spark, lo, n, day, text="t"):
    rows = [
        (lo + i, f"c{(lo + i) % 10}", (lo + i) // 10, "user", f"{text}-{lo + i}",
         None, dt.datetime(2024, 1, day, i % 24))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, DDL)


@pytest.fixture()
def table(spark, tmpdir_path):
    return LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), transcript_schema(),
        n_buckets=4, partition_by="days(ts)",
    )


def test_parse_and_value_range():
    assert _parse_partition_spec("days(ts)") == {"transform": "days", "col": "ts"}
    assert _parse_partition_spec("conv_id") == {"transform": "identity", "col": "conv_id"}
    with pytest.raises(ValueError):
        _parse_partition_spec("buckets(ts)")
    day_us = 86_400_000_000
    spec = {"transform": "days", "col": "ts"}
    assert _partition_value_range(spec, 0, day_us - 1) == (0, 0)
    assert _partition_value_range(spec, day_us, 3 * day_us) == (1, 3)
    mspec = {"transform": "months", "col": "ts"}
    jan1_2024_us = int(
        (dt.datetime(2024, 1, 1) - dt.datetime(1970, 1, 1)).total_seconds() * 1e6
    )
    assert _partition_value_range(mspec, jan1_2024_us, jan1_2024_us) == (648, 648)


def test_writer_splits_files_by_partition_value(spark, table):
    # one COW merge spanning 3 days -> every file carries ONE day value
    b = _batch(spark, 0, 40, 1).union(_batch(spark, 100, 40, 2)).union(
        _batch(spark, 200, 40, 3)
    )
    merge_into(table, b, batch_id="seed")
    days = {f.part for f in table.files()}
    assert days == {19723, 19724, 19725}  # 2024-01-01..03 as epoch days
    # physical layout mirrors it (b=<bucket>/p=<day>/) and all rows in a
    # file share the partition value
    for f in table.files():
        assert f"p={f.part}" in f.path or f"_p={f.part}" in f.path
        vals = (
            spark.read.parquet(os.path.join(table.path, f.path))
            .select(F.datediff("ts", F.lit("1970-01-01")).alias("d"))
            .distinct()
            .collect()
        )
        assert {r["d"] for r in vals} == {f.part}


def test_partition_pruned_read_resolved_and_mor(spark, table):
    for day in (1, 2, 3):
        merge_into(table, _batch(spark, day * 1000, 40, day), batch_id=f"d{day}")
    total = len(table.files())
    lo, hi = dt.datetime(2024, 1, 3), dt.datetime(2024, 1, 4)
    pruned = table.prune_for_range("ts", lo, hi)
    assert 0 < len(pruned) < total
    assert all(f.part == 19725 for f in pruned)
    want = table.scan().where(F.col("ts") >= F.lit(lo)).count()
    assert table.scan_range("ts", lo, hi).count() == want == 40

    # MOR deltas: pruning keeps the key-range closure, results stay exact
    merge_append(table, _batch(spark, 5000, 40, 3, text="late"), batch_id="late")
    assert table.current()["requires_resolve"] is True
    pruned_mor = table.prune_for_range("ts", lo, hi)
    assert len(pruned_mor) < len(table.files()) + 1  # no blow-up to all
    got = table.scan_range("ts", lo, hi).count()
    want = table.scan().where(
        (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi))
    ).count()
    assert got == want


def test_mor_prune_never_returns_stale_version(spark, table):
    """A key updated OUT of the queried day range must not reappear via
    its stale in-range version after pruning (the closure guarantee)."""
    merge_into(table, _batch(spark, 0, 40, 1), batch_id="day1")
    # move every day-1 key to day 5 with a higher LSN, as MOR deltas
    moved = _batch(spark, 0, 40, 5, text="moved").withColumn(
        "lsn", F.col("lsn") + 10_000
    )
    merge_append(table, moved, batch_id="moved")
    lo, hi = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)
    got = table.scan_range("ts", lo, hi).count()
    assert got == 0  # every winner now lives on day 5


def test_drop_partitions_metadata_only(spark, table):
    for day in (1, 2, 3):
        merge_into(table, _batch(spark, day * 1000, 40, day), batch_id=f"d{day}")
    paths_before = {f.path for f in table.files()}
    snap = table.drop_partitions(dt.datetime(2024, 1, 3))
    assert snap is not None
    assert snap["summary"]["operation"] == "drop-partitions"
    assert snap["summary"]["rows_dropped"] == 80
    assert table.scan().count() == 40
    # zero writes: surviving files are the same physical files
    assert {f.path for f in table.files()} <= paths_before
    assert all(f.part == 19725 for f in table.files())
    # dropped bytes still on disk until vacuum (snapshots retained)
    assert table.drop_partitions(dt.datetime(2024, 1, 3)) is None  # idempotent


def test_drop_partitions_refuses_mor(spark, table):
    merge_append(table, _batch(spark, 0, 40, 1), batch_id="d1")
    with pytest.raises(ValueError, match="resolved"):
        table.drop_partitions(dt.datetime(2024, 2, 1))
    compact(table, min_files_per_bucket=1)  # resolve
    assert table.drop_partitions(dt.datetime(2024, 2, 1)) is not None
    assert table.scan().count() == 0


def test_partition_col_ddl_guards(spark, table):
    with pytest.raises(ValueError, match="partition source"):
        table.rename_column("ts", "event_ts")
    with pytest.raises(ValueError, match="partition source"):
        table.drop_column("ts")


def test_predicate_prune_uses_partition_values(spark, table):
    for day in (1, 2, 3):
        merge_into(table, _batch(spark, day * 1000, 40, day), batch_id=f"d{day}")
    cond = "ts >= timestamp'2024-01-02 00:00:00' AND ts < timestamp'2024-01-03 00:00:00'"
    pruned = table.prune_for_predicate(cond)
    assert {f.part for f in pruned} == {19724}
    assert table.scan(files=pruned).where(cond).count() == 40


def test_null_partition_values_survive_and_never_prune(spark, table):
    rows = [(1, "c1", 0, "user", "x", None, None)]  # null ts
    merge_into(table, spark.createDataFrame(rows, DDL), batch_id="nulls")
    f = table.files()[0]
    assert f.part is None
    assert "p=__null__" in f.path or "_p=__HIVE_DEFAULT_PARTITION__" in f.path
    # null-partition files are kept by every partition prune
    assert table.prune_for_range(
        "ts", dt.datetime(2030, 1, 1), dt.datetime(2031, 1, 1)
    ) == table.files()
    assert table.drop_partitions(dt.datetime(2030, 1, 1)) is None
    assert table.scan().count() == 1


def test_jvm_writer_mode_equivalent(spark, tmpdir_path, monkeypatch):
    """SPARK_GRAFT_WRITER=jvm (Tungsten write + distributed footer
    stats) produces the same logical state and equivalent manifests as
    the default arrow task writer, on a partitioned table."""
    monkeypatch.setenv("SPARK_GRAFT_WRITER", "jvm")
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "jvmw"), transcript_schema(),
        n_buckets=4, partition_by="days(ts)", stat_cols=("ts",),
    )
    b = _batch(spark, 0, 40, 1).union(_batch(spark, 100, 40, 2))
    merge_into(t, b, batch_id="seed")
    merge_append(t, _batch(spark, 5000, 20, 2, text="d2"), batch_id="d2")
    files = t.files()
    assert {f.part for f in files} == {19723, 19724}
    assert all(f.min_key is not None and f.max_key is not None for f in files)
    assert all((f.col_stats or {}).get("ts") for f in files)
    assert t.scan().count() == 100
    monkeypatch.setenv("SPARK_GRAFT_WRITER", "arrow")
    want = sorted((r.conv_id, r.turn_idx, r.text) for r in t.scan().collect())
    # a later arrow-mode write interoperates on the same table
    merge_into(t, _batch(spark, 9000, 10, 3, text="arrow"), batch_id="a1")
    assert t.scan().count() == 110
    got = sorted(
        (r.conv_id, r.turn_idx, r.text)
        for r in t.scan().where(~F.col("text").startswith("arrow")).collect()
    )
    assert got == want
