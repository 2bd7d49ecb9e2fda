"""Metadata-only column rename/drop (Iceberg RENAME/DROP COLUMN analog):
no file rewrites, old files mapped forward through the rename chain,
drops can never resurrect after a same-name re-add."""

import os

import pytest
from pyspark.sql import functions as F

from ds_floodexposure_monitoring_spark.datagen.transcripts import transcript_schema
from ds_floodexposure_monitoring_spark.operators.compact import merge_append
from ds_floodexposure_monitoring_spark.sources.lake import LakeTable

DDL = "lsn long, conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def _batch(spark, lo, n, ddl=DDL, extra=()):
    rows = [
        (lo + i, f"c{(lo + i) % 10}", (lo + i) // 10, "user",
         f"t-{lo + i}", None, None, *extra)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ddl)


@pytest.fixture()
def table(spark, tmpdir_path):
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), transcript_schema(), n_buckets=4
    )
    merge_append(t, _batch(spark, 0, 100), batch_id="seed")
    return t


def test_rename_is_metadata_only_and_maps_old_files(spark, table):
    files_before = {f.path for f in table.files()}
    want = sorted((r.conv_id, r.turn_idx, r.text) for r in table.scan().collect())
    snap = table.rename_column("text", "body")
    assert snap["summary"]["operation"] == "rename-column"
    assert {f.path for f in table.files()} == files_before  # zero rewrites
    got = sorted((r.conv_id, r.turn_idx, r.body) for r in table.scan().collect())
    assert got == want
    assert "text" not in table.scan().columns
    # new batches write under the new name and merge with old files
    nb = _batch(spark, 1000, 20).withColumnRenamed("text", "body")
    merge_append(table, nb, batch_id="post-rename")
    n = table.scan().where(F.col("body").startswith("t-10")).count()
    assert n >= 20
    # time travel: the pre-rename snapshot still reads under its own name
    old = table.scan(version=snap["version"] - 1)
    assert "text" in old.columns and "body" not in old.columns


def test_rename_validation(spark, table):
    with pytest.raises(ValueError):
        table.rename_column("conv_id", "cid")  # merge key
    with pytest.raises(ValueError):
        table.rename_column("nope", "x")
    with pytest.raises(ValueError):
        table.rename_column("text", "role")  # exists
    with pytest.raises(ValueError):
        table.rename_column("text", "_lsn")  # internal


def test_drop_then_readd_does_not_resurrect(spark, table):
    table.drop_column("tool")
    assert "tool" not in table.scan().columns
    # re-add 'tool' via schema evolution with real values
    nb = _batch(spark, 1000, 20).withColumn("tool", F.lit("grep"))
    merge_append(table, nb, batch_id="readd")
    rows = table.scan().select("conv_id", "turn_idx", "tool").collect()
    with_vals = [r for r in rows if r.tool is not None]
    assert len(with_vals) == 20 and all(r.tool == "grep" for r in with_vals)
    # pre-drop rows surface NULL, never their old stored bytes
    nulls = [r for r in rows if r.tool is None]
    assert len(nulls) == table.scan().count() - 20


def test_change_feed_across_rename(spark, table):
    v0 = table.version
    table.rename_column("text", "body")
    upd = _batch(spark, 2000, 5).withColumnRenamed("text", "body").withColumn(
        "body", F.lit("edited")
    )
    merge_append(table, upd, batch_id="upd")
    feed = table.scan_changes(v0).collect()
    # only the 5 genuinely-changed keys appear — the rename itself is
    # invisible to the diff (same logical column, mapped forward)
    assert len(feed) == 5
    assert {r["change_type"] for r in feed} <= {"insert", "update"}
    assert all(r["body"] == "edited" for r in feed)


def test_rollback_across_rename_restores_schema(spark, table):
    v0 = table.version
    table.rename_column("text", "body")
    table.rollback(v0)
    assert "text" in table.scan().columns and "body" not in table.scan().columns
    # and the rename chain was restored too: a fresh rename still works
    table.rename_column("text", "content")
    assert "content" in table.scan().columns
