"""Structured Streaming adapter: streaming MERGE must reach the same
final table state as the batch pipeline / oracle."""

import glob
import os

import duckdb

from ds_floodexposure_monitoring_spark.datagen.transcripts import (
    ChangeLogSpec,
    generate_changelog,
    transcript_schema,
)
from ds_floodexposure_monitoring_spark.sources.lake import LakeTable
from ds_floodexposure_monitoring_spark.streaming.stream import (
    run_windowed_counts_sync,
    stream_changelog_into,
)

SPEC = ChangeLogSpec(
    n_events=8_000,
    n_convs=150,
    n_shards=2,
    dup_rate=0.05,
    delete_rate=0.02,
    ooo_window=200,
    schema_change_at=None,  # fixed schema: file streaming source requirement
    events_per_file=1_500,
    seed=13,
)


def test_streaming_merge_matches_oracle(spark, tmpdir_path):
    changelog = os.path.join(tmpdir_path, "log")
    generate_changelog(spark, SPEC, changelog)
    table = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), transcript_schema(), n_buckets=8
    )
    sample = glob.glob(os.path.join(changelog, "shard=*", "*.parquet"))[0]
    schema = spark.read.parquet(sample).schema
    q = stream_changelog_into(
        spark,
        os.path.join(changelog, "shard=*"),
        table,
        schema,
        os.path.join(tmpdir_path, "ckpt"),
        max_files_per_trigger=2,
    )
    q.awaitTermination(300)  # availableNow trigger: terminates when drained

    files = sorted(glob.glob(os.path.join(changelog, "shard=*", "events-*.parquet")))
    want = duckdb.sql(
        f"""
        WITH lww AS (
          SELECT op, conv_id, turn_idx, text FROM read_parquet({files!r})
          QUALIFY row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) = 1
        )
        SELECT conv_id, turn_idx, text FROM lww WHERE op <> 'D'
        ORDER BY conv_id, turn_idx
        """
    ).fetchall()
    got = sorted(
        (r.conv_id, r.turn_idx, r.text) for r in table.scan().collect()
    )
    assert got == [tuple(w) for w in want]
    assert table.version > 1  # several epochs committed


def test_windowed_counts_sync(spark):
    df = run_windowed_counts_sync(spark, "/root/testdata/sf0.001/events.parquet")
    rows = df.collect()
    assert len(rows) > 0
    assert {"win_start", "event_type", "n", "total"} == set(df.columns)


def test_streaming_merge_maintains_index(spark, tmpdir_path):
    """`stream_changelog_into(indexes=...)` keeps the secondary index
    consistent with the final state across epochs."""
    from pyspark.sql import functions as F

    from ds_floodexposure_monitoring_spark.operators import secondary_index as sx

    changelog = os.path.join(tmpdir_path, "log")
    generate_changelog(spark, SPEC, changelog)
    table = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), transcript_schema(), n_buckets=8
    )
    idx = sx.create_index(
        spark, os.path.join(tmpdir_path, "ix"), table, "role", n_buckets=4
    )
    sample = glob.glob(os.path.join(changelog, "shard=*", "*.parquet"))[0]
    schema = spark.read.parquet(sample).schema
    q = stream_changelog_into(
        spark,
        os.path.join(changelog, "shard=*"),
        table,
        schema,
        os.path.join(tmpdir_path, "ckpt"),
        max_files_per_trigger=3,
        indexes={"role": idx},
    )
    q.awaitTermination(300)
    assert idx.version > 1
    roles = [r[0] for r in table.scan().select("role").distinct().collect()
             if r[0] is not None]
    assert roles
    for v in roles:
        want = sorted((r.conv_id, r.turn_idx) for r in
                      table.scan().where(F.col("role") == v).collect())
        got = sorted((r.conv_id, r.turn_idx) for r in
                     sx.lookup(idx, table, "role", [v]).collect())
        assert got == want, (v, len(got), len(want))
