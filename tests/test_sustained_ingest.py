"""Sustained-ingest soak: many micro-batches with in-loop compaction +
snapshot expiration must keep on-disk storage BOUNDED (a constant factor
of the live data, never linear in batch count) while the final state
still matches the change-log oracle — the 10^10-event storage story."""

import glob
import os

import duckdb
from ds_floodexposure_monitoring_spark.datagen import ChangeLogSpec, generate_changelog
from ds_floodexposure_monitoring_spark.datagen.transcripts import transcript_schema
from ds_floodexposure_monitoring_spark.sources.lake import LakeTable
from ds_floodexposure_monitoring_spark.streaming.runner import CDCPipeline

SPEC = ChangeLogSpec(
    n_events=60_000, n_convs=400, n_shards=4, dup_rate=0.08, delete_rate=0.03,
    ooo_window=500, schema_change_at=None, events_per_file=3_000, seed=13,
)


def _data_bytes(table_dir: str) -> int:
    return sum(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(table_dir, "data", "**", "*.parquet"), recursive=True)
    )


def test_storage_bounded_under_sustained_ingest(spark, tmpdir_path):
    log = os.path.join(tmpdir_path, "log")
    generate_changelog(spark, SPEC, log)

    # baseline: the same data applied in ONE batch = the live-data size
    base = LakeTable.create(spark, os.path.join(tmpdir_path, "base"), transcript_schema(), n_buckets=8)
    CDCPipeline(spark, log, base, os.path.join(tmpdir_path, "ckptb"),
                metrics_dir=None, max_events_per_batch=10**9, mode="mor",
                compact_every=1, compact_min_files=2).run_until_caught_up()
    b0 = _data_bytes(base.path)

    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"), transcript_schema(), n_buckets=8)
    pipe = CDCPipeline(
        spark, log, t, os.path.join(tmpdir_path, "ckpt"), metrics_dir=None,
        max_events_per_batch=3_000, mode="mor",
        compact_every=4, compact_min_files=2,
        expire_every=4, keep_snapshots=3, orphan_grace_sec=0.0,
    )
    peak = 0
    n_batches = 0
    while True:
        r = pipe.run_once()
        if r is None:
            break
        n_batches += 1
        peak = max(peak, _data_bytes(t.path))
    assert n_batches >= 15  # genuinely sustained, not one-shot

    # steady-state bound: retention keeps <=3 snapshots of history, so
    # storage is a small constant factor of live data — NOT O(batches)
    t.expire_snapshots(keep_last=2, orphan_grace_sec=0.0)
    assert _data_bytes(t.path) <= 4 * b0, (_data_bytes(t.path), b0)
    assert peak <= 10 * b0, (peak, b0)  # even mid-flight, bounded
    assert len(t.snapshots()) <= 4

    # and the state survived all that churn byte-for-byte
    con = duckdb.connect()
    files = sorted(glob.glob(f"{log}/**/*.parquet", recursive=True))
    want = con.sql(
        f"""SELECT conv_id, turn_idx, text FROM (
              SELECT * FROM read_parquet({files!r}, union_by_name=true)
              QUALIFY row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) = 1
            ) WHERE op <> 'D' ORDER BY conv_id, turn_idx"""
    ).fetchall()
    got = sorted(
        (r.conv_id, r.turn_idx, r.text)
        for r in t.scan().select("conv_id", "turn_idx", "text").collect()
    )
    assert got == [tuple(w) for w in want]
