"""LSM-style tiered compaction: minors fold deltas only (base
untouched, O(delta) writes), majors reclaim tombstones and clear the
resolve flag — bounded write amplification for sustained ingest."""

import os

import pytest
from pyspark.sql import functions as F

from ds_floodexposure_monitoring_spark.datagen.transcripts import transcript_schema
from ds_floodexposure_monitoring_spark.operators.compact import compact, merge_append
from ds_floodexposure_monitoring_spark.sources.lake import TOMBSTONE_COL, LakeTable

DDL = "lsn long, conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def _batch(spark, lo, n, text="t"):
    rows = [
        (lo + i, f"c{(lo + i) % 10}", (lo + i) // 10, "user",
         f"{text}-{lo + i}", None, None)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, DDL)


@pytest.fixture()
def table(spark, tmpdir_path):
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), transcript_schema(), n_buckets=4
    )
    # a big base + 3 small delta batches per bucket
    merge_append(t, _batch(spark, 0, 400), batch_id="base")
    compact(t, min_files_per_bucket=1)  # fold into one base file/bucket
    for i in range(3):
        merge_append(t, _batch(spark, 400 + 40 * i, 40, text=f"d{i}"), batch_id=f"d{i}")
    return t


def _state(t):
    return sorted((r.conv_id, r.turn_idx, r.text) for r in t.scan().collect())


def test_minor_folds_deltas_and_leaves_base(spark, table):
    want = _state(table)
    by_bucket = {}
    for f in table.files():
        by_bucket.setdefault(f.bucket, []).append(f)
    bases = {b: max(fs, key=lambda f: (f.rows, f.path)).path for b, fs in by_bucket.items()}
    total_rows = table.total_rows()
    base_rows = sum(
        max(fs, key=lambda f: (f.rows, f.path)).rows for fs in by_bucket.values()
    )
    st = compact(table, min_files_per_bucket=3, mode="minor")
    assert st is not None and st.mode == "minor"
    # every base file survived by reference; deltas folded to 1/bucket
    after = {f.path for f in table.files()}
    assert set(bases.values()) <= after
    by_bucket_after = {}
    for f in table.files():
        by_bucket_after.setdefault(f.bucket, []).append(f)
    assert all(len(fs) == 2 for fs in by_bucket_after.values())
    # write cost was O(deltas): the minor never read or wrote base rows
    assert st.rows_before == total_rows - base_rows
    # logical state unchanged; snapshot still marked for scan-resolve
    assert _state(table) == want
    assert table.current()["requires_resolve"] is True
    assert table.current()["summary"]["operation"] == "compact-minor"


def test_minor_rejects_tombstone_watermark(spark, table):
    with pytest.raises(ValueError):
        compact(table, mode="minor", tombstone_watermark_lsn=10_000)


def test_tombstone_survives_minor_then_major_reclaims(spark, table):
    # delete one conversation via a CDC delete event (tombstone delta)
    dels = spark.createDataFrame(
        [(9_000 + i, "c3", i, "user", None, None, None, "D") for i in range(60)],
        DDL + ", op string",
    )
    merge_append(table, dels, lsn_col="lsn", op_col="op", batch_id="del")
    assert table.scan().where(F.col("conv_id") == "c3").count() == 0
    compact(table, min_files_per_bucket=3, mode="minor")
    # tombstones still present (resurrection protection intact)
    dead = table.scan(include_internal=True).where(
        F.coalesce(F.col(TOMBSTONE_COL), F.lit(False))
    )
    assert dead.count() > 0
    assert table.scan().where(F.col("conv_id") == "c3").count() == 0
    # a stale pre-delete update must still lose after the minor
    stale = spark.createDataFrame([(5, "c3", 0, "user", "stale", None, None)], DDL)
    merge_append(table, stale, batch_id="stale")
    assert table.scan().where(F.col("conv_id") == "c3").count() == 0
    # major with a watermark physically reclaims the tombstones
    compact(table, min_files_per_bucket=1, mode="major", tombstone_watermark_lsn=2**62)
    dead2 = table.scan(include_internal=True).where(
        F.coalesce(F.col(TOMBSTONE_COL), F.lit(False))
    )
    assert dead2.count() == 0
    assert table.current()["requires_resolve"] is False


def test_minor_noop_below_three_files(spark, tmpdir_path):
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t2"), transcript_schema(), n_buckets=2
    )
    merge_append(t, _batch(spark, 0, 40), batch_id="b0")
    merge_append(t, _batch(spark, 40, 40), batch_id="b1")
    # 2 files/bucket: folding one delta into itself is pure write amp
    assert compact(t, min_files_per_bucket=2, mode="minor") is None


def test_mor_dml_correction_survives_minor(spark, table):
    from ds_floodexposure_monitoring_spark.operators.dml import update_where_mor

    update_where_mor(table, F.col("conv_id") == "c2", {"text": F.lit("REDACTED")})
    compact(table, min_files_per_bucket=3, mode="minor")
    got = {r.text for r in table.scan().where(F.col("conv_id") == "c2").collect()}
    assert got == {"REDACTED"}
    # redelivery of an original event still loses post-minor
    orig = [r for r in _batch(spark, 0, 400).collect() if r.conv_id == "c2"][0]
    merge_append(table, spark.createDataFrame([orig], DDL), batch_id="redeliver")
    got = {r.text for r in table.scan().where(F.col("conv_id") == "c2").collect()}
    assert got == {"REDACTED"}


def test_pipeline_tiered_policy(spark, tmpdir_path):
    from ds_floodexposure_monitoring_spark.datagen import (
        ChangeLogSpec,
        generate_changelog,
    )
    from ds_floodexposure_monitoring_spark.streaming.runner import CDCPipeline

    log = os.path.join(tmpdir_path, "log")
    generate_changelog(
        spark,
        ChangeLogSpec(
            n_events=8_000, n_convs=100, n_shards=2, dup_rate=0.05,
            delete_rate=0.02, ooo_window=100, schema_change_at=None,
            events_per_file=500, seed=13,
        ),
        log,
    )
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t3"), transcript_schema(), n_buckets=4
    )
    pipe = CDCPipeline(
        spark, log, t, os.path.join(tmpdir_path, "ckpt"),
        max_events_per_batch=1_000, mode="mor",
        compact_every=2, compact_min_files=3,
        compact_mode="tiered", major_every=4,
    )
    pipe.run_until_caught_up()
    ops = [s["summary"]["operation"] for s in t.snapshots()]
    assert "compact-minor" in ops
    assert "compact-major" in ops  # every 4th compaction
    # final state == DuckDB-free LWW oracle over the generated log
    import duckdb
    import glob as g

    con = duckdb.connect()
    files = sorted(g.glob(f"{log}/**/*.parquet", recursive=True))
    con.execute(
        f"CREATE VIEW log AS SELECT * FROM read_parquet({files!r}, union_by_name=true)"
    )
    want = con.sql("""
      SELECT conv_id, turn_idx, text FROM (
        SELECT * FROM log
        QUALIFY row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) = 1
      ) WHERE op <> 'D' ORDER BY conv_id, turn_idx
    """).fetchall()
    got = sorted((r.conv_id, r.turn_idx, r.text) for r in t.scan().collect())
    assert got == [tuple(w) for w in want]


def test_minor_exempts_flagged_base_not_jumbo_delta(spark, tmpdir_path):
    """ADVICE r2: a delta batch LARGER than the base must still be
    folded by a minor — base exemption keys off the manifest's ``base``
    flag (set by majors/COW resolves), not file size."""
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "jumbo"), transcript_schema(), n_buckets=2
    )
    merge_append(t, _batch(spark, 0, 60), batch_id="seed")
    compact(t, min_files_per_bucket=1)  # major -> flagged base files
    base_paths = {f.path for f in t.files()}
    assert all(f.base for f in t.files())
    # jumbo delta (bigger than the base) + two small deltas
    merge_append(t, _batch(spark, 1000, 300, text="jumbo"), batch_id="jumbo")
    merge_append(t, _batch(spark, 2000, 20, text="s1"), batch_id="s1")
    merge_append(t, _batch(spark, 3000, 20, text="s2"), batch_id="s2")
    want = _state(t)
    st = compact(t, min_files_per_bucket=3, mode="minor")
    assert st is not None
    after = {f.path for f in t.files()}
    # the flagged bases survived; the jumbo delta did NOT (it was folded)
    assert base_paths <= after
    by_bucket = {}
    for f in t.files():
        by_bucket.setdefault(f.bucket, []).append(f)
    for fs in by_bucket.values():
        assert len(fs) == 2
        flags = sorted(f.base for f in fs)
        assert flags == [False, True]  # one base + one folded delta
    assert _state(t) == want


def test_major_marks_outputs_as_base(spark, table):
    compact(table, min_files_per_bucket=1, mode="major")
    assert table.files() and all(f.base for f in table.files())
