"""End-to-end replay tests: the engine's final table state must match a
naive DuckDB last-writer-wins oracle byte-for-byte on per-turn ``text``
under stable (conv_id, turn_idx) ordering — with injected duplicates,
out-of-order delivery, and a mid-stream schema change
(north_rule; the reference's 'recompute only changed region-days'
semantics as tests, SURVEY.md §5)."""

import glob
import os

import duckdb
import pytest

from ds_floodexposure_monitoring_spark.datagen.transcripts import (
    ChangeLogSpec,
    generate_changelog,
    transcript_schema,
)
from ds_floodexposure_monitoring_spark.sources.lake import LakeTable
from ds_floodexposure_monitoring_spark.streaming.runner import CDCPipeline

SPEC = ChangeLogSpec(
    n_events=20_000,
    n_convs=300,
    n_shards=3,
    dup_rate=0.08,
    delete_rate=0.03,
    ooo_window=400,
    schema_change_at=12_000,
    events_per_file=2_500,
    seed=7,
)


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("replay"))
    changelog = os.path.join(root, "changelog")
    manifest = generate_changelog(spark, SPEC, changelog)
    assert manifest["n_files"] >= SPEC.n_shards
    return root, changelog


def oracle_state(changelog_dir):
    files = sorted(glob.glob(os.path.join(changelog_dir, "shard=*", "events-*.parquet")))
    q = f"""
    WITH lww AS (
        SELECT op, conv_id, turn_idx, role, text, tool,
               CAST(ts AS TIMESTAMP) AS ts, model
        FROM read_parquet({files!r}, union_by_name=true)
        QUALIFY row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) = 1
    )
    SELECT conv_id, turn_idx, role, text, tool, ts, model FROM lww
    WHERE op <> 'D'   -- a key whose last writer is a delete is gone
    ORDER BY conv_id, turn_idx
    """
    return duckdb.sql(q).fetchall()


def engine_state(table):
    return [
        (r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts, r.model)
        for r in sorted(table.scan().collect(), key=lambda r: (r.conv_id, r.turn_idx))
    ]


def make_pipeline(spark, root, changelog, name, max_events=6_000, mode="cow"):
    tdir = os.path.join(root, name, "table")
    if LakeTable.exists(tdir):
        table = LakeTable.load(spark, tdir)
    else:
        table = LakeTable.create(spark, tdir, transcript_schema(), n_buckets=16)
    return CDCPipeline(
        spark,
        changelog,
        table,
        checkpoint_dir=os.path.join(root, name, "ckpt"),
        metrics_dir=os.path.join(root, name, "metrics"),
        max_events_per_batch=max_events,
        target_rows_per_file=50_000,
        mode=mode,
        compact_every=3,
        compact_min_files=3,
    )


def test_full_replay_matches_oracle(spark, env):
    root, changelog = env
    pipe = make_pipeline(spark, root, changelog, "full")
    results = pipe.run_until_caught_up()
    assert len(results) >= 3  # several micro-batches
    assert all(not r.replayed for r in results)

    got = engine_state(pipe.table)
    want = oracle_state(changelog)
    assert len(got) == len(want)
    # byte-for-byte text equality under stable (conv_id, turn_idx) order
    assert [g[3] for g in got] == [w[3] for w in want]
    assert got == want

    # schema evolved mid-stream: model column exists, turn_idx widened
    dt = dict(pipe.table.scan().dtypes)
    assert dt["model"] == "string"
    assert dt["turn_idx"] == "bigint"

    # lineage: every batch linked source offsets -> snapshot version
    m = pipe.metrics.read().orderBy("batch_seq").collect()
    assert [r.batch_seq for r in m] == list(range(1, len(results) + 1))
    assert all(r.events_per_sec > 0 for r in m)
    assert sum(r.events for r in m) >= SPEC.n_events  # includes redeliveries
    # source lag: strictly draining to 0 at catch-up (plan-time metadata)
    lags = [r.source_lag_events for r in m]
    assert lags[-1] == 0 and lags[0] > 0
    assert lags == sorted(lags, reverse=True)


def test_rerun_after_caught_up_is_noop(spark, env):
    root, changelog = env
    pipe = make_pipeline(spark, root, changelog, "full")
    version = pipe.table.version
    assert pipe.run_once() is None
    assert pipe.table.version == version


def test_crash_between_commit_and_checkpoint_no_double_apply(spark, env):
    """Simulate: snapshot committed, checkpoint write lost. Resume must
    detect the replay by batch_id and not double-apply."""
    from ds_floodexposure_monitoring_spark.operators.merge import merge_into

    root, changelog = env
    pipe = make_pipeline(spark, root, changelog, "crash")
    r1 = pipe.run_once()
    assert r1 and not r1.replayed

    # crash window: apply batch 2's merge WITHOUT advancing the checkpoint
    state = pipe.ckpt.read()
    batch2 = pipe.reader.plan_batch(state.offsets, state.batch_seq + 1)
    merge_into(
        pipe.table, pipe.reader.read_batch(batch2), op_col="op", batch_id=batch2.batch_id
    )
    version_after_crash = pipe.table.version

    # resume: same batch replanned, detected as already applied
    r2 = pipe.run_once()
    assert r2.replayed
    assert r2.batch.batch_id == batch2.batch_id
    assert pipe.table.version == version_after_crash  # no second snapshot

    # finish and match oracle exactly
    pipe.run_until_caught_up()
    got = engine_state(pipe.table)
    want = oracle_state(changelog)
    assert got == want


def test_resume_from_fresh_checkpoint_skips_all(spark, env):
    """Blow away the checkpoint: every batch is replanned identically,
    recognized as committed, and skipped — table state unchanged."""
    import shutil

    root, changelog = env
    pipe = make_pipeline(spark, root, changelog, "full")
    before = engine_state(pipe.table)
    version = pipe.table.version
    shutil.rmtree(pipe.ckpt.dir)
    pipe2 = make_pipeline(spark, root, changelog, "full")
    results = pipe2.run_until_caught_up()
    assert results and all(r.replayed for r in results)
    assert pipe2.table.version == version
    assert engine_state(pipe2.table) == before


def test_mor_mode_matches_oracle_with_compaction(spark, env):
    """Merge-on-read pipeline (delta appends + scan-time LWW resolve +
    periodic compaction) must reach the identical final state."""
    root, changelog = env
    pipe = make_pipeline(spark, root, changelog, "mor", mode="mor")
    results = pipe.run_until_caught_up()
    assert len(results) >= 3
    # compaction ran at least once (snapshot count > batch count + 1)
    ops = [s["summary"]["operation"] for s in pipe.table.snapshots()]
    assert "compact-major" in ops and "merge-append" in ops
    assert engine_state(pipe.table) == oracle_state(changelog)
    # time travel still works across append + compact snapshots
    assert pipe.table.scan(version=2).count() > 0


def test_mor_compact_tombstone_watermark(spark, env):
    """Compaction with an LSN watermark physically drops old tombstones
    without changing the visible state."""
    from ds_floodexposure_monitoring_spark.operators.compact import compact

    root, changelog = env
    pipe = make_pipeline(spark, root, changelog, "morwm", mode="mor")
    pipe.run_until_caught_up()
    before = engine_state(pipe.table)
    rows_with_tombstones = pipe.table.total_rows()
    st = compact(
        pipe.table, min_files_per_bucket=1, tombstone_watermark_lsn=10**12
    )
    assert st is not None and st.rows_after < rows_with_tombstones
    assert engine_state(pipe.table) == before


def test_retention_in_pipeline_bounds_storage_matches_oracle(spark, env):
    """Pipeline with periodic snapshot expiration: the final state still
    matches the oracle, no stranded physical files remain beyond what
    retained snapshots reference, and the snapshot log stays bounded.
    (Correctness does not even depend on replay detection across the
    expired horizon: merge is order-corrected LWW, so re-applying an old
    batch is a no-op — older LSNs lose to current rows and tombstones.)"""
    root, changelog = env
    tdir = os.path.join(root, "retention", "table")
    table = LakeTable.create(spark, tdir, transcript_schema(), n_buckets=16)
    pipe = CDCPipeline(
        spark,
        changelog,
        table,
        checkpoint_dir=os.path.join(root, "retention", "ckpt"),
        max_events_per_batch=4_000,
        target_rows_per_file=50_000,
        mode="mor",
        compact_every=2,
        compact_min_files=2,
        expire_every=2,
        keep_snapshots=3,
        orphan_grace_sec=0.0,
    )
    results = pipe.run_until_caught_up()
    assert len(results) >= 4
    assert engine_state(pipe.table) == oracle_state(changelog)

    snaps = pipe.table.snapshots()
    assert len(snaps) <= 3 + 2 * pipe.expire_every  # bounded, not ever-growing
    referenced = {d["path"] for s in snaps for d in s["files"]}
    physical = {
        os.path.relpath(p, pipe.table.path)
        for p in glob.glob(os.path.join(pipe.table.path, "data", "**", "*.parquet"), recursive=True)
    }
    assert physical == referenced  # zero stranded files


def test_different_batch_sizes_same_final_state(spark, env):
    root, changelog = env
    pipe = make_pipeline(spark, root, changelog, "bigbatch", max_events=1_000_000)
    results = pipe.run_until_caught_up()
    assert len(results) == 1
    assert engine_state(pipe.table) == oracle_state(changelog)
