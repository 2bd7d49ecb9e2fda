"""Maintenance planner: manifests decide what runs; the cycle preserves
state byte-for-byte and converges to a nothing-to-do plan."""

import os

from pyspark.sql import types as T

from ds_floodexposure_monitoring_spark.operators.analyze import set_stat_cols
from ds_floodexposure_monitoring_spark.operators.compact import merge_append
from ds_floodexposure_monitoring_spark.operators.maintain import (
    MaintenancePolicy,
    plan_maintenance,
    run_maintenance,
)
from ds_floodexposure_monitoring_spark.sources.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)


def _mk(spark, root, **kw):
    return LakeTable.create(
        spark, os.path.join(root, "t"), SCHEMA, merge_keys=("k",),
        n_buckets=2, **kw,
    )


def _state(t):
    return sorted((r.k, r.n, r.v) for r in t.scan().collect())


def _append(spark, t, lo, hi, tag):
    merge_append(t, spark.createDataFrame(
        [(i, i, i, f"{tag}{i}") for i in range(lo, hi)],
        "lsn long, k long, n long, v string"))


def test_cycle_preserves_state_and_converges(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path)
    for b in range(5):
        _append(spark, t, b * 10, b * 10 + 10, f"b{b}")
    before = _state(t)
    pol = MaintenancePolicy(compact_at_files=3, keep_snapshots=2)

    plan = plan_maintenance(t, pol)
    assert plan.compact_mode == "major"  # all rows are deltas
    assert plan.delta_rows == 50 and plan.total_rows == 50
    assert plan.snapshots_over > 0
    assert not plan.nothing_to_do

    rep = run_maintenance(t, pol)
    assert rep["compact"]["mode"] == "major"
    assert rep["expire"]["expired_snapshots"] > 0
    assert rep["ro_lag_rows"] == 0
    assert _state(t) == before

    # converged: second run plans nothing and commits nothing
    v = t.version
    plan2 = plan_maintenance(t, pol)
    assert plan2.nothing_to_do
    rep2 = run_maintenance(t, pol)
    assert rep2["compact"] is None
    assert rep2["analyze"]["files_analyzed"] == 0
    assert t.version == v


def test_minor_when_deltas_are_small_share(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path)
    _append(spark, t, 0, 100, "base")
    run_maintenance(t, MaintenancePolicy(compact_at_files=1))  # make a base
    # small delta on top of a big base -> minor, bases exempt
    for b in range(3):
        _append(spark, t, 1000 + b, 1001 + b, "d")
    plan = plan_maintenance(t, MaintenancePolicy(compact_at_files=2))
    assert plan.compact_mode == "minor"
    before = _state(t)
    rep = run_maintenance(t, MaintenancePolicy(compact_at_files=2))
    assert rep["compact"]["mode"] == "minor"
    assert _state(t) == before


def test_stats_ddl_makes_files_deficient_then_analyze_heals(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path)
    _append(spark, t, 0, 20, "x")
    run_maintenance(t, MaintenancePolicy(compact_at_files=1))
    assert plan_maintenance(t).nothing_to_do
    # DDL a new stat column: existing files lack its entries
    set_stat_cols(t, ("n",))
    plan = plan_maintenance(t)
    assert plan.deficient_files > 0
    rep = run_maintenance(t)
    assert rep["analyze"]["files_analyzed"] == plan.deficient_files
    assert plan_maintenance(t).nothing_to_do
    assert t.col_sum("n") == sum(range(20))


def test_stale_txn_branch_gc(spark, tmpdir_path):
    """An abandoned pre-WAL txn stage pins its snapshot chain via the
    branch head; maintenance GCs it (never a pending one) so expiry can
    reclaim storage."""
    import os as _os

    from ds_floodexposure_monitoring_spark.sources.txn import (
        MultiTableTransaction,
    )

    t = _mk(spark, tmpdir_path)
    _append(spark, t, 0, 10, "a")
    wal = _os.path.join(tmpdir_path, "wal")

    # abandoned: staged, never committed, coordinator gone
    dead = MultiTableTransaction(wal)
    db = dead.stage(t)
    _append(spark, db, 100, 105, "dead")
    # pending: staged AND has a WAL intent (mid-commit crash)
    from ds_floodexposure_monitoring_spark.sources.lake import _atomic_write
    from ds_floodexposure_monitoring_spark.sources.txn import _wal_path
    import json as _json

    live = MultiTableTransaction(wal)
    lb = live.stage(t)
    _append(spark, lb, 200, 205, "live")
    _atomic_write(_wal_path(wal, live.txn_id), _json.dumps({
        "txn_id": live.txn_id, "branch": live.branch,
        "tables": [{"path": t.path, "target_version": lb.version}]}))

    pol = MaintenancePolicy(
        compact_at_files=10_000, stale_txn_branch_sec=0.0, txn_wal_dir=wal,
    )
    plan = plan_maintenance(t, pol)
    assert plan.stale_txn_branches == 1
    rep = run_maintenance(t, pol)
    assert rep["txn_branches_dropped"] == [dead.branch]
    assert set(t.branches()) == {"main", live.branch}

    # grace respected: a fresh stage with no WAL survives a sane grace
    fresh = MultiTableTransaction(wal)
    fresh.stage(t)
    pol2 = MaintenancePolicy(stale_txn_branch_sec=3600.0, txn_wal_dir=wal)
    assert plan_maintenance(t, pol2).stale_txn_branches == 0


def test_converges_on_multi_base_file_buckets(spark, tmpdir_path):
    """A fully-compacted bucket whose rows legitimately span many base
    files must NOT re-plan compaction forever."""
    t = _mk(spark, tmpdir_path)
    for b in range(4):
        _append(spark, t, b * 100, b * 100 + 100, f"b{b}")
    pol = MaintenancePolicy(compact_at_files=2, keep_snapshots=2,
                            target_rows_per_file=50)  # forces >=4 base files/bucket
    rep = run_maintenance(t, pol)
    assert rep["compact"] is not None
    files_per_bucket = {}
    for f in t.files():
        files_per_bucket[f.bucket] = files_per_bucket.get(f.bucket, 0) + 1
        assert f.base
    assert max(files_per_bucket.values()) >= pol.compact_at_files
    plan2 = plan_maintenance(t, pol)
    assert plan2.compact_mode is None and plan2.nothing_to_do
