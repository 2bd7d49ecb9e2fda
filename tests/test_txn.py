"""Multi-table transactions: staged branches publish all-or-nothing
under a WAL intent; every crash window rolls forward; aborts and
conflicts leave main untouched."""

import json
import os

import pytest
from pyspark.sql import types as T

from ds_floodexposure_monitoring_spark.operators.merge import merge_into
from ds_floodexposure_monitoring_spark.sources.lake import (
    CommitConflictError,
    LakeTable,
    _atomic_write,
)
from ds_floodexposure_monitoring_spark.sources.txn import (
    MultiTableTransaction,
    TxnStateError,
    _done_path,
    _wal_path,
    recover,
)

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.StringType()),
])
DDL = "lsn long, k long, v string"


def _mk(spark, root, name):
    return LakeTable.create(spark, os.path.join(root, name), SCHEMA,
                            merge_keys=("k",), n_buckets=2)


def _seed(spark, t, tag):
    merge_into(t, spark.createDataFrame([(1, 1, tag)], DDL), batch_id=f"seed-{tag}")


def _state(t):
    return sorted((r.k, r.v) for r in t.scan().collect())


def _write(spark, handle, rows, tag):
    merge_into(handle, spark.createDataFrame(rows, DDL), batch_id=f"w-{tag}")


def test_commit_publishes_all_tables(spark, tmpdir_path):
    wal = os.path.join(tmpdir_path, "wal")
    t1, t2 = _mk(spark, tmpdir_path, "a"), _mk(spark, tmpdir_path, "b")
    _seed(spark, t1, "a0")
    _seed(spark, t2, "b0")
    v1, v2 = t1.version, t2.version

    txn = MultiTableTransaction(wal)
    b1, b2 = txn.stage(t1), txn.stage(t2)
    _write(spark, b1, [(2, 2, "a1")], "a")
    _write(spark, b2, [(2, 2, "b1"), (3, 3, "b2")], "b")
    # main untouched while staged
    assert t1.version == v1 and t2.version == v2
    assert _state(t1) == [(1, "a0")]

    rec = txn.commit()
    assert _state(t1) == [(1, "a0"), (2, "a1")]
    assert _state(t2) == [(1, "b0"), (2, "b1"), (3, "b2")]
    assert t1.branches() == {"main": t1.version}  # txn branch dropped
    assert os.path.exists(_done_path(wal, rec["txn_id"]))
    assert not os.path.exists(_wal_path(wal, rec["txn_id"]))
    with pytest.raises(TxnStateError):
        txn.commit()


def test_abort_leaves_main_untouched(spark, tmpdir_path):
    wal = os.path.join(tmpdir_path, "wal")
    t1 = _mk(spark, tmpdir_path, "a")
    _seed(spark, t1, "a0")
    v = t1.version
    txn = MultiTableTransaction(wal)
    b1 = txn.stage(t1)
    _write(spark, b1, [(9, 9, "x")], "a")
    txn.abort()
    assert t1.version == v and _state(t1) == [(1, "a0")]
    assert t1.branches() == {"main": v}


def _crash_after_wal(spark, tmpdir_path, publish_first):
    """Build two staged tables, write the WAL intent (the point of no
    return), optionally publish only the first — then 'crash'."""
    wal = os.path.join(tmpdir_path, "wal")
    t1, t2 = _mk(spark, tmpdir_path, "a"), _mk(spark, tmpdir_path, "b")
    _seed(spark, t1, "a0")
    _seed(spark, t2, "b0")
    txn = MultiTableTransaction(wal)
    b1, b2 = txn.stage(t1), txn.stage(t2)
    _write(spark, b1, [(2, 2, "a1")], "a")
    _write(spark, b2, [(2, 2, "b1")], "b")
    record = {
        "txn_id": txn.txn_id,
        "branch": txn.branch,
        "tables": [
            {"path": t1.path, "target_version": b1.version},
            {"path": t2.path, "target_version": b2.version},
        ],
    }
    os.makedirs(wal, exist_ok=True)
    _atomic_write(_wal_path(wal, txn.txn_id), json.dumps(record))
    if publish_first:
        t1.publish_branch(txn.branch)
    return wal, t1, t2, record


def test_recovery_rolls_forward_from_wal(spark, tmpdir_path):
    wal, t1, t2, rec = _crash_after_wal(spark, tmpdir_path, publish_first=False)
    done = recover(spark, wal)
    assert [d["txn_id"] for d in done] == [rec["txn_id"]]
    assert _state(t1) == [(1, "a0"), (2, "a1")]
    assert _state(t2) == [(1, "b0"), (2, "b1")]
    assert recover(spark, wal) == []  # idempotent


def test_recovery_mid_flip(spark, tmpdir_path):
    wal, t1, t2, rec = _crash_after_wal(spark, tmpdir_path, publish_first=True)
    assert _state(t1) == [(1, "a0"), (2, "a1")]   # already flipped
    assert _state(t2) == [(1, "b0")]              # not yet
    recover(spark, wal)
    assert _state(t2) == [(1, "b0"), (2, "b1")]
    assert t1.branches() == {"main": t1.version}
    assert t2.branches() == {"main": t2.version}


def test_conflict_before_wal_aborts_cleanly(spark, tmpdir_path):
    wal = os.path.join(tmpdir_path, "wal")
    t1 = _mk(spark, tmpdir_path, "a")
    _seed(spark, t1, "a0")
    txn = MultiTableTransaction(wal)
    b1 = txn.stage(t1)
    _write(spark, b1, [(2, 2, "staged")], "a")
    # out-of-band commit lands on main: the branch no longer
    # fast-forwards
    merge_into(t1, spark.createDataFrame([(5, 5, "oob")], DDL), batch_id="oob")
    with pytest.raises(CommitConflictError):
        txn.commit()
    assert not os.path.exists(_wal_path(wal, txn.txn_id))  # no intent
    assert _state(t1) == [(1, "a0"), (5, "oob")]


def test_base_and_index_commit_atomically(spark, tmpdir_path):
    """The CDC shape this exists for: a base batch and its secondary-
    index postings become visible together."""
    from ds_floodexposure_monitoring_spark.operators import secondary_index as sx

    wal = os.path.join(tmpdir_path, "wal")
    base = _mk(spark, tmpdir_path, "base")
    _seed(spark, base, "a0")
    idx = sx.create_index(spark, os.path.join(tmpdir_path, "ix"), base, "v")
    sx.index_backfill(idx, base, "v")

    txn = MultiTableTransaction(wal)
    bb, bi = txn.stage(base), txn.stage(idx)
    batch = spark.createDataFrame([(7, 7, "hot")], DDL)
    merge_into(bb, batch, batch_id="b7")
    sx.index_append(bi, bb, batch, "v", batch_id="b7:ix:v")
    # neither visible pre-commit
    assert _state(base) == [(1, "a0")]
    assert sx.lookup(idx, base, "v", ["hot"]).count() == 0
    txn.commit()
    assert _state(base) == [(1, "a0"), (7, "hot")]
    assert sx.lookup(idx, base, "v", ["hot"]).count() == 1
