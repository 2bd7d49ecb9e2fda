"""GDPR erase cascade: every trace of a doomed key — live rows,
superseded versions, tombstones, index postings, and time-travelable
history — must be physically gone after erase_cascade + expiry, while
files provably free of the keys are never rewritten."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ds_floodexposure_monitoring_spark.operators import secondary_index as sx
from ds_floodexposure_monitoring_spark.operators.compact import merge_append
from ds_floodexposure_monitoring_spark.operators.erase import (
    erase_cascade,
    erase_rows,
)
from ds_floodexposure_monitoring_spark.operators.merge import merge_into
from ds_floodexposure_monitoring_spark.operators.neardup_index import (
    create_index as create_lsh_index,
)
from ds_floodexposure_monitoring_spark.sources.lake import LakeTable

BASE_DDL = "lsn long, uid long, k int, val string, op string"
BASE_SCHEMA = T.StructType(
    [
        T.StructField("uid", T.LongType()),
        T.StructField("k", T.IntegerType()),
        T.StructField("val", T.StringType()),
    ]
)


def _mk_base(spark, root):
    t = LakeTable.create(
        spark, os.path.join(root, "base"), BASE_SCHEMA,
        merge_keys=("uid", "k"), n_buckets=4,
    )
    # batch 1: rows for uids 1..6; batch 2: overwrites + a tombstone so
    # doomed uids have superseded versions AND tombstones on disk
    merge_into(t, spark.createDataFrame(
        [(i, i, 0, f"v{i}", "U") for i in range(1, 7)], BASE_DDL),
        op_col="op", batch_id="b1")
    merge_into(t, spark.createDataFrame(
        [(10, 2, 0, "v2b", "U"), (11, 5, 0, None, "D"), (12, 3, 0, "v3b", "U")],
        BASE_DDL), op_col="op", batch_id="b2")
    return t


def _raw_uids(t):
    return {
        r.uid for r in t.scan(include_internal=True, resolve=False)
        .select("uid").distinct().collect()
    }


def _parquet_uids(spark, t, col="uid"):
    """Read every parquet file physically under the table root — what a
    forensic scan of the storage would see."""
    import glob

    paths = glob.glob(os.path.join(t.path, "data", "**", "*.parquet"),
                      recursive=True)
    if not paths:
        return set()
    return {r[0] for r in spark.read.parquet(*paths).select(col).distinct().collect()}


def test_cascade_erases_every_trace(spark, tmpdir_path):
    base = _mk_base(spark, tmpdir_path)
    # secondary index on val (postings carry uid as a trailing merge key)
    idx = sx.create_index(spark, os.path.join(tmpdir_path, "sx"), base, "val")
    sx.index_backfill(idx, base, "val")
    # LSH band index: synthetic postings, doc_id == uid here
    lsh = create_lsh_index(spark, os.path.join(tmpdir_path, "lsh"))
    merge_append(lsh, spark.createDataFrame(
        [(f"band{i % 3}", i, i) for i in range(1, 7)],
        "band_key string, doc_id long, lsn long"), batch_id="lsh1")

    pre_version = base.version
    rep = erase_cascade(
        base, [2, 5],
        sidecars={"sx": (idx, "uid"), "lsh": (lsh, "doc_id", [2, 5])},
        expire_keep_last=1,
    )
    # COW merges already resolved away superseded versions; what's left
    # on disk for the doomed uids is v2b + uid 5's tombstone
    assert rep.base is not None and rep.base.rows_matched == 2
    assert rep.sidecars["sx"] is not None
    assert rep.sidecars["lsh"] is not None

    # no trace in any raw scan (all versions + tombstones)
    assert _raw_uids(base) == {1, 3, 4, 6}
    assert _raw_uids(idx) == {1, 3, 4, 6}
    assert {r.doc_id for r in lsh.scan(resolve=False).collect()} == {1, 3, 4, 6}

    # no trace physically on disk after expiry deleted replaced files
    assert _parquet_uids(spark, base) == {1, 3, 4, 6}
    assert _parquet_uids(spark, idx) == {1, 3, 4, 6}
    assert _parquet_uids(spark, lsh, col="doc_id") == {1, 3, 4, 6}

    # time travel to the pre-erase snapshot is gone
    with pytest.raises(FileNotFoundError):
        base.snapshot(pre_version)

    # live state intact for everyone else
    live = {(r.uid, r.val) for r in base.scan().collect()}
    assert live == {(1, "v1"), (2, None), (3, "v3b"), (4, "v4"), (6, "v6")} - {(2, None)}
    # (uid 2 erased, uid 5 was already tombstoned then erased)
    assert live == {(1, "v1"), (3, "v3b"), (4, "v4"), (6, "v6")}

    # idempotent: a second cascade touches nothing
    rep2 = erase_cascade(base, [2, 5],
                         sidecars={"sx": (idx, "uid"), "lsh": (lsh, "doc_id", [2, 5])})
    assert rep2.base is None
    assert rep2.sidecars == {"sx": None, "lsh": None}


def test_stat_pruning_skips_clean_files(spark, tmpdir_path):
    """Postings files whose uid stats exclude the doomed keys are never
    rewritten (their manifest paths survive the erase commit)."""
    base = LakeTable.create(
        spark, os.path.join(tmpdir_path, "b2"), BASE_SCHEMA,
        merge_keys=("uid", "k"), n_buckets=1,
    )
    idx = sx.create_index(spark, os.path.join(tmpdir_path, "sx2"), base, "val")
    # two separate appends with disjoint uid ranges -> disjoint files
    merge_append(idx, spark.createDataFrame(
        [(f"v{i}", i, 0, i) for i in range(1, 5)],
        "ival string, uid long, k int, lsn long"), batch_id="i1")
    merge_append(idx, spark.createDataFrame(
        [(f"v{i}", i, 0, i) for i in range(100, 104)],
        "ival string, uid long, k int, lsn long"), batch_id="i2")
    before = {f.path for f in idx.files()}
    st = erase_rows(idx, "uid", [101, 103])
    after = {f.path for f in idx.files()}
    assert st is not None and st.rows_matched == 2
    # low-range files untouched: still referenced by the new snapshot
    low_before = {p for p in before if p not in after}
    assert st.files_removed < len(before)
    assert len(low_before) == st.files_removed
    assert {r.uid for r in idx.scan(resolve=False).collect()} == {1, 2, 3, 4, 100, 102}


def test_erase_rows_guards(spark, tmpdir_path):
    base = _mk_base(spark, tmpdir_path)
    assert erase_rows(base, "uid", []) is None
    assert erase_rows(base, "uid", [None]) is None
    assert erase_rows(base, "uid", [999]) is None  # no trace anywhere
    with pytest.raises(ValueError, match="not in table schema"):
        erase_rows(base, "nope", [1])
    pu = LakeTable.create(
        spark, os.path.join(tmpdir_path, "pu"), BASE_SCHEMA,
        merge_keys=("uid", "k"), merge_engine="partial-update",
    )
    with pytest.raises(NotImplementedError, match="partial-update"):
        erase_rows(pu, "uid", [1])


def test_erase_on_non_stat_column_is_sound(spark, tmpdir_path):
    """A column with no file stats still erases correctly — every file
    is inspected (honest O(table)), nothing silently skipped."""
    base = _mk_base(spark, tmpdir_path)
    st = erase_rows(base, "val", ["v3b", "v6"])
    assert st is not None and st.rows_matched == 2
    vals = {r.val for r in base.scan(resolve=False).collect()}
    assert "v3b" not in vals and "v6" not in vals
    # other rows untouched — value erase targeted exact values, not keys
    assert {"v1", "v2b", "v4"} <= vals


def test_erase_rows_rejects_type_mismatch(spark, tmpdir_path):
    """String ids probed against a numeric column would silently match
    nothing — the guard fails loudly instead."""
    base = _mk_base(spark, tmpdir_path)
    with pytest.raises(TypeError, match="key space"):
        erase_rows(base, "uid", ["c1", "c2"])
    with pytest.raises(TypeError, match="key space"):
        erase_rows(base, "val", [1, 2])
