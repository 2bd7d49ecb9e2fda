"""Incremental join-view maintenance: after every paired refresh, the
derived table must equal a full recompute of ``left ⋈ right`` over both
tables' live states — under left upserts/deletes, dim inserts/updates/
deletes, and join-value moves — while each refresh recomputes only the
affected left keys (the IVM delta rule for n:1 joins, the incremental
twin of the reference's join-then-upsert enrichment, reference:
src/datasources/floodscan.py:256-258)."""

import os
import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ds_floodexposure_monitoring_spark.operators.incremental import (
    join_state,
    refresh_join,
)
from ds_floodexposure_monitoring_spark.operators.merge import merge_into
from ds_floodexposure_monitoring_spark.sources.lake import LakeTable

LEFT_DDL = "lsn long, u long, k int, v double, op string"
LEFT_SCHEMA = T.StructType(
    [
        T.StructField("u", T.LongType()),
        T.StructField("k", T.IntegerType()),
        T.StructField("v", T.DoubleType()),
    ]
)
DIM_DDL = "lsn long, u long, tier string, op string"
DIM_SCHEMA = T.StructType(
    [
        T.StructField("u", T.LongType()),
        T.StructField("tier", T.StringType()),
    ]
)
VIEW_SCHEMA = T.StructType(
    [
        T.StructField("u", T.LongType()),
        T.StructField("k", T.IntegerType()),
        T.StructField("v", T.DoubleType()),
        T.StructField("tier", T.StringType()),
    ]
)

PROJECT = lambda: [F.col("v"), F.col("tier")]  # noqa: E731


@pytest.fixture()
def tables(spark, tmpdir_path):
    left = LakeTable.create(
        spark, os.path.join(tmpdir_path, "left"), LEFT_SCHEMA,
        merge_keys=("u", "k"), n_buckets=8,
    )
    dim = LakeTable.create(
        spark, os.path.join(tmpdir_path, "dim"), DIM_SCHEMA,
        merge_keys=("u",), n_buckets=4,
    )
    view = LakeTable.create(
        spark, os.path.join(tmpdir_path, "view"), VIEW_SCHEMA,
        merge_keys=("u", "k"), n_buckets=8,
    )
    return left, dim, view


def _full(left, dim, how):
    df = join_state(left.scan(), dim.scan(), ("u",), ("u", "k"), PROJECT, how=how)
    return sorted(
        (r.u, r.k, r.v, r.tier) for r in df.collect()
    )


def _view(view):
    return sorted((r.u, r.k, r.v, r.tier) for r in view.scan().collect())


@pytest.mark.parametrize("how", ["inner", "left"])
def test_join_refresh_tracks_full_recompute(spark, tables, how):
    """Randomized interleaved batches on BOTH feeds; the view must equal
    join_state after every refresh. Join column == left bucket key, so
    this also exercises the bucket-pruned live-left scan path."""
    left, dim, view = tables
    rng = random.Random(11)
    lsn = 0
    live_left: set = set()
    live_dim: set = set()
    lv, rv = left.version, dim.version
    for batch_no in range(4):
        # --- left feed: upserts + deletes over a small key space
        rows = []
        for _ in range(40):
            lsn += 1
            u, k = rng.randrange(10), rng.randrange(4)
            rows.append((lsn, u, k, round(rng.uniform(0, 50), 2), "U"))
            live_left.add((u, k))
        for u, k in rng.sample(sorted(live_left), k=len(live_left) // 5):
            lsn += 1
            rows.append((lsn, u, k, None, "D"))
            live_left.discard((u, k))
        merge_into(left, spark.createDataFrame(rows, LEFT_DDL),
                   op_col="op", batch_id=f"l{batch_no}")
        # --- dim feed: insert/update a few users, delete one
        drows = []
        for u in rng.sample(range(10), k=4):
            lsn += 1
            drows.append((lsn, u, f"t{rng.randrange(3)}", "U"))
            live_dim.add(u)
        if live_dim and batch_no % 2 == 1:
            u = rng.choice(sorted(live_dim))
            lsn += 1
            drows.append((lsn, u, None, "D"))
            live_dim.discard(u)
        merge_into(dim, spark.createDataFrame(drows, DIM_DDL),
                   op_col="op", batch_id=f"d{batch_no}")
        st = refresh_join(
            left, dim, view, ("u",), PROJECT,
            from_versions=(lv, rv), how=how,
        )
        lv, rv = st.to_versions
        assert _view(view) == _full(left, dim, how), f"diverged at batch {batch_no}"


def test_join_refresh_idempotent_and_noop(spark, tables):
    left, dim, view = tables
    merge_into(left, spark.createDataFrame(
        [(1, 1, 1, 10.0, "U"), (2, 2, 1, 5.0, "U")], LEFT_DDL),
        op_col="op", batch_id="l1")
    merge_into(dim, spark.createDataFrame(
        [(3, 1, "a", "U"), (4, 2, "b", "U")], DIM_DDL),
        op_col="op", batch_id="d1")
    lv, rv = left.version, dim.version
    st = refresh_join(left, dim, view, ("u",), PROJECT,
                      from_versions=(1, 1), to_versions=(lv, rv))
    assert st.upserted_rows == 2
    state = _view(view)

    # replaying the identical interval overwrites to the same state
    refresh_join(left, dim, view, ("u",), PROJECT,
                 from_versions=(1, 1), to_versions=(lv, rv))
    assert _view(view) == state

    # zero-length interval: no commit at all
    vv = view.version
    st2 = refresh_join(left, dim, view, ("u",), PROJECT,
                       from_versions=(lv, rv), to_versions=(lv, rv))
    assert st2.changed_keys == 0 and view.version == vv


def test_dim_delete_inner_removes_left_nulls(spark, tables, tmpdir_path):
    left, dim, view = tables
    merge_into(left, spark.createDataFrame(
        [(1, 1, 1, 10.0, "U"), (2, 2, 1, 5.0, "U")], LEFT_DDL),
        op_col="op", batch_id="l1")
    merge_into(dim, spark.createDataFrame(
        [(3, 1, "a", "U"), (4, 2, "b", "U")], DIM_DDL),
        op_col="op", batch_id="d1")
    lview = LakeTable.create(
        spark, os.path.join(tmpdir_path, "lview"), VIEW_SCHEMA,
        merge_keys=("u", "k"), n_buckets=8,
    )
    lv, rv = left.version, dim.version
    for v in (view, lview):
        refresh_join(left, dim, v, ("u",), PROJECT, from_versions=(1, 1),
                     to_versions=(lv, rv), how="inner" if v is view else "left")
    # delete user 2 from the dim
    merge_into(dim, spark.createDataFrame([(9, 2, None, "D")], DIM_DDL),
               op_col="op", batch_id="d2")
    refresh_join(left, dim, view, ("u",), PROJECT,
                 from_versions=(lv, rv), how="inner")
    refresh_join(left, dim, lview, ("u",), PROJECT,
                 from_versions=(lv, rv), how="left")
    assert _view(view) == [(1, 1, 10.0, "a")]          # inner: row gone
    assert _view(lview) == [(1, 1, 10.0, "a"), (2, 1, 5.0, None)]  # left: nulled


def test_join_on_mutable_left_column(spark, tmpdir_path):
    """Join column is a mutable LEFT data column (not the bucket key):
    an update that MOVES a row between join values must re-enrich it,
    and a move to a missing dim value must DELETE its inner-view row."""
    left = LakeTable.create(
        spark, os.path.join(tmpdir_path, "mleft"),
        T.StructType([
            T.StructField("k", T.IntegerType()),
            T.StructField("grp", T.StringType()),
            T.StructField("v", T.DoubleType()),
        ]),
        merge_keys=("k",), n_buckets=4,
    )
    dim = LakeTable.create(
        spark, os.path.join(tmpdir_path, "mdim"),
        T.StructType([
            T.StructField("grp", T.StringType()),
            T.StructField("tier", T.StringType()),
        ]),
        merge_keys=("grp",), n_buckets=2,
    )
    view = LakeTable.create(
        spark, os.path.join(tmpdir_path, "mview"),
        T.StructType([
            T.StructField("k", T.IntegerType()),
            T.StructField("v", T.DoubleType()),
            T.StructField("tier", T.StringType()),
        ]),
        merge_keys=("k",), n_buckets=4,
    )
    proj = lambda: [F.col("v"), F.col("tier")]  # noqa: E731
    merge_into(left, spark.createDataFrame(
        [(1, 1, "A", 1.0), (2, 2, "A", 2.0), (3, 3, "B", 3.0)],
        "lsn long, k int, grp string, v double"), batch_id="m1")
    merge_into(dim, spark.createDataFrame(
        [(4, "A", "gold"), (5, "B", "iron")],
        "lsn long, grp string, tier string"), batch_id="d1")
    lv, rv = left.version, dim.version
    refresh_join(left, dim, view, ("grp",), proj,
                 from_versions=(1, 1), to_versions=(lv, rv))
    got = sorted((r.k, r.v, r.tier) for r in view.scan().collect())
    assert got == [(1, 1.0, "gold"), (2, 2.0, "gold"), (3, 3.0, "iron")]
    # move k=2 to group B; move k=3 to a group with NO dim row
    merge_into(left, spark.createDataFrame(
        [(10, 2, "B", 2.0), (11, 3, "C", 3.0)],
        "lsn long, k int, grp string, v double"), batch_id="m2")
    refresh_join(left, dim, view, ("grp",), proj, from_versions=(lv, rv))
    got = sorted((r.k, r.v, r.tier) for r in view.scan().collect())
    assert got == [(1, 1.0, "gold"), (2, 2.0, "iron")]


def test_join_refresh_validation(spark, tables):
    left, dim, view = tables
    with pytest.raises(ValueError, match="how"):
        refresh_join(left, dim, view, ("u",), PROJECT,
                     from_versions=(1, 1), how="full")
    with pytest.raises(ValueError, match="merge-keyed on the join"):
        refresh_join(left, dim, view, ("tier",), PROJECT, from_versions=(1, 1))
    with pytest.raises(ValueError, match="keyed on"):
        refresh_join(left, dim, dim, ("u",), PROJECT, from_versions=(1, 1))


def test_join_refresh_prunes_live_scans_by_bucket(spark, tables):
    """When the join column IS the left bucket key, both live-left
    scans must read a pruned file subset (never files=None = whole
    table), and every pruned file's bucket must be one a changed key
    or changed dim value hashes to."""
    left, dim, view = tables
    merge_into(left, spark.createDataFrame(
        [(i, u, k, float(u), "U") for i, (u, k) in
         enumerate([(u, k) for u in range(8) for k in range(2)], 1)],
        LEFT_DDL), op_col="op", batch_id="l1")
    merge_into(dim, spark.createDataFrame(
        [(100 + u, u, f"t{u}", "U") for u in range(8)], DIM_DDL),
        op_col="op", batch_id="d1")
    lv, rv = left.version, dim.version
    refresh_join(left, dim, view, ("u",), PROJECT,
                 from_versions=(1, 1), to_versions=(lv, rv))

    # a small incremental step: one left upsert, one dim update
    merge_into(left, spark.createDataFrame(
        [(500, 3, 0, 33.0, "U")], LEFT_DDL), op_col="op", batch_id="l2")
    merge_into(dim, spark.createDataFrame(
        [(501, 5, "hot", "U")], DIM_DDL), op_col="op", batch_id="d2")

    seen = []
    orig = LakeTable.scan

    def spy(self, *a, **kw):
        if self.path == left.path and kw.get("version") == left.version:
            seen.append(kw.get("files"))
        return orig(self, *a, **kw)

    LakeTable.scan = spy
    try:
        refresh_join(left, dim, view, ("u",), PROJECT,
                     from_versions=(lv, rv))
    finally:
        LakeTable.scan = orig

    live_scans = [f for f in seen if f is not None]
    assert live_scans, "live-left scans were not file-pruned"
    assert all(f is not None for f in seen), "a live scan read the whole table"
    total = len(left.files())
    assert all(len(f) < total for f in live_scans)
