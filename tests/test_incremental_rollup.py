"""Incremental materialized-rollup maintenance: after every refresh, the
derived table must equal a full recompute of the base's live state —
including group deletion — while the refresh only touches changed groups
(the reference's changed-slice-only recompute, floodscan.py:196-213,
lifted to derived aggregate tables)."""

import os
import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ds_floodexposure_monitoring_spark.operators.incremental import (
    refresh_rollup,
    rollup_state,
)
from ds_floodexposure_monitoring_spark.operators.merge import merge_into
from ds_floodexposure_monitoring_spark.sources.lake import LakeTable

BASE_DDL = "lsn long, g string, k int, v double, op string"
BASE_SCHEMA = T.StructType(
    [
        T.StructField("g", T.StringType()),
        T.StructField("k", T.IntegerType()),
        T.StructField("v", T.DoubleType()),
    ]
)
DERIVED_SCHEMA = T.StructType(
    [
        T.StructField("g", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("sum_v", T.DoubleType()),
        T.StructField("max_k", T.IntegerType()),
    ]
)

AGGS = lambda: [  # noqa: E731
    F.count("*").alias("n"),
    F.round(F.sum(F.col("v").cast("decimal(18,2)")).cast("double"), 6).alias("sum_v"),
    F.max("k").alias("max_k"),
]


@pytest.fixture()
def tables(spark, tmpdir_path):
    base = LakeTable.create(
        spark, os.path.join(tmpdir_path, "base"), BASE_SCHEMA,
        merge_keys=("g", "k"), n_buckets=8,
    )
    derived = LakeTable.create(
        spark, os.path.join(tmpdir_path, "rollup"), DERIVED_SCHEMA,
        merge_keys=("g",), n_buckets=4,
    )
    return base, derived


def _full(base):
    df = rollup_state(base.scan(), ("g",), AGGS)
    return sorted((r.g, r.n, r.sum_v, r.max_k) for r in df.collect())


def _derived(derived):
    return sorted((r.g, r.n, r.sum_v, r.max_k) for r in derived.scan().collect())


def test_refresh_tracks_full_recompute_with_deletes(spark, tables):
    base, derived = tables
    rng = random.Random(7)
    lsn = 0
    live_keys: set[tuple[str, int]] = set()
    prev_v = base.version
    for batch_no in range(4):
        rows = []
        # upserts on a small group space so groups gain/lose members
        for _ in range(60):
            lsn += 1
            g, k = f"g{rng.randrange(8)}", rng.randrange(6)
            rows.append((lsn, g, k, round(rng.uniform(0, 100), 2), "U"))
            live_keys.add((g, k))
        # delete ~a quarter of the currently live keys
        for g, k in rng.sample(sorted(live_keys), k=len(live_keys) // 4):
            lsn += 1
            rows.append((lsn, g, k, None, "D"))
            live_keys.discard((g, k))
        merge_into(
            base, spark.createDataFrame(rows, BASE_DDL),
            op_col="op", batch_id=f"b{batch_no}",
        )
        st = refresh_rollup(base, derived, ("g",), AGGS, from_version=prev_v)
        prev_v = base.version
        assert _derived(derived) == _full(base), f"diverged after batch {batch_no}"
        assert st.changed_groups <= 8

    # wipe one whole group -> its derived row must disappear via tombstone
    gone_group = "g3"
    rows = []
    for g, k in [key for key in live_keys if key[0] == gone_group]:
        lsn += 1
        rows.append((lsn, g, k, None, "D"))
        live_keys.discard((g, k))
    if rows:
        merge_into(base, spark.createDataFrame(rows, BASE_DDL), op_col="op", batch_id="wipe")
        st = refresh_rollup(base, derived, ("g",), AGGS, from_version=prev_v)
        assert st.deleted_groups >= 1
        assert all(r[0] != gone_group for r in _derived(derived))
        assert _derived(derived) == _full(base)


def test_refresh_is_idempotent_and_noop_on_no_change(spark, tables):
    base, derived = tables
    b = spark.createDataFrame(
        [(1, "a", 1, 10.0, "U"), (2, "a", 2, 5.0, "U"), (3, "b", 1, 1.0, "U")],
        BASE_DDL,
    )
    merge_into(base, b, op_col="op", batch_id="b1")
    v0, v1 = 1, base.version
    st = refresh_rollup(base, derived, ("g",), AGGS, from_version=v0, to_version=v1)
    assert st.upserted_groups == 2
    state = _derived(derived)

    # replaying the same interval is a pure overwrite to the same state
    refresh_rollup(base, derived, ("g",), AGGS, from_version=v0, to_version=v1)
    assert _derived(derived) == state

    # zero-length interval is a no-op with no commit
    dv = derived.version
    st2 = refresh_rollup(base, derived, ("g",), AGGS, from_version=v1, to_version=v1)
    assert st2.changed_groups == 0 and derived.version == dv


def test_refresh_handles_group_moves_on_mutable_group_column(spark, tables):
    """Rollup grouped on a MUTABLE data column (g is the base table's
    data here? no — build a base keyed on k alone, grouped on a data
    column): an update that MOVES a row between groups must refresh
    BOTH the moved-from and moved-to groups."""
    import os as _os

    from pyspark.sql import types as T

    from ds_floodexposure_monitoring_spark.sources.lake import LakeTable

    base, _ = tables
    # base keyed on (g, k); group rollup on column "grp" stored in v? Use
    # a dedicated base: keyed on k, data columns (grp, v)
    root = _os.path.dirname(base.path)
    b2 = LakeTable.create(
        spark, _os.path.join(root, "movbase"),
        T.StructType([
            T.StructField("k", T.IntegerType()),
            T.StructField("grp", T.StringType()),
            T.StructField("v", T.DoubleType()),
        ]),
        merge_keys=("k",), n_buckets=4,
    )
    d2 = LakeTable.create(
        spark, _os.path.join(root, "movroll"),
        T.StructType([
            T.StructField("grp", T.StringType()),
            T.StructField("n", T.LongType()),
        ]),
        merge_keys=("grp",), n_buckets=2,
    )
    aggs = lambda: [F.count("*").alias("n")]  # noqa: E731
    merge_into(b2, spark.createDataFrame(
        [(1, 1, "A", 1.0), (2, 2, "A", 2.0), (3, 3, "B", 3.0)],
        "lsn long, k int, grp string, v double"), batch_id="m1")
    v1 = b2.version
    refresh_rollup(b2, d2, ("grp",), aggs, from_version=1, to_version=v1)
    # move k=2 from group A to group B
    merge_into(b2, spark.createDataFrame(
        [(10, 2, "B", 2.0)], "lsn long, k int, grp string, v double"), batch_id="m2")
    refresh_rollup(b2, d2, ("grp",), aggs, from_version=v1)
    got = sorted((r.grp, r.n) for r in d2.scan().collect())
    assert got == [("A", 1), ("B", 2)], got
    # and group A vanishing entirely must tombstone its derived row
    merge_into(b2, spark.createDataFrame(
        [(20, 1, "B", 1.0)], "lsn long, k int, grp string, v double"), batch_id="m3")
    prev = b2.version - 1
    refresh_rollup(b2, d2, ("grp",), aggs, from_version=prev)
    got = sorted((r.grp, r.n) for r in d2.scan().collect())
    assert got == [("B", 3)], got


def test_refresh_rejects_mismatched_derived_keys(spark, tmpdir_path):
    base = LakeTable.create(
        spark, os.path.join(tmpdir_path, "b2"), BASE_SCHEMA, merge_keys=("g", "k")
    )
    wrong = LakeTable.create(
        spark, os.path.join(tmpdir_path, "w"), DERIVED_SCHEMA, merge_keys=("n",)
    )
    with pytest.raises(ValueError, match="keyed on"):
        refresh_rollup(base, wrong, ("g",), AGGS, from_version=0)
