"""Partial-update merge engine ON THE LAKE PATH (Paimon
`merge-engine=partial-update` + sequence-field analog): patch events
MERGE per-field across batches with persistence — every data file
carries a per-field LSN column (_flsn_<col>), MOR deltas fold
field-granularly at scan, and compaction folds field-granular state
physically. Semantics must match operators/dedup.partial_update_state
byte-for-byte on the same event set."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ds_floodexposure_monitoring_spark.operators.compact import compact, merge_append
from ds_floodexposure_monitoring_spark.operators.dedup import partial_update_state
from ds_floodexposure_monitoring_spark.sources.lake import LakeTable, flsn_col

SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
])
DDL = "lsn long, conv_id string, turn_idx int, role string, text string, tool string"


def _patches(spark, rows):
    return spark.createDataFrame(rows, DDL)


def _state(t):
    return sorted(
        (r.conv_id, r.turn_idx, r.role, r.text, r.tool)
        for r in t.scan().collect()
    )


def _oracle(spark, all_events):
    """Fold ALL raw events with the reference batch operator."""
    df = partial_update_state(
        _patches(spark, all_events), keys=("conv_id", "turn_idx"), order_col="lsn"
    )
    return sorted(
        (r.conv_id, r.turn_idx, r.role, r.text, r.tool)
        for r in df.select("conv_id", "turn_idx", "role", "text", "tool").collect()
    )


@pytest.fixture()
def pu_table(spark, tmpdir_path):
    return LakeTable.create(
        spark, os.path.join(tmpdir_path, "pu"), SCHEMA,
        n_buckets=4, merge_engine="partial-update",
    )


def test_patches_merge_across_commits(spark, pu_table):
    """Fields set in different batches union per key; the newest setter
    of each field wins independently."""
    b1 = [
        (1, "c1", 0, "user", "hello", None),
        (2, "c1", 0, None, None, "search"),      # patch: tool only
        (3, "c2", 1, "assistant", None, None),   # patch: role only
    ]
    b2 = [
        (4, "c1", 0, None, "hello, edited", None),  # patch: text only
        (5, "c2", 1, None, "body", "calc"),
    ]
    merge_append(pu_table, _patches(spark, b1), batch_id="b1")
    assert pu_table.current()["requires_resolve"] is True
    merge_append(pu_table, _patches(spark, b2), batch_id="b2")
    assert _state(pu_table) == _oracle(spark, b1 + b2)
    assert _state(pu_table) == [
        ("c1", 0, "user", "hello, edited", "search"),
        ("c2", 1, "assistant", "body", "calc"),
    ]


def test_out_of_order_and_redelivery(spark, pu_table):
    """A LATE batch carrying older LSNs must not displace newer field
    values, but must fill fields never set; exact redelivery is a
    no-op."""
    b1 = [
        (10, "c1", 0, "user", "v10", None),
    ]
    late = [
        (5, "c1", 0, "admin", "v5", "tool5"),   # older: only tool is new
    ]
    merge_append(pu_table, _patches(spark, b1), batch_id="b1")
    merge_append(pu_table, _patches(spark, late), batch_id="late")
    assert _state(pu_table) == [("c1", 0, "user", "v10", "tool5")]
    # redeliver both batches entirely (new batch_ids simulate at-least-
    # once delivery past the checkpoint): state must not change
    merge_append(pu_table, _patches(spark, b1 + late), batch_id="redeliver")
    assert _state(pu_table) == [("c1", 0, "user", "v10", "tool5")]


def test_compaction_folds_per_field(spark, pu_table):
    """Compaction folds the deltas physically; the resolved snapshot
    preserves per-field LSNs so post-compaction patches still merge."""
    b1 = [(1, "c1", 0, "user", "t1", None), (2, "c2", 0, "user", "t2", "x")]
    b2 = [(3, "c1", 0, None, None, "toolA")]
    merge_append(pu_table, _patches(spark, b1), batch_id="b1")
    merge_append(pu_table, _patches(spark, b2), batch_id="b2")
    want = _state(pu_table)
    st = compact(pu_table, min_files_per_bucket=1)
    assert st is not None
    assert pu_table.current()["requires_resolve"] is False
    assert _state(pu_table) == want
    # the folded files still carry per-field LSNs
    internal = pu_table.scan(include_internal=True)
    assert flsn_col("tool") in internal.columns
    rows = {(r.conv_id, r.turn_idx): r for r in internal.collect()}
    assert rows[("c1", 0)][flsn_col("tool")] == 3
    assert rows[("c1", 0)][flsn_col("text")] == 1
    # a late patch with an INTERMEDIATE LSN after compaction competes
    # against the folded per-field LSNs exactly as it would have
    # pre-compaction: lsn 2 beats role/text (set at lsn 1), loses to
    # tool (set at lsn 3)
    merge_append(
        pu_table,
        _patches(spark, [(2, "c1", 0, "admin", "old", "oldtool")]),
        batch_id="b3",
    )
    assert _state(pu_table) == [
        ("c1", 0, "admin", "old", "toolA"),
        ("c2", 0, "user", "t2", "x"),
    ]


def test_schema_evolution_adds_field_mid_stream(spark, pu_table):
    """A new column appears mid-stream: old files read it (and its
    per-field LSN) as null; patches to it fold normally."""
    merge_append(
        pu_table,
        _patches(spark, [(1, "c1", 0, "user", "t", None)]),
        batch_id="b1",
    )
    wide = spark.createDataFrame(
        [(2, "c1", 0, None, None, None, "gpt")],
        DDL + ", model string",
    )
    merge_append(pu_table, wide, batch_id="b2")
    got = [(r.conv_id, r.turn_idx, r.role, r.text, r.model)
           for r in pu_table.scan().collect()]
    assert got == [("c1", 0, "user", "t", "gpt")]
    # the evolved field's per-field LSN exists and is correct
    internal = pu_table.scan(include_internal=True).collect()[0]
    assert internal[flsn_col("model")] == 2
    assert internal[flsn_col("text")] == 1


def test_guards(spark, tmpdir_path, pu_table):
    from ds_floodexposure_monitoring_spark.operators.dml import (
        delete_where,
        delete_where_mor,
        update_where,
    )
    from ds_floodexposure_monitoring_spark.operators.merge import merge_into

    with pytest.raises(ValueError, match="unknown merge engine"):
        LakeTable.create(
            spark, os.path.join(tmpdir_path, "bad"), SCHEMA, merge_engine="yolo"
        )
    batch = _patches(spark, [(1, "c1", 0, "user", "t", None)])
    with pytest.raises(ValueError, match="do not accept a CDC op"):
        merge_append(pu_table, batch.withColumn("op", F.lit("U")), op_col="op")
    with pytest.raises(NotImplementedError, match="merge-on-read path"):
        merge_into(pu_table, batch)
    merge_append(pu_table, batch, batch_id="b1")
    for fn in (
        lambda: delete_where(pu_table, "turn_idx = 0"),
        lambda: update_where(pu_table, "turn_idx = 0", {"text": F.lit("x")}),
        lambda: delete_where_mor(pu_table, "turn_idx = 0"),
    ):
        with pytest.raises(NotImplementedError, match="partial-update"):
            fn()


def test_engine_persists_and_lww_unchanged(spark, tmpdir_path, pu_table):
    assert pu_table.merge_engine == "partial-update"
    reloaded = LakeTable.load(spark, pu_table.path)
    assert reloaded.merge_engine == "partial-update"
    # default tables keep row-LWW: the newest EVENT wins whole, erasing
    # fields it doesn't carry
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "lww"), SCHEMA, n_buckets=2)
    assert t.merge_engine == "lww"
    merge_append(t, _patches(spark, [(1, "c1", 0, "user", "hello", "tl")]), batch_id="a")
    merge_append(t, _patches(spark, [(2, "c1", 0, None, "bye", None)]), batch_id="b")
    assert _state(t) == [("c1", 0, None, "bye", None)]


def test_random_stream_matches_batch_operator(spark, pu_table):
    """Property-style: a deterministic pseudo-random patch stream split
    into 4 batches + a mid-stream compaction equals the one-shot batch
    fold of all events."""
    import random

    rng = random.Random(7)
    events = []
    for lsn in range(1, 401):
        conv = f"c{rng.randrange(20):02d}"
        turn = rng.randrange(3)
        role = rng.choice([None, "user", "assistant"])
        text = rng.choice([None, f"t{lsn}"])
        tool = rng.choice([None, None, f"tool{lsn % 5}"])
        if role is None and text is None and tool is None:
            text = f"t{lsn}"
        events.append((lsn, conv, turn, role, text, tool))
    rng.shuffle(events)  # out-of-order delivery across batches
    chunks = [events[i::4] for i in range(4)]
    for i, ch in enumerate(chunks):
        merge_append(pu_table, _patches(spark, ch), batch_id=f"b{i}")
        if i == 1:
            compact(pu_table, min_files_per_bucket=1)
    assert _state(pu_table) == _oracle(spark, events)
