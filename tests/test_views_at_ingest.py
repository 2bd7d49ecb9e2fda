"""Materialized views maintained at ingest: CDCPipeline(views=[...])
keeps a rollup and an enrichment join fresh across micro-batches, every
crash window converges, and the final states equal full recomputes."""

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ds_floodexposure_monitoring_spark.datagen.transcripts import (
    ChangeLogSpec,
    generate_changelog,
)
from ds_floodexposure_monitoring_spark.operators.incremental import (
    join_state,
    rollup_state,
)
from ds_floodexposure_monitoring_spark.operators.merge import merge_into
from ds_floodexposure_monitoring_spark.sources.lake import LakeTable
from ds_floodexposure_monitoring_spark.streaming.runner import CDCPipeline
from ds_floodexposure_monitoring_spark.streaming.views import (
    JoinView,
    RollupView,
    _cursor_path,
    _read_cursor,
)

SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("role", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("tool", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])

AGGS = lambda: [  # noqa: E731
    F.count("*").alias("n_turns"),
    F.max("turn_idx").alias("max_turn"),
]
PROJ = lambda: [F.col("role"), F.col("team")]  # noqa: E731


def _mk_tables(spark, root):
    t = LakeTable.create(spark, os.path.join(root, "t"), SCHEMA,
                         merge_keys=("conv_id", "turn_idx"), n_buckets=8)
    dim = LakeTable.create(
        spark, os.path.join(root, "dim"),
        T.StructType([T.StructField("conv_id", T.StringType()),
                      T.StructField("team", T.StringType())]),
        merge_keys=("conv_id",), n_buckets=4)
    roll = LakeTable.create(
        spark, os.path.join(root, "roll"),
        T.StructType([T.StructField("conv_id", T.StringType()),
                      T.StructField("n_turns", T.LongType()),
                      T.StructField("max_turn", T.IntegerType())]),
        merge_keys=("conv_id",), n_buckets=4)
    jv = LakeTable.create(
        spark, os.path.join(root, "jv"),
        T.StructType([T.StructField("conv_id", T.StringType()),
                      T.StructField("turn_idx", T.IntegerType()),
                      T.StructField("role", T.StringType()),
                      T.StructField("team", T.StringType())]),
        merge_keys=("conv_id", "turn_idx"), n_buckets=8)
    return t, dim, roll, jv


def _roll_state(roll):
    return sorted((r.conv_id, r.n_turns, r.max_turn) for r in roll.scan().collect())


def _roll_full(t):
    return sorted(
        (r.conv_id, r.n_turns, r.max_turn)
        for r in rollup_state(t.scan(), ("conv_id",), AGGS).collect()
    )


def _jv_state(jv):
    return sorted((r.conv_id, r.turn_idx, r.role, r.team)
                  for r in jv.scan().collect())


def _jv_full(t, dim):
    return sorted(
        (r.conv_id, r.turn_idx, r.role, r.team)
        for r in join_state(t.scan(), dim.scan(), ("conv_id",),
                            ("conv_id", "turn_idx"), PROJ, how="left").collect()
    )


def test_views_maintained_across_batches(spark, tmpdir_path):
    log = os.path.join(tmpdir_path, "log")
    generate_changelog(spark, ChangeLogSpec(
        n_events=16_000, n_convs=200, n_shards=3, dup_rate=0.08,
        delete_rate=0.03, ooo_window=400, events_per_file=2_000, seed=23),
        log)
    t, dim, roll, jv = _mk_tables(spark, tmpdir_path)
    pipe = CDCPipeline(
        spark, log, t, os.path.join(tmpdir_path, "ck"),
        max_events_per_batch=6_000,
        views=[RollupView(t, roll, ("conv_id",), AGGS),
               JoinView(t, dim, jv, ("conv_id",), PROJ, how="left")],
    )
    batch_no = 0
    while True:
        # dim churn alongside the stream (team assignment rotates)
        seen = t.scan().select("conv_id").distinct() if batch_no else None
        if seen is not None:
            merge_into(dim, seen.select(
                F.lit(batch_no).cast("long").alias("lsn"), "conv_id",
                F.concat(F.lit(f"team{batch_no % 2}-"),
                         F.substring("conv_id", -1, 1)).alias("team")),
                batch_id=f"dim-{batch_no}")
        if pipe.run_once() is None:
            break
        batch_no += 1
        assert _roll_state(roll) == _roll_full(t), f"rollup diverged at {batch_no}"
        assert _jv_state(jv) == _jv_full(t, dim), f"join view diverged at {batch_no}"
    assert batch_no >= 3

    # crash window A: derived committed, cursor lost -> re-bootstrap
    # converges to the same state
    state = _roll_state(roll)
    os.remove(_cursor_path(roll, "rollup"))
    RollupView(t, roll, ("conv_id",), AGGS).refresh()
    assert _roll_state(roll) == state

    # crash window B: cursor rolled back to a covered window -> the
    # re-run is an idempotent overwrite
    cp = _cursor_path(jv, "join")
    saved = open(cp).read()
    prev = json.loads(saved)
    prev["left_version"] = max(1, prev["left_version"] - 2)
    open(cp, "w").write(json.dumps(prev))
    JoinView(t, dim, jv, ("conv_id",), PROJ, how="left").refresh()
    assert _jv_state(jv) == _jv_full(t, dim)

    # resume: a fresh pipeline object is caught up and refresh no-ops
    pipe2 = CDCPipeline(
        spark, log, t, os.path.join(tmpdir_path, "ck"),
        max_events_per_batch=6_000,
        views=[RollupView(t, roll, ("conv_id",), AGGS)],
    )
    assert pipe2.run_once() is None
    rv = roll.version
    RollupView(t, roll, ("conv_id",), AGGS).refresh()
    assert roll.version == rv  # zero-change short-circuit, no commit


def test_view_bootstrap_over_existing_table(spark, tmpdir_path):
    """A view registered AFTER the base already has data bootstraps by
    full recompute, then goes incremental."""
    t, dim, roll, _ = _mk_tables(spark, tmpdir_path)
    merge_into(t, spark.createDataFrame(
        [(1, "c1", 0, "user", "hi", None, None),
         (2, "c1", 1, "assistant", "yo", None, None),
         (3, "c2", 0, "user", "hey", None, None)],
        "lsn long, conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"),
        batch_id="pre")
    v = RollupView(t, roll, ("conv_id",), AGGS)
    v.refresh()  # bootstrap
    assert _roll_state(roll) == _roll_full(t) == [("c1", 2, 1), ("c2", 1, 0)]
    merge_into(t, spark.createDataFrame(
        [(4, "c2", 1, "assistant", "sup", None, None)],
        "lsn long, conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"),
        batch_id="post")
    v.refresh()  # incremental from the cursor
    assert _roll_state(roll) == [("c1", 2, 1), ("c2", 2, 1)]


def test_rebootstrap_reconciles_deletes(spark, tmpdir_path):
    """Crash window: bootstrap committed, cursor lost, base rows deleted
    before the retry — the re-bootstrap must tombstone the vanished
    groups, not leave them in the view forever."""
    t, dim, roll, _ = _mk_tables(spark, tmpdir_path)
    ddl = ("lsn long, conv_id string, turn_idx int, role string, "
           "text string, tool string, ts timestamp")
    merge_into(t, spark.createDataFrame(
        [(1, "c1", 0, "user", "hi", None, None),
         (2, "c2", 0, "user", "hey", None, None)], ddl), batch_id="pre")
    v = RollupView(t, roll, ("conv_id",), AGGS)
    v.refresh()
    assert _roll_state(roll) == [("c1", 1, 0), ("c2", 1, 0)]
    # crash: cursor lost; then every c2 row is deleted in the base
    os.remove(_cursor_path(roll, "rollup"))
    merge_into(t, spark.createDataFrame(
        [(9, "c2", 0, "user", None, None, None)],
        "lsn long, conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
        ).withColumn("op", F.lit("D")), op_col="op", batch_id="del")
    RollupView(t, roll, ("conv_id",), AGGS).refresh()  # re-bootstrap
    assert _roll_state(roll) == [("c1", 1, 0)]  # c2 reconciled away

    # kind-namespaced cursors: attaching the same derived table to a
    # JoinView must re-bootstrap, not misread the rollup cursor
    assert _read_cursor(roll, "join") is None
