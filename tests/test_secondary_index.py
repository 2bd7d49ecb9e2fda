"""Secondary index (operators/secondary_index.py): exactness under
overwrites (stale postings) and deletes, idempotence under batch
redelivery, and the point that justifies it — the lookup's base scan
opens fewer files than a full scan."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ds_floodexposure_monitoring_spark.operators import secondary_index as sx
from ds_floodexposure_monitoring_spark.operators.compact import merge_append
from ds_floodexposure_monitoring_spark.sources.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("tag", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, tag string, text string, lsn long"
    )


@pytest.fixture()
def base_and_index(spark, tmpdir_path):
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), SCHEMA,
        merge_keys=("conv_id", "turn_idx"), n_buckets=4,
        key_bloom_bits=1 << 10,
    )
    idx = sx.create_index(
        spark, os.path.join(tmpdir_path, "idx"), t, "tag", n_buckets=4
    )
    return t, idx


def _ingest(t, idx, spark, rows, batch_id):
    b = _batch(spark, rows)
    merge_append(t, b, batch_id=batch_id)
    sx.index_append(idx, t, b, "tag", batch_id=batch_id + "-idx")


def _lookup_tags(t, idx, tags):
    out = sx.lookup(idx, t, "tag", tags)
    return sorted((r.conv_id, r.turn_idx, r.tag, r.text) for r in out.collect())


def test_lookup_exact_and_stale_postings_dropped(spark, base_and_index):
    t, idx = base_and_index
    _ingest(t, idx, spark, [
        ("a", 0, "red", "t1", 1),
        ("a", 1, "blue", "t2", 2),
        ("b", 0, "red", "t3", 3),
        ("c", 0, None, "untagged", 4),  # NULL never indexed, never matched
    ], "b1")
    assert _lookup_tags(t, idx, ["red"]) == [
        ("a", 0, "red", "t1"), ("b", 0, "red", "t3"),
    ]
    # overwrite: (a,0) moves red -> green; the red posting is now stale
    _ingest(t, idx, spark, [("a", 0, "green", "t1b", 5)], "b2")
    assert _lookup_tags(t, idx, ["red"]) == [("b", 0, "red", "t3")]
    assert _lookup_tags(t, idx, ["green"]) == [("a", 0, "green", "t1b")]
    # full-scan equivalence on every tag
    for tag in ("red", "blue", "green"):
        want = sorted(
            (r.conv_id, r.turn_idx, r.tag, r.text)
            for r in t.scan().where(F.col("tag") == tag).collect()
        )
        assert _lookup_tags(t, idx, [tag]) == want


def test_deleted_keys_drop_out(spark, base_and_index):
    t, idx = base_and_index
    _ingest(t, idx, spark, [("a", 0, "red", "t1", 1), ("b", 0, "red", "t2", 2)], "b1")
    # CDC delete for (a,0): tombstone via op column
    dead = spark.createDataFrame(
        [("a", 0, "red", None, 3, "D")],
        "conv_id string, turn_idx int, tag string, text string, lsn long, op string",
    )
    merge_append(t, dead, op_col="op", batch_id="b2")
    assert _lookup_tags(t, idx, ["red"]) == [("b", 0, "red", "t2")]


def test_redelivery_idempotent(spark, base_and_index):
    t, idx = base_and_index
    rows = [("a", 0, "red", "t1", 1), ("b", 0, "blue", "t2", 2)]
    _ingest(t, idx, spark, rows, "b1")
    v_i = idx.version
    # exact redelivery: index_append's upfront ledger check skips the
    # whole job — no new index snapshot, state unchanged
    assert sx.index_append(idx, t, _batch(spark, rows), "tag",
                           batch_id="b1-idx") is None
    assert idx.version == v_i
    assert idx.scan().count() == 2
    assert _lookup_tags(t, idx, ["red", "blue"]) == [
        ("a", 0, "red", "t1"), ("b", 0, "blue", "t2"),
    ]
    # re-index under a NEW batch id (crash between table and index
    # commits): postings LWW onto themselves, state unchanged
    sx.index_append(idx, t, _batch(spark, rows), "tag", batch_id="b1-retry")
    assert _lookup_tags(t, idx, ["red", "blue"]) == [
        ("a", 0, "red", "t1"), ("b", 0, "blue", "t2"),
    ]


def test_lookup_prunes_base_files(spark, base_and_index):
    """The reason the index exists: the base-side scan after index
    probe must open fewer files than the table holds."""
    t, idx = base_and_index
    # many batches -> many files, each tag localized to one batch
    for i in range(6):
        _ingest(t, idx, spark, [
            (f"c{i}-{j}", 0, f"tag{i}", f"txt{i}{j}", i * 100 + j)
            for j in range(20)
        ], f"b{i}")
    n_files = len(t.files())
    assert n_files >= 6
    probe = spark.createDataFrame([("tag3",)], "ival string")
    hits = idx.join_pruned(probe, on="ival", how="semi")
    cand = hits.select("conv_id").distinct()
    pruned = t.prune_for_keys([r[0] for r in cand.collect()])
    assert len(pruned) < n_files
    # and the full lookup is still exact
    want = sorted(
        (r.conv_id, r.turn_idx) for r in
        t.scan().where(F.col("tag") == "tag3").collect()
    )
    got = sorted(
        (r.conv_id, r.turn_idx)
        for r in sx.lookup(idx, t, "tag", ["tag3"]).collect()
    )
    assert got == want and len(got) == 20


def test_create_index_rejects_unknown_column(spark, base_and_index, tmpdir_path):
    t, _ = base_and_index
    with pytest.raises(ValueError, match="not in base schema"):
        sx.create_index(spark, os.path.join(tmpdir_path, "x"), t, "nope")


# ---------------------------------------------------------- at-ingest wiring

def _mk_pipeline(spark, root, idx=None, **kw):
    import os as _os
    from ds_floodexposure_monitoring_spark.datagen.transcripts import (
        ChangeLogSpec, generate_changelog, transcript_schema,
    )
    from ds_floodexposure_monitoring_spark.streaming.runner import CDCPipeline

    cdir, tdir = _os.path.join(root, "log"), _os.path.join(root, "tbl")
    if not _os.path.exists(cdir):
        generate_changelog(spark, ChangeLogSpec(
            n_events=6_000, n_convs=120, n_shards=2, dup_rate=0.1,
            delete_rate=0.05, ooo_window=300, events_per_file=1_500, seed=23,
        ), cdir)
    try:
        t = LakeTable.create(spark, tdir, transcript_schema(), n_buckets=4)
    except FileExistsError:
        t = LakeTable.load(spark, tdir)
    if idx is None:
        idx = sx.create_index(spark, _os.path.join(root, "ix"), t, "role",
                              n_buckets=4)
    p = CDCPipeline(spark, cdir, t, _os.path.join(root, "ck"),
                    max_events_per_batch=2_000, mode="mor",
                    indexes={"role": idx}, **kw)
    return p, t, idx


def _assert_index_consistent(t, idx):
    roles = [r[0] for r in t.scan().select("role").distinct().collect()
             if r[0] is not None]
    assert roles
    for v in roles:
        want = sorted((r.conv_id, r.turn_idx) for r in
                      t.scan().where(F.col("role") == v).collect())
        got = sorted((r.conv_id, r.turn_idx) for r in
                     sx.lookup(idx, t, "role", [v]).collect())
        assert got == want, (v, len(got), len(want))


def test_pipeline_maintains_index_at_ingest(spark, tmpdir_path):
    p, t, idx = _mk_pipeline(spark, tmpdir_path)
    p.run_until_caught_up()
    assert idx.version > 0
    _assert_index_consistent(t, idx)


def test_pipeline_index_crash_window_converges(spark, tmpdir_path):
    """Crash after the base commit but before the index commit: the
    batch replays with the base as a no-op and only the index append
    runs — final state identical to the no-crash run."""
    p, t, idx = _mk_pipeline(spark, tmpdir_path)
    r1 = p.run_once()
    assert r1 is not None and not r1.replayed
    # simulate the crash window: batch 2 merges into the BASE only
    # (as if we died before the index append), and no checkpoint lands
    state = p.ckpt.read()
    batch = p.reader.plan_batch(state.offsets, state.batch_seq + 1)
    df, _ = p._read_clean_batch(batch, write_quarantine=True)
    merge_append(t, df, op_col="op", batch_id=batch.batch_id)
    # restart: a fresh pipeline must replay batch 2 as a base no-op
    # (stats None), run its missing index append, and keep going
    p2, t2, idx2 = _mk_pipeline(spark, tmpdir_path, idx=idx)
    results = p2.run_until_caught_up()
    replay = results[0]
    assert replay.replayed and replay.batch.batch_id == batch.batch_id
    assert replay.stats is None  # base merge was NOT repeated
    _assert_index_consistent(t2, idx2)


def test_index_backfill_then_incremental(spark, tmpdir_path):
    """Enable an index on a table that already has data: backfill once,
    then at-ingest maintenance takes over; lookup == full-scan filter."""
    import os as _os
    from ds_floodexposure_monitoring_spark.streaming.runner import CDCPipeline

    # phase 1: ingest WITHOUT any index
    p, t, _ = _mk_pipeline(spark, tmpdir_path)
    p0 = CDCPipeline(spark, _os.path.join(tmpdir_path, "log"), t,
                     _os.path.join(tmpdir_path, "ck"),
                     max_events_per_batch=2_000, mode="mor")
    p0.run_once()
    # phase 2: create + backfill, then finish ingest WITH the index
    idx = sx.create_index(spark, _os.path.join(tmpdir_path, "ix2"), t,
                          "role", n_buckets=4)
    assert sx.index_backfill(idx, t, "role") is not None
    # re-running the backfill is a ledger no-op
    assert sx.index_backfill(idx, t, "role") is None
    p1 = CDCPipeline(spark, _os.path.join(tmpdir_path, "log"), t,
                     _os.path.join(tmpdir_path, "ck"),
                     max_events_per_batch=2_000, mode="mor",
                     indexes={"role": idx})
    p1.run_until_caught_up()
    _assert_index_consistent(t, idx)


def test_pipeline_rejects_unknown_index_column(spark, tmpdir_path):
    from ds_floodexposure_monitoring_spark.streaming.runner import CDCPipeline

    p, t, idx = _mk_pipeline(spark, tmpdir_path)
    with pytest.raises(ValueError, match="not in table schema"):
        CDCPipeline(spark, os.path.join(tmpdir_path, "log"), t,
                    os.path.join(tmpdir_path, "ck2"),
                    indexes={"nope": idx})
