"""Manifest key blooms: point-lookup file skipping beyond min/max.

Delta files inside a bucket all span ~the whole keyspace (random conv
ids), so range pruning keeps every delta; the per-file bloom written by
the arrow task writer (lake.DataFile.key_bloom) is what restores O(1)
files per conversation. These tests pin: soundness (lookup results are
never changed by the bloom), effectiveness (far fewer files kept than
bucket+range pruning alone), and the writer/probe hash contract.
"""

import base64
import os

import pytest

from ds_floodexposure_monitoring_spark.datagen.transcripts import transcript_schema
from ds_floodexposure_monitoring_spark.operators.compact import merge_append
from ds_floodexposure_monitoring_spark.operators.merge import merge_into
from ds_floodexposure_monitoring_spark.sources.lake import (
    LakeTable,
    _bloom_hash64,
    _bloom_might_contain,
)

DDL = "lsn long, conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def _batch(spark, lsn0, convs, turns=3):
    rows = [
        (lsn0 + 10 * c + t, f"conv-{c:04d}", t, "user", f"m{c}.{t}", None, None)
        for c in convs
        for t in range(turns)
    ]
    return spark.createDataFrame(rows, DDL)


@pytest.fixture()
def table(spark, tmpdir_path):
    return LakeTable.create(
        spark,
        os.path.join(tmpdir_path, "t"),
        transcript_schema(),
        n_buckets=4,
        key_bloom_bits=1 << 13,
    )


def test_blooms_written_and_lookup_sound(spark, table):
    # three delta batches over overlapping key ranges -> per bucket,
    # several files whose [min_key, max_key] envelopes all overlap
    merge_append(table, _batch(spark, 0, range(0, 60)), batch_id="b1")
    merge_append(table, _batch(spark, 1000, range(0, 60, 2)), batch_id="b2")
    merge_append(table, _batch(spark, 2000, range(1, 60, 2)), batch_id="b3")

    files = table.files()
    assert files and all(f.key_bloom for f in files)

    probe = ["conv-0007"]
    kept = table.prune_for_keys(probe)
    # effectiveness: bucket+range alone keeps every same-bucket file
    # (ranges overlap by construction); the bloom must beat that
    vdf = spark.createDataFrame([(p,) for p in probe], "conv_id string")
    bucket = vdf.select(table.bucket_expr().alias("b")).collect()[0]["b"]
    in_bucket = [f for f in files if f.bucket == bucket]
    assert len(kept) < len(in_bucket)
    # conv 7 was written in batches b1 and b3 only -> exactly 2 files
    # hold it; false keeps are possible but bounded
    assert 2 <= len(kept) <= len(in_bucket)

    # soundness: lookup (bloom-pruned) equals a full scan + filter
    got = sorted(
        (r.conv_id, r.turn_idx, r.text) for r in table.lookup(probe).collect()
    )
    want = sorted(
        (r.conv_id, r.turn_idx, r.text)
        for r in table.scan().where("conv_id = 'conv-0007'").collect()
    )
    assert got == want and len(got) == 3


def test_absent_key_prunes_everything(spark, table):
    merge_append(table, _batch(spark, 0, range(0, 80)), batch_id="b1")
    merge_append(table, _batch(spark, 1000, range(0, 80)), batch_id="b2")
    n_files = len(table.files())
    # 50 absent keys: with 8 Kib blooms over <=~25 keys/file the
    # expected false-keep rate is well under 1%; allow a generous bound
    absent = [f"missing-{i:04d}" for i in range(50)]
    kept = table.prune_for_keys(absent)
    assert len(kept) <= max(2, n_files // 4)
    for k in absent[:5]:
        assert table.lookup([k]).count() == 0


def test_probe_matches_writer_hash_contract(spark, table):
    merge_append(table, _batch(spark, 0, range(0, 20)), batch_id="b1")
    f = next(f for f in table.files() if f.key_bloom)
    raw = base64.b64decode(f.key_bloom)
    assert len(raw) == (1 << 13) >> 3
    # every key the file actually holds must probe positive (soundness
    # of the bloom itself, independent of pruning): read the file back
    df = spark.read.parquet(os.path.join(table.path, f.path))
    keys = [r.conv_id for r in df.select("conv_id").distinct().collect()]
    hs = _bloom_hash64(keys)
    assert all(
        _bloom_might_contain(raw, int(h)) for h in hs
    ), "a written key probed negative: writer/probe hash functions diverge"


def test_bloom_survives_compaction_and_rollback(spark, table):
    from ds_floodexposure_monitoring_spark.operators.compact import compact

    merge_append(table, _batch(spark, 0, range(0, 40)), batch_id="b1")
    merge_append(table, _batch(spark, 1000, range(0, 40)), batch_id="b2")
    v_before = table.version
    compact(table)
    assert all(f.key_bloom for f in table.files())
    got = table.lookup(["conv-0003"]).count()
    assert got == 3
    table.rollback(v_before)
    assert all(f.key_bloom for f in table.files())
    assert table.lookup(["conv-0003"]).count() == 3


def test_integral_key_bloom(spark, tmpdir_path):
    """Blooms over an int64 first key take the numeric hash path on
    both sides (writer dtype-pins int64 so a null can't demote the
    column to float64 and poison every row's hash)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    t = LakeTable.create(
        spark,
        os.path.join(tmpdir_path, "ints"),
        schema,
        merge_keys=("user_id", "event_type"),
        n_buckets=4,
        key_bloom_bits=1 << 13,
    )
    mk = lambda lsn0, ids: spark.createDataFrame(
        [(lsn0 + i, i, "click", float(i)) for i in ids],
        "lsn long, user_id long, event_type string, value double",
    )
    merge_append(t, mk(0, range(0, 200)), batch_id="b1")
    merge_append(t, mk(1000, range(0, 200, 2)), batch_id="b2")
    assert all(f.key_bloom for f in t.files())
    # present key: sound lookup
    got = sorted((r.user_id, r.value) for r in t.lookup([7]).collect())
    assert got == [(7, 7.0)]
    # absent keys: blooms prune to ~nothing
    kept = t.prune_for_keys(list(range(10_000, 10_050)))
    assert len(kept) <= 2
    assert t.lookup([10_007]).count() == 0


def test_no_bloom_when_disabled(spark, tmpdir_path):
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "plain"), transcript_schema(), n_buckets=4
    )
    merge_into(t, _batch(spark, 0, range(0, 10)), batch_id="b1")
    assert all(f.key_bloom is None for f in t.files())
    assert t.lookup(["conv-0003"]).count() == 3
