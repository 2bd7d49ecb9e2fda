"""Dim-driven dynamic file pruning (LakeTable.join_pruned).

Delta dynamic-file-pruning / Iceberg runtime-filter analog: the dim
side's distinct keys cut the fact table's file set via manifest
metadata (bucket, key range, bloom) before any scan. These tests pin:
soundness (identical results to a full-scan join, including under MOR
version chains), effectiveness (fewer files scanned than the table
holds), null-key semantics, and every loud guard.
"""

import os

import pytest
from pyspark.sql import functions as F

from ds_floodexposure_monitoring_spark.datagen.transcripts import transcript_schema
from ds_floodexposure_monitoring_spark.operators.compact import merge_append
from ds_floodexposure_monitoring_spark.sources.lake import LakeTable

DDL = "lsn long, conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def _batch(spark, lsn0, convs, turns=2):
    rows = [
        (lsn0 + 10 * c + t, f"conv-{c:04d}", t, "user", f"m{lsn0}.{c}.{t}", None, None)
        for c in convs
        for t in range(turns)
    ]
    return spark.createDataFrame(rows, DDL)


@pytest.fixture()
def table(spark, tmpdir_path):
    t = LakeTable.create(
        spark,
        os.path.join(tmpdir_path, "t"),
        transcript_schema(),
        n_buckets=4,
        key_bloom_bits=1 << 13,
    )
    # overlapping key ranges -> several same-bucket delta files whose
    # [min_key, max_key] envelopes all overlap; later batches rewrite
    # some turns so MOR resolution is actually exercised
    merge_append(t, _batch(spark, 0, range(0, 60)), batch_id="b1")
    merge_append(t, _batch(spark, 1000, range(0, 60, 2)), batch_id="b2")
    merge_append(t, _batch(spark, 2000, range(1, 60, 2)), batch_id="b3")
    return t


def _dim(spark, convs, rank0=0):
    return spark.createDataFrame(
        [(f"conv-{c:04d}", rank0 + i) for i, c in enumerate(convs)],
        "conv_id string, dim_rank int",
    )


def test_sound_vs_full_scan_join(spark, table):
    dim = _dim(spark, [3, 7, 41, 58])
    got = table.join_pruned(dim)
    want = table.scan().join(dim, "conv_id", "inner")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # MOR resolution: conv-0007 (odd) was rewritten in b3 -> latest text
    texts = {r["text"] for r in got.where(F.col("conv_id") == "conv-0007").collect()}
    assert texts == {"m2000.7.0", "m2000.7.1"}


def test_prunes_files(table):
    keys = ["conv-0003", "conv-0007"]
    kept = table.prune_for_keys(keys)
    assert 0 < len(kept) < len(table.files())


def test_semi_filters_without_dim_columns(spark, table):
    dim = _dim(spark, [5, 6])
    got = table.join_pruned(dim, how="semi")
    assert "dim_rank" not in got.columns
    assert {r["conv_id"] for r in got.collect()} == {"conv-0005", "conv-0006"}


def test_null_and_missing_dim_keys_drop(spark, table):
    dim = spark.createDataFrame(
        [("conv-0004", 1), (None, 2), ("conv-9999", 3)],
        "conv_id string, dim_rank int",
    )
    got = table.join_pruned(dim).collect()
    assert {r["conv_id"] for r in got} == {"conv-0004"}


def test_guards(spark, table):
    dim = _dim(spark, [1, 2, 3])
    with pytest.raises(ValueError, match="first merge key"):
        table.join_pruned(dim, on="turn_idx")
    with pytest.raises(ValueError, match="how"):
        table.join_pruned(dim, how="left")
    with pytest.raises(ValueError, match="max_keys"):
        table.join_pruned(dim, max_keys=2)
