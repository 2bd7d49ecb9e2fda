"""Non-key footer stats + range pruning (scan_range): file-level
skipping on resolved snapshots, bucket-complete degradation on MOR
snapshots, and the stale-row trap a naive prune would fall into."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ds_floodexposure_monitoring_spark.operators.compact import merge_append
from ds_floodexposure_monitoring_spark.operators.merge import merge_into
from ds_floodexposure_monitoring_spark.sources.lake import LakeTable

DDL = "lsn long, k string, v double, ts timestamp"
SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("v", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

JAN = dt.datetime(2024, 1, 15)
FEB = dt.datetime(2024, 2, 15)
MAR = dt.datetime(2024, 3, 15)


@pytest.fixture()
def table(spark, tmpdir_path):
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), SCHEMA,
        merge_keys=("k",), n_buckets=2, stat_cols=("ts",),
    )
    # batch A: u-keys in January; batch B: v-keys in February. Disjoint
    # key ranges -> the COW merge never rewrites A's files, so files
    # stay time-correlated (the append-mostly transcript pattern).
    a = [(i, f"u{i:03d}", float(i), JAN + dt.timedelta(hours=i)) for i in range(40)]
    b = [(100 + i, f"v{i:03d}", float(i), FEB + dt.timedelta(hours=i)) for i in range(40)]
    merge_into(t, spark.createDataFrame(a, DDL), batch_id="jan")
    merge_into(t, spark.createDataFrame(b, DDL), batch_id="feb")
    return t


def test_resolved_snapshot_prunes_files(spark, table):
    total = len(table.files())
    kept = table.prune_for_range("ts", FEB - dt.timedelta(days=10), FEB + dt.timedelta(days=10))
    assert 0 < len(kept) < total  # January files skipped by metadata alone
    got = sorted(r.k for r in table.scan_range(
        "ts", FEB - dt.timedelta(days=10), FEB + dt.timedelta(days=10)).collect())
    want = sorted(r.k for r in table.scan()
                  .where(F.col("ts").between(F.lit(FEB - dt.timedelta(days=10)),
                                             F.lit(FEB + dt.timedelta(days=10)))).collect())
    assert got == want and len(got) == 40


def test_mor_snapshot_does_not_return_stale_versions(spark, table):
    # March delta UPDATES v-keys (MOR append, unresolved): their winners
    # now sit OUTSIDE a February range query. A naive file-level prune
    # would keep only the February file and resurrect the stale rows.
    delta = [(1000 + i, f"v{i:03d}", -1.0, MAR) for i in range(40)]
    merge_append(table, spark.createDataFrame(delta, DDL), batch_id="mar")
    assert table.current().get("requires_resolve", False)
    got = {r.k for r in table.scan_range(
        "ts", FEB - dt.timedelta(days=10), FEB + dt.timedelta(days=10)).collect()}
    assert got == set()  # every v-key's winner moved to March
    # and the March range sees exactly the updated rows
    got_mar = sorted((r.k, r.v) for r in table.scan_range(
        "ts", MAR - dt.timedelta(days=1), MAR + dt.timedelta(days=1)).collect())
    assert got_mar == [(f"v{i:03d}", -1.0) for i in range(40)]


def test_unstatted_column_rejected(spark, table):
    with pytest.raises(ValueError, match="stat_cols"):
        table.prune_for_range("v", 0.0, 1.0)


def test_stats_survive_commit_carry(spark, table):
    # stat_cols must ride through commits (merge twice already); every
    # data file carries ts bounds
    assert table.current()["stat_cols"] == ["ts"]
    assert all((f.col_stats or {}).get("ts") for f in table.files())


def test_multimodal_kernels_skip_null_payloads(spark):
    """NULL text rows must be skipped by the code-point kernels, not
    crash the Python worker (the oracles generate no rows for NULL)."""
    from ds_floodexposure_monitoring_spark.functions.multimodal import (
        histogram_features,
        resample_payload,
        sample_frames,
    )

    df = spark.createDataFrame(
        [(1, "hello world"), (2, None), (3, "")], "doc_id long, text string"
    )
    assert {r.doc_id for r in histogram_features(df).collect()} == {1}
    assert {r.doc_id for r in resample_payload(df).collect()} == {1}
    assert {r.doc_id for r in sample_frames(df).collect()} == {1}


def test_multimodal_decoder_pluggable(spark):
    """decode_payload: registered decoders win, codec magics without a
    decoder raise loudly, non-codec payloads use the deterministic fake
    — and registered decoders reach EXECUTORS (captured by value at
    plan-build time, not looked up in the worker's module globals)."""
    import pytest as _pytest

    from ds_floodexposure_monitoring_spark.functions import multimodal as mm

    png = b"\x89PNG\r\n\x1a\n" + b"x" * 100
    # no decoder available in this container -> loud failure
    with _pytest.raises(NotImplementedError):
        mm.decode_payload(png)
    # non-codec payloads keep the deterministic fake
    meta = mm.decode_payload(b"hello world")
    assert meta == {"n_bytes": 11, "width": 11, "height": 77, "n_frames": 12}

    def fake_png(payload):
        if payload[:4] != b"\x89PNG":
            return None
        return {"n_bytes": len(payload), "width": 64, "height": 32, "n_frames": 1}

    mm.register_decoder(fake_png)
    try:
        assert mm.decode_payload(png, tuple(mm._DECODERS))["width"] == 64
        # end-to-end through the Arrow plumbing on executors
        df = spark.createDataFrame(
            [(1, png), (2, b"plain bytes")], "doc_id long, payload binary"
        )
        rows = {r["doc_id"]: r for r in mm.decode_metadata(df).collect()}
        assert rows[1]["width"] == 64 and rows[1]["n_frames"] == 1
        assert rows[2]["width"] == len(b"plain bytes") % 640
    finally:
        mm._DECODERS.remove(fake_png)
