"""Scale-guard regressions for round-2 fixes:

- similarity candidate sides are CONSTANT-bounded (never O(corpus) on
  the driver);
- the sessionization gap compares at full microsecond precision (a gap
  1 microsecond either side of the 30-min boundary classifies exactly
  like the oracle's interval compare);
- duplicate/missing task outputs are refused before commit.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ds_floodexposure_monitoring_spark.functions.vector import bounded_collect
from ds_floodexposure_monitoring_spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def test_bounded_collect_enforces_constant(spark):
    df = spark.range(100)
    assert len(bounded_collect(df, 100)) == 100
    with pytest.raises(ValueError, match="constant bound"):
        bounded_collect(df, 99)


def test_similarity_queries_use_bounded_candidate_sides():
    """Structural check: the queries that broadcast a candidate matrix
    pull it through the bounded_collect guard; no bare .collect() of a
    corpus-proportional side remains in the similarity module."""
    import inspect

    from ds_floodexposure_monitoring_spark.plans import contract_docs as m

    for name in ("ann_ivf", "embedding_knn"):
        src = inspect.getsource(REGISTRY[name].fn)
        assert "bounded_collect" in src, name
    neardup = inspect.getsource(m.embedding_neardup_cosine)
    assert ".collect()" not in neardup and "broadcast" not in neardup
    # the codebook / query-set caps are genuine constants
    assert m.CODEBOOK_K <= 4096 and m.KNN_QUERY_LIMIT <= 4096


def test_sessionize_microsecond_boundary(spark, tmpdir_path):
    """Gaps of 30min-1us / 30min / 30min+1us: only the strictly-greater
    gap starts a new session, at full precision (ADVICE round 1)."""
    base = dt.datetime(2024, 1, 1, 0, 0, 0, 123456)
    gaps = [
        dt.timedelta(minutes=30, microseconds=-1),
        dt.timedelta(minutes=30),
        dt.timedelta(minutes=30, microseconds=1),  # the only session break
    ]
    ts, rows = base, []
    for i, g in enumerate([dt.timedelta(0)] + gaps):
        ts = ts + g
        rows.append((i, ts, 1, "click", 1.0, "{}"))
    spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{tmpdir_path}/events.parquet")

    out = REGISTRY["sessionize_events"].fn(spark, tmpdir_path)
    sessions = {r["session_no"]: r["n_events"] for r in out.collect()}
    assert sessions == {1: 3, 2: 1}, sessions


def test_write_consistency_guard():
    from ds_floodexposure_monitoring_spark.operators.merge import _check_write_consistency
    from ds_floodexposure_monitoring_spark.sources.lake import DataFile

    files = [DataFile("data/x.parquet", 0, 10, "a", "b", 1)]
    _check_write_consistency(10, files)  # consistent: no raise
    with pytest.raises(RuntimeError, match="refusing to commit"):
        _check_write_consistency(9, files)  # duplicate task output
