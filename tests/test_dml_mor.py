"""Merge-on-read DML: corrections appended as (same-LSN, bumped _dml_seq)
delta rows; scan-time LWW resolves (lsn, seq) so the correction wins over
the stored original and over exact redeliveries, newer CDC events still
win over corrections, and compaction physically erases MOR deletes.

Iceberg sequence-number analog; reference analog is the point-in-time
correction the pandas pipeline does by overwriting the blob wholesale
(reference: pipelines/update_exposure_quantile.py:98-105) — here it is
O(matched rows), never a table rewrite.
"""

import os

import pytest
from pyspark.sql import functions as F

from ds_floodexposure_monitoring_spark.datagen.transcripts import transcript_schema
from ds_floodexposure_monitoring_spark.operators.compact import compact, merge_append
from ds_floodexposure_monitoring_spark.operators.dml import (
    delete_where_mor,
    update_where,
    update_where_mor,
)
from ds_floodexposure_monitoring_spark.operators.merge import merge_into
from ds_floodexposure_monitoring_spark.sources.lake import (
    DML_SEQ_COL,
    TOMBSTONE_COL,
    LakeTable,
)

DDL = "lsn long, conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def _rows(n, text=lambda i: f"text-{i}"):
    return [
        (i + 1, f"c{i % 20}", i // 20, "user" if i % 2 else "assistant",
         text(i), None, None)
        for i in range(n)
    ]


@pytest.fixture()
def table(spark, tmpdir_path):
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), transcript_schema(), n_buckets=16
    )
    merge_append(t, spark.createDataFrame(_rows(200), DDL), batch_id="seed")
    return t


def _texts(t):
    return {(r.conv_id, r.turn_idx): r.text for r in t.scan().collect()}


def test_update_mor_appends_only_matches(spark, table):
    files_before = {f.path for f in table.files()}
    st = update_where_mor(table, F.col("conv_id") == "c3", {"text": F.lit("REDACTED")})
    assert st is not None and st.files_removed == 0 and st.buckets_rewritten == 0
    # every pre-existing file is still referenced — nothing was rewritten
    assert files_before <= {f.path for f in table.files()}
    # delta volume is the match count, not the bucket row count
    added = [f for f in table.files() if f.path not in files_before]
    assert sum(f.rows for f in added) == st.rows_matched
    got = _texts(table)
    assert all(v == "REDACTED" for (c, _), v in got.items() if c == "c3")
    assert all(v != "REDACTED" for (c, _), v in got.items() if c != "c3")


def test_update_mor_beats_equal_lsn_redelivery(spark, table):
    update_where_mor(table, F.col("conv_id") == "c3", {"text": F.lit("REDACTED")})
    # exact redelivery of a pre-correction event: same LSN, original text
    victim = [r for r in _rows(200) if r[1] == "c3"][0]
    merge_append(table, spark.createDataFrame([victim], DDL), batch_id="redeliver")
    assert _texts(table)[(victim[1], victim[2])] == "REDACTED"
    # ... and through the COW merge path too
    merge_into(table, spark.createDataFrame([victim], DDL), batch_id="redeliver-cow")
    assert _texts(table)[(victim[1], victim[2])] == "REDACTED"


def test_newer_event_beats_correction(spark, table):
    update_where_mor(table, F.col("conv_id") == "c3", {"text": F.lit("REDACTED")})
    victim = [r for r in _rows(200) if r[1] == "c3"][0]
    newer = (10_000,) + victim[1:4] + ("fresh-edit", None, None)
    merge_append(table, spark.createDataFrame([newer], DDL), batch_id="newer")
    assert _texts(table)[(victim[1], victim[2])] == "fresh-edit"


def test_stacked_corrections_last_wins(spark, table):
    update_where_mor(table, F.col("conv_id") == "c3", {"text": F.lit("PASS1")})
    update_where_mor(table, F.col("conv_id") == "c3", {"text": F.lit("PASS2")})
    got = _texts(table)
    assert all(v == "PASS2" for (c, _), v in got.items() if c == "c3")
    seqs = (
        table.scan(include_internal=True)
        .where(F.col("conv_id") == "c3")
        .select(F.max(F.coalesce(F.col(DML_SEQ_COL), F.lit(0))).alias("m"))
        .collect()[0]["m"]
    )
    assert seqs == 2


def test_delete_mor_hides_then_compaction_erases(spark, table):
    before = _texts(table)
    st = delete_where_mor(table, F.col("conv_id") == "c3")
    assert st is not None and st.files_removed == 0
    after = _texts(table)
    assert set(after) == {k for k in before if k[0] != "c3"}
    # redelivery of the original event stays deleted
    victim = [r for r in _rows(200) if r[1] == "c3"][0]
    merge_append(table, spark.createDataFrame([victim], DDL), batch_id="redeliver")
    assert (victim[1], victim[2]) not in _texts(table)
    # compaction with a watermark physically erases the tombstones
    cs = compact(table, min_files_per_bucket=1, tombstone_watermark_lsn=1_000_000)
    assert cs is not None
    internal = table.scan(include_internal=True)
    assert internal.where(F.coalesce(F.col(TOMBSTONE_COL), F.lit(False))).count() == 0
    assert set(_texts(table)) == {k for k in before if k[0] != "c3"}


def test_cow_update_now_survives_redelivery(spark, table):
    """update_where (COW) bumps _dml_seq too: the round-1 documented
    redelivery hazard is closed for both strategies."""
    update_where(table, F.col("conv_id") == "c7", {"text": F.lit("FIXED")})
    victim = [r for r in _rows(200) if r[1] == "c7"][0]
    merge_append(table, spark.createDataFrame([victim], DDL), batch_id="redeliver")
    assert _texts(table)[(victim[1], victim[2])] == "FIXED"


def test_change_feed_reports_mor_corrections(spark, table):
    v0 = table.version
    update_where_mor(table, F.col("conv_id") == "c3", {"text": F.lit("REDACTED")})
    delete_where_mor(table, F.col("conv_id") == "c5")
    feed = table.scan_changes(v0).collect()
    by_type = {}
    for r in feed:
        by_type.setdefault(r["change_type"], set()).add((r["conv_id"], r["turn_idx"]))
    assert all(c == "c3" for c, _ in by_type.get("update", set()))
    assert all(c == "c5" for c, _ in by_type.get("delete", set()))
    assert len(by_type.get("update", set())) == 10
    assert len(by_type.get("delete", set())) == 10


def test_no_match_is_noop(spark, table):
    v = table.version
    assert delete_where_mor(table, F.col("conv_id") == "zzz") is None
    assert update_where_mor(table, F.col("conv_id") == "zzz", {"text": F.lit("x")}) is None
    assert table.version == v


def test_update_mor_rejects_key_assignment(spark, table):
    with pytest.raises(ValueError):
        update_where_mor(table, F.col("conv_id") == "c3", {"conv_id": F.lit("x")})
