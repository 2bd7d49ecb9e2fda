"""Lake table format + MERGE INTO semantics."""

import os

import pytest

from ds_floodexposure_monitoring_spark.datagen.transcripts import transcript_schema
from ds_floodexposure_monitoring_spark.operators.merge import merge_into
from ds_floodexposure_monitoring_spark.sources.lake import LakeTable

DDL = "lsn long, conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


@pytest.fixture()
def table(spark, tmpdir_path):
    return LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), transcript_schema(), n_buckets=8
    )


def _state(table, version=None):
    return sorted(
        (r.conv_id, r.turn_idx, r.text) for r in table.scan(version=version).collect()
    )


def test_merge_insert_update_dedup(spark, table):
    b1 = spark.createDataFrame(
        [
            (1, "c1", 0, "user", "hello v1", None, None),
            (2, "c1", 0, "user", "hello v2", None, None),
            (3, "c1", 1, "assistant", "hi", None, None),
            (4, "c2", 0, "user", "yo", None, None),
            (4, "c2", 0, "user", "yo", None, None),
        ],
        DDL,
    )
    st = merge_into(table, b1, batch_id="b1")
    assert (st.batch_rows, st.distinct_keys, st.dedup_dropped) == (5, 3, 2)
    assert (st.inserted, st.updated) == (3, 0)
    assert _state(table) == [("c1", 0, "hello v2"), ("c1", 1, "hi"), ("c2", 0, "yo")]

    # batch 2: stale event must lose, newer must win, new key inserts
    b2 = spark.createDataFrame(
        [
            (0, "c1", 0, "user", "STALE", None, None),
            (8, "c1", 1, "assistant", "hi v8", None, None),
            (9, "c3", 0, "user", "new conv", None, None),
        ],
        DDL,
    )
    st2 = merge_into(table, b2, batch_id="b2")
    assert st2.inserted == 1 and st2.updated == 1
    assert _state(table) == [
        ("c1", 0, "hello v2"),
        ("c1", 1, "hi v8"),
        ("c2", 0, "yo"),
        ("c3", 0, "new conv"),
    ]


def test_time_travel_and_snapshots(spark, table):
    b1 = spark.createDataFrame([(1, "c1", 0, "user", "v1", None, None)], DDL)
    merge_into(table, b1, batch_id="b1")
    b2 = spark.createDataFrame([(2, "c1", 0, "user", "v2", None, None)], DDL)
    merge_into(table, b2, batch_id="b2")
    assert _state(table, version=2) == [("c1", 0, "v1")]
    assert _state(table, version=3) == [("c1", 0, "v2")]
    assert table.committed_batch_ids() == {"b1", "b2"}
    assert table.version == 3


def test_merge_schema_evolution_add_column(spark, table):
    merge_into(table, spark.createDataFrame([(1, "c1", 0, "user", "v1", None, None)], DDL))
    b2 = spark.createDataFrame(
        [(2, "c2", 0, "user", "v2", None, None, "gpt")], DDL + ", model string"
    )
    st = merge_into(table, b2)
    assert st.schema_added == ["model"]
    rows = {r.conv_id: r.model for r in table.scan().collect()}
    assert rows == {"c1": None, "c2": "gpt"}  # old files read with null model


def test_merge_schema_evolution_widen(spark, table):
    merge_into(table, spark.createDataFrame([(1, "c1", 0, "user", "v1", None, None)], DDL))
    wide = DDL.replace("turn_idx int", "turn_idx long")
    b2 = spark.createDataFrame([(2, "c2", 7_000_000_000, "user", "v2", None, None)], wide)
    st = merge_into(table, b2)
    assert st.schema_widened == [("turn_idx", "int", "bigint")]
    got = sorted((r.conv_id, r.turn_idx) for r in table.scan().collect())
    assert got == [("c1", 0), ("c2", 7_000_000_000)]
    assert dict(table.scan().dtypes)["turn_idx"] == "bigint"


def test_file_pruning_carries_untouched_buckets(spark, table):
    many = [(i + 1, f"conv-{i:04d}", 0, "user", f"t{i}", None, None) for i in range(200)]
    merge_into(table, spark.createDataFrame(many, DDL))
    files_before = {f.path for f in table.files()}
    # touch exactly one conversation -> only its bucket's file(s) rewritten
    one = spark.createDataFrame([(1000, "conv-0000", 0, "user", "touched", None, None)], DDL)
    st = merge_into(table, one)
    files_after = {f.path for f in table.files()}
    assert st.removed_files < len(files_before)
    assert files_before & files_after  # untouched files carried over by reference
    assert ("conv-0000", 0, "touched") in _state(table)
    assert len(_state(table)) == 200


def test_merge_delete_tombstone_no_resurrection(spark, table):
    ddl_op = "lsn long, op string, " + DDL.split("lsn long, ")[1]
    b1 = spark.createDataFrame(
        [
            (1, "I", "c1", 0, "user", "v1", None, None),
            (2, "I", "c1", 1, "user", "keepme", None, None),
        ],
        ddl_op,
    )
    merge_into(table, b1, op_col="op")
    # delete c1/0 at lsn 5
    b2 = spark.createDataFrame([(5, "D", "c1", 0, "user", None, None, None)], ddl_op)
    st = merge_into(table, b2, op_col="op")
    assert st.deleted == 1
    assert _state(table) == [("c1", 1, "keepme")]
    # stale pre-delete update (lsn 3 < 5) arrives later: must NOT resurrect
    b3 = spark.createDataFrame([(3, "U", "c1", 0, "user", "zombie", None, None)], ddl_op)
    merge_into(table, b3, op_col="op")
    assert _state(table) == [("c1", 1, "keepme")]
    # genuinely newer write after the delete DOES recreate the row
    b4 = spark.createDataFrame([(9, "U", "c1", 0, "user", "reborn", None, None)], ddl_op)
    merge_into(table, b4, op_col="op")
    assert _state(table) == [("c1", 0, "reborn"), ("c1", 1, "keepme")]
    # envelope column never entered the table schema
    assert "op" not in table.scan().columns


def test_empty_scan_schema(table):
    df = table.scan()
    assert df.count() == 0
    assert df.schema == transcript_schema()
