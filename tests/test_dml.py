"""Predicate DELETE / UPDATE: bucket-granular copy-on-write rewrite,
untouched buckets carried by reference, CDC ordering preserved."""

import os

import pytest
from pyspark.sql import functions as F

from ds_floodexposure_monitoring_spark.datagen.transcripts import transcript_schema
from ds_floodexposure_monitoring_spark.operators.dml import delete_where, update_where
from ds_floodexposure_monitoring_spark.operators.merge import merge_into
from ds_floodexposure_monitoring_spark.sources.lake import LakeTable

DDL = "lsn long, conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


@pytest.fixture()
def table(spark, tmpdir_path):
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), transcript_schema(), n_buckets=16
    )
    rows = [
        (i + 1, f"c{i % 20}", i // 20, "user" if i % 2 else "assistant",
         f"text-{i}", None, None)
        for i in range(200)
    ]
    merge_into(t, spark.createDataFrame(rows, DDL), batch_id="seed")
    return t


def _texts(t):
    return sorted((r.conv_id, r.turn_idx, r.text) for r in t.scan().collect())


def test_delete_where_removes_only_matches(spark, table):
    before = _texts(table)
    doomed = {x for x in before if x[0] == "c3"}
    untouched_paths = {
        f.path for f in table.files() if f.bucket not in
        {r["b"] for r in table.scan().where(F.col("conv_id") == "c3")
         .select(table.bucket_expr().alias("b")).distinct().collect()}
    }
    st = delete_where(table, F.col("conv_id") == "c3")
    assert st is not None and st.rows_matched == len(doomed)
    after = _texts(table)
    assert set(after) == set(before) - doomed
    # untouched buckets carried by reference, not rewritten
    assert untouched_paths <= {f.path for f in table.files()}
    # no-match delete commits nothing
    v = table.version
    assert delete_where(table, F.col("conv_id") == "zzz") is None
    assert table.version == v


def test_update_where_sets_only_matches_and_keeps_lsn_order(spark, table):
    st = update_where(
        table, "turn_idx >= 8", {"text": F.concat(F.col("text"), F.lit("!"))}
    )
    assert st is not None and st.rows_matched == 200 - 8 * 20
    got = _texts(table)
    for conv, turn, text in got:
        assert text.endswith("!") == (turn >= 8), (conv, turn, text)

    # a pre-dated (lower-LSN) change event must still LOSE to nothing —
    # and a higher-LSN event must win over the updated value
    b = spark.createDataFrame(
        [(1000, "c0", 8, "user", "newer wins", None, None),
         (0, "c1", 8, "user", "stale loses", None, None)], DDL
    )
    merge_into(table, b, batch_id="after-update")
    texts = dict(((c, i), x) for c, i, x in _texts(table))
    assert texts[("c0", 8)] == "newer wins"
    assert texts[("c1", 8)].endswith("!")  # updated value survived the stale event


def test_update_merge_key_rejected(spark, table):
    with pytest.raises(ValueError, match="merge-key"):
        update_where(table, "turn_idx > 0", {"conv_id": F.lit("x")})


def test_update_where_visible_in_change_feed(spark, table):
    """A DML correction keeps LSNs, so the snapshot-diff feed must detect
    it by PAYLOAD comparison — otherwise incremental rollups go stale."""
    v0 = table.version
    st = update_where(table, "turn_idx = 3", {"text": F.lit("corrected")})
    feed = table.scan_changes(v0, table.version).collect()
    assert len(feed) == st.rows_matched > 0
    assert all(r.change_type == "update" and r.text == "corrected" for r in feed)


def test_delete_matching_accepts_custom_key_col_name(spark, table):
    from ds_floodexposure_monitoring_spark.operators.dml import delete_matching

    ids = spark.createDataFrame([("c4",)], "the_id string")
    before = _texts(table)
    st = delete_matching(table, ids, key_col="the_id")
    assert st is not None and st.rows_matched == sum(1 for x in before if x[0] == "c4")
    assert all(c != "c4" for c, _, _ in _texts(table))


def test_delete_matching_erases_key_set(spark, table):
    keys = spark.createDataFrame([("c2",), ("c7",), ("zz",)], "conv_id string")
    before = _texts(table)
    doomed = {x for x in before if x[0] in ("c2", "c7")}
    from ds_floodexposure_monitoring_spark.operators.dml import delete_matching

    st = delete_matching(table, keys)
    assert st is not None and st.rows_matched == len(doomed)
    assert set(_texts(table)) == set(before) - doomed
    # second run: keys already gone -> zero matches, still commits the
    # rewrite of the (hash-determined) buckets or no-ops on empty bucket set
    st2 = delete_matching(table, spark.createDataFrame([("nope",)], "conv_id string"))
    assert st2 is None or st2.rows_matched == 0


def test_delete_then_reinsert_via_cdc(spark, table):
    delete_where(table, "conv_id = 'c5'")
    assert all(c != "c5" for c, _, _ in _texts(table))
    merge_into(
        table,
        spark.createDataFrame([(5000, "c5", 0, "user", "back", None, None)], DDL),
        batch_id="reinsert",
    )
    assert ("c5", 0, "back") in _texts(table)


def test_predicate_bounds_extraction(spark):
    from ds_floodexposure_monitoring_spark.sources.lake import _predicate_bounds

    b = _predicate_bounds(spark, "conv_id = 'c3'")
    assert b == {"conv_id": ("c3", "c3")}
    b = _predicate_bounds(spark, "turn_idx >= 3 AND turn_idx < 7 AND conv_id = 'x'")
    assert b["turn_idx"] == (3, 7) and b["conv_id"] == ("x", "x")
    b = _predicate_bounds(
        spark, "ts >= timestamp'2024-01-02 00:00:00' AND length(text) > 2"
    )
    # timestamp bound in epoch micros; the function conjunct is ignored
    assert b == {"ts": (1704153600000000, None)}
    b = _predicate_bounds(spark, "turn_idx IN (5, 2, 9)")
    assert b == {"turn_idx": (2, 9)}
    # OR at top level: no necessary per-column condition -> no pruning
    assert _predicate_bounds(spark, "turn_idx = 1 OR conv_id = 'a'") == {}
    # unparseable -> no pruning, no raise
    assert _predicate_bounds(spark, "this is (not sql") == {}
    # literal-vs-literal and col-vs-col conjuncts are ignored
    assert _predicate_bounds(spark, "turn_idx = other_col") == {}


def test_dml_stat_pruned_planning(spark, tmpdir_path):
    """A SQL-text predicate on a stat_cols column plans over a pruned
    file subset: the census scan opens fewer files than the table holds,
    and results are identical to the unpruned path."""
    from ds_floodexposure_monitoring_spark.operators.dml import delete_where_mor

    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "p"), transcript_schema(),
        n_buckets=4, stat_cols=("ts",),
    )
    # three COW merges with disjoint ts ranges -> files with disjoint stats
    import datetime as dt

    for day in (1, 2, 3):
        rows = [
            (day * 1000 + i, f"c{day}-{i % 5}", i, "user", f"d{day}-{i}", None,
             dt.datetime(2024, 1, day, i % 24))
            for i in range(50)
        ]
        merge_into(t, spark.createDataFrame(rows, DDL), batch_id=f"d{day}")

    cond = "ts >= timestamp'2024-01-03 00:00:00'"
    pruned = t.prune_for_predicate(cond)
    all_files = t.files()
    assert len(pruned) < len(all_files), (len(pruned), len(all_files))
    # pruned set must still hold every actual match
    assert t.scan(files=pruned).where(cond).count() == t.scan().where(cond).count()

    before = t.scan().where(f"NOT ({cond})").count()
    st = delete_where(t, cond)
    assert st is not None and st.rows_matched == 50
    assert t.scan().count() == before

    # MOR path: correction deltas built from the pruned scan too
    st2 = delete_where_mor(t, "ts >= timestamp'2024-01-02 00:00:00'")
    assert st2 is not None and st2.rows_matched == 50
    assert t.scan().count() == 50
    assert {r.conv_id.split("-")[0] for r in t.scan().select("conv_id").collect()} == {"c1"}


def test_delete_matching_pointwise_is_file_granular(spark, tmpdir_path):
    """Small key sets take the bloom-file-granular path: only files that
    can hold the doomed keys are rewritten (not whole buckets), rows of
    other keys survive verbatim (no LWW fold of partial version
    chains), resolution state and base/delta flags carry through."""
    from ds_floodexposure_monitoring_spark.operators.compact import merge_append
    from ds_floodexposure_monitoring_spark.operators.dml import delete_matching

    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "pw"), transcript_schema(),
        n_buckets=4, key_bloom_bits=1 << 13,
    )
    # three overlapping-range delta batches -> per bucket, several files
    # whose [min_key, max_key] envelopes all overlap; blooms disjoint
    def batch(lsn0, convs):
        rows = [
            (lsn0 + 10 * c + k, f"conv-{c:04d}", k, "user", f"m{c}.{k}.{lsn0}", None, None)
            for c in convs for k in range(2)
        ]
        return spark.createDataFrame(rows, DDL)

    merge_append(t, batch(0, range(0, 60)), batch_id="b1")
    merge_append(t, batch(10_000, range(0, 60, 2)), batch_id="b2")
    merge_append(t, batch(20_000, range(1, 60, 2)), batch_id="b3")
    assert t.current()["requires_resolve"] is True
    files_before = {f.path: f for f in t.files()}

    doomed = ["conv-0007", "conv-0008"]
    keys = spark.createDataFrame([(k,) for k in doomed], "conv_id string")
    want_after = sorted(
        (r.conv_id, r.turn_idx, r.text)
        for r in t.scan().where(~F.col("conv_id").isin(doomed)).collect()
    )
    doomed_buckets = {
        r["b"] for r in keys.select(t.bucket_expr(key_col="conv_id").alias("b"))
        .distinct().collect()
    }
    bucket_files = sum(1 for f in files_before.values() if f.bucket in doomed_buckets)
    bloom_files = len(t.prune_for_keys(doomed))

    st = delete_matching(t, keys)
    assert st is not None
    # file-granular: strictly fewer files rewritten than the touched
    # buckets hold (the bloom skips same-bucket files without the keys)
    assert st.files_removed == bloom_files < bucket_files
    # verbatim rewrite: resolution still required, results exact
    assert t.current()["requires_resolve"] is True
    got = sorted((r.conv_id, r.turn_idx, r.text) for r in t.scan().collect())
    assert got == want_after
    for k in doomed:
        assert t.lookup([k]).count() == 0
    # untouched files carried by reference (same path objects)
    untouched = set(files_before) - {f.path for f in t.prune_for_keys(doomed, snapshot=t.snapshot(st.snapshot_version - 1))}
    assert untouched <= {f.path for f in t.files()}
    # rewritten files keep manifest blooms and base/delta flags
    assert all(f.key_bloom for f in t.files())


def test_delete_matching_large_key_set_uses_bucket_path(spark, table):
    """Above the pointwise threshold the bucket-granular LEFT ANTI path
    still runs (key set stays distributed)."""
    from ds_floodexposure_monitoring_spark.operators.dml import delete_matching

    keys = spark.createDataFrame(
        [(f"c{i % 20}",) for i in range(40)], "conv_id string"
    )
    before = _texts(table)
    doomed = {x for x in before if x[0] in {f"c{i % 20}" for i in range(40)}}
    st = delete_matching(table, keys, max_pointwise_keys=5)
    assert st is not None and st.rows_matched == len(doomed)
    assert set(_texts(table)) == set(before) - doomed
