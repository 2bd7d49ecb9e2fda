"""Python Data Source API adapter (sources/pyds.py): the lake as
``spark.read.format("lake")`` / ``spark.readStream.format("lake_cdc")``.

Every read path is checked for EXACT row equality against the engine's
own DataFrame scan (`LakeTable.scan` / `scan_changes`), which the
oracle suite already proves exact — so these tests pin the Arrow
per-bucket fold to the JVM fold, bit for bit."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from ds_floodexposure_monitoring_spark.datagen.transcripts import transcript_schema
from ds_floodexposure_monitoring_spark.operators.compact import compact, merge_append
from ds_floodexposure_monitoring_spark.operators.dml import delete_where_mor
from ds_floodexposure_monitoring_spark.sources.lake import DataFile, LakeTable
from ds_floodexposure_monitoring_spark.sources.pyds import (
    _prune_files,
    register_lake_sources,
)

DDL = "lsn long, conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def _batch(spark, lo, n, tag, n_convs=40):
    # text depends only on the LSN (not the delivering batch): a
    # redelivered event is byte-identical, per the CDC contract — an
    # LSN tie with divergent payloads would make ANY fold ambiguous
    rows = [
        (lo + i, f"c{(lo + i) % n_convs:03d}", (lo + i) % 7, "user",
         f"t-{lo + i}", None,
         dt.datetime(2024, 1, 1) + dt.timedelta(minutes=lo + i))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, DDL)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def registered(spark):
    register_lake_sources(spark)
    return spark


@pytest.fixture()
def staged(registered, tmpdir_path):
    """3-batch MOR table with overlapping keys (out-of-order dupes across
    batches), MOR tombstones, and a manifest key bloom."""
    spark = registered
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), transcript_schema(),
        n_buckets=4, key_bloom_bits=1 << 13,
    )
    versions = [t.version]
    for i in range(3):
        # overlapping lo ranges: later batches re-deliver earlier keys
        # with higher LSNs — the LWW fold decides
        merge_append(t, _batch(spark, i * 120, 200, f"b{i}"), batch_id=f"b{i}")
        versions.append(t.version)
    delete_where_mor(t, "turn_idx = 3")
    versions.append(t.version)
    return t, versions


def _load(spark, t, **opts):
    r = spark.read.format("lake").option("path", t.path)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_read_matches_scan_mor(registered, staged):
    t, _ = staged
    got = _load(registered, t)
    assert got.schema == t.scan().schema
    assert _rows(got) == _rows(t.scan())


def test_batch_read_matches_scan_resolved(registered, staged):
    t, _ = staged
    compact(t, min_files_per_bucket=1)
    assert t.current()["requires_resolve"] is False
    got = _load(registered, t)
    # resolved snapshot: partition per FILE (plain-parquet parallelism)
    assert _rows(got) == _rows(t.scan())


def test_time_travel_version_and_timestamp(registered, staged):
    t, versions = staged
    v2 = versions[2]
    got = _load(registered, t, version=str(v2))
    assert _rows(got) == _rows(t.scan(version=v2))
    at = t.snapshot(v2)["committed_at"]
    got_ts = _load(registered, t, timestampAsOf=str(at))
    assert _rows(got_ts) == _rows(t.scan(version=v2))


def test_filter_pushdown_exact_and_pruning(registered, staged):
    t, _ = staged
    got = _load(registered, t).where(F.col("conv_id") == "c007")
    want = t.scan().where(F.col("conv_id") == "c007")
    assert _rows(got) == _rows(want)
    # range predicate path
    got_r = _load(registered, t).where(
        (F.col("conv_id") >= "c030") & (F.col("conv_id") < "c032")
    )
    want_r = t.scan().where(
        (F.col("conv_id") >= "c030") & (F.col("conv_id") < "c032")
    )
    assert _rows(got_r) == _rows(want_r)


def test_prune_files_skips_via_bucket_and_bloom(staged):
    t, _ = staged
    snap = t.current()
    entries = list(snap["files"])
    kept = _prune_files(
        entries, "string", ["c007"], None, None,
        n_buckets=snap["n_buckets"], bucket_seed=snap.get("bucket_seed", 0),
    )
    # a single conversation must not keep every delta file: bucket
    # pruning alone caps the kept set at one bucket's files, the bloom
    # cuts further within it
    assert 0 < len(kept) < len(entries)
    # bucket exactness: every kept file is in ONE bucket, and it is the
    # bucket Spark's own hash assigns the key
    want_b = (
        t.spark.createDataFrame([("c007",)], "conv_id string")
        .select(t.bucket_expr().alias("b"))
        .first()["b"]
    )
    assert {f["bucket"] for f in kept} == {want_b}
    # soundness: the kept set yields the same rows as the full scan
    kept_files = [DataFile.from_json(d) for d in kept]
    got = t.scan(files=kept_files).where(F.col("conv_id") == "c007")
    want = t.scan().where(F.col("conv_id") == "c007")
    assert _rows(got) == _rows(want)


def test_xxh64_parity_with_spark(registered):
    """The pure-Python xxhash64 used for driver-side bucket pruning must
    match Spark's expression bit-for-bit across types and the seeded
    chain (a mismatch would silently prune the WRONG bucket)."""
    import random
    import string as _string

    from pyspark.sql import functions as F2

    from ds_floodexposure_monitoring_spark.sources.lake import LakeTable as _LT
    from ds_floodexposure_monitoring_spark.sources.pyds import _spark_xxhash64

    rnd = random.Random(11)
    strs = ["", "a", "conv-00000017", "é中文-" * 9] + [
        "".join(rnd.choices(_string.printable, k=rnd.randint(0, 64)))
        for _ in range(60)
    ]
    longs = [0, 1, -1, 2**62, -(2**62)] + [
        rnd.randint(-(2**63), 2**63 - 1) for _ in range(40)
    ]
    seed = _LT.BUCKET_SEED

    def signed(h):
        return h - (1 << 64) if h >= 1 << 63 else h

    df = registered.createDataFrame([(s,) for s in strs], "v string")
    for expr, sd in ((F2.xxhash64("v"), None),
                     (F2.xxhash64("v", F2.lit(seed)), seed)):
        got = [r[0] for r in df.select(expr).collect()]
        assert got == [signed(_spark_xxhash64(s, "string", sd)) for s in strs]
    df = registered.createDataFrame([(x,) for x in longs], "v long")
    got = [r[0] for r in df.select(F2.xxhash64("v", F2.lit(seed))).collect()]
    assert got == [signed(_spark_xxhash64(x, "long", seed)) for x in longs]


def test_internal_column_mirrors_match_lake():
    """pyds mirrors lake's internal column names instead of importing
    them (by-value pickling contract) — pin them equal."""
    from ds_floodexposure_monitoring_spark.sources import lake, pyds

    assert pyds._LSN == lake.LSN_COL
    assert pyds._TOMBSTONE == lake.TOMBSTONE_COL
    assert pyds._DML_SEQ == lake.DML_SEQ_COL
    assert pyds._flsn("x") == lake.flsn_col("x")
    # snapshot file naming used by the pure-json readers
    t_path = lake.LakeTable.__dict__["_snap_path"]
    assert "v{version:08d}.json" in __import__("inspect").getsource(t_path)


def test_partial_update_table(registered, tmpdir_path):
    spark = registered
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "pu"), transcript_schema(),
        n_buckets=4, merge_engine="partial-update",
    )
    full = _batch(spark, 0, 150, "base")
    merge_append(t, full, batch_id="b0")
    # patch batch: only `text` carried (others null → must NOT clobber)
    patch = full.select(
        (F.col("lsn") + 1000).alias("lsn"), "conv_id", "turn_idx",
        F.lit(None).cast("string").alias("role"),
        F.concat(F.lit("patched-"), "text").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    ).where(F.col("turn_idx") % 2 == 0)
    merge_append(t, patch, batch_id="b1")
    got = _load(spark, t)
    assert _rows(got) == _rows(t.scan())
    one = got.where("turn_idx % 2 = 0").select("role", "text").first()
    assert one.role == "user" and one.text.startswith("patched-")


def test_schema_evolution_and_rename(registered, tmpdir_path):
    spark = registered
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "ev"), transcript_schema(), n_buckets=2
    )
    merge_append(t, _batch(spark, 0, 80, "b0"), batch_id="b0")
    evolved = _batch(spark, 80, 80, "b1").withColumn(
        "score", (F.col("lsn") % 10).cast("double")
    )
    merge_append(t, evolved, batch_id="b1")
    t.rename_column("tool", "tool_name")
    got = _load(spark, t)
    assert got.schema == t.scan().schema
    assert "tool_name" in got.columns and "score" in got.columns
    assert _rows(got) == _rows(t.scan())


def test_cdc_batch_read(registered, staged):
    t, versions = staged
    got = (
        registered.read.format("lake_cdc")
        .option("path", t.path)
        .option("fromVersion", str(versions[2]))
        .load()
    )
    want = t.scan_changes(versions[2])
    assert got.schema == want.schema
    assert _rows(got) == _rows(want)
    # bounded window incl. only the delete commit
    got_d = (
        registered.read.format("lake_cdc")
        .option("path", t.path)
        .option("fromVersion", str(versions[3]))
        .option("toVersion", str(versions[4]))
        .load()
    )
    want_d = t.scan_changes(versions[3], versions[4])
    assert _rows(got_d) == _rows(want_d)
    assert got_d.where("change_type = 'delete'").count() > 0


def test_cdc_stream_and_checkpoint_resume(registered, staged, tmpdir_path):
    spark = registered
    t, versions = staged
    ckpt = os.path.join(tmpdir_path, "ckpt")
    out = os.path.join(tmpdir_path, "out")

    def run_once():
        q = (
            spark.readStream.format("lake_cdc")
            .option("path", t.path)
            .option("startingVersion", str(versions[2]))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    got1 = spark.read.schema(t.scan_changes(versions[2]).schema).parquet(out)
    want1 = t.scan_changes(versions[2])
    assert _rows(got1) == _rows(want1)

    # new commit, SAME checkpoint: resume emits exactly the new diff
    head = t.version
    merge_append(t, _batch(spark, 500, 60, "b3"), batch_id="b3")
    run_once()
    got2 = spark.read.schema(want1.schema).parquet(out)
    extra = t.scan_changes(head)
    assert len(_rows(got2)) == len(_rows(got1)) + len(_rows(extra))
    assert _rows(got2) == sorted(_rows(got1) + _rows(extra))


def test_sql_temp_view_using_lake(registered, staged):
    """The DS makes lake tables reachable from PURE SQL — no Python
    classes at the call site (CREATE TEMPORARY VIEW ... USING lake)."""
    t, _ = staged
    registered.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW lake_sql_v "
        f"USING lake OPTIONS (path '{t.path}')"
    )
    got = registered.sql(
        "SELECT conv_id, count(*) AS n FROM lake_sql_v "
        "GROUP BY conv_id ORDER BY conv_id"
    )
    want = (
        t.scan().groupBy("conv_id").count()
        .withColumnRenamed("count", "n").orderBy("conv_id")
    )
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]


def test_cdc_stream_starting_timestamp(registered, staged, tmpdir_path):
    """startingTimestamp resolves the start offset through the snapshot
    log (branch-ancestry version_at): begin at versions[2]'s commit time."""
    spark = registered
    t, versions = staged
    at = t.snapshot(versions[2])["committed_at"]
    out2 = os.path.join(tmpdir_path, "ts_out")
    ckpt2 = os.path.join(tmpdir_path, "ts_ckpt")
    q2 = (
        spark.readStream.format("lake_cdc")
        .option("path", t.path)
        .option("startingTimestamp", str(at))
        .load()
        .writeStream.format("parquet")
        .option("path", out2)
        .option("checkpointLocation", ckpt2)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(180)
    want2 = t.scan_changes(versions[2])
    got2 = spark.read.schema(want2.schema).parquet(out2)
    assert _rows(got2) == _rows(want2)


def test_cdc_resume_past_retention_fails_loudly(registered, staged):
    """A lake_cdc read from an EXPIRED snapshot must refuse with the
    remedy named — never silently diff from a different base."""
    t, versions = staged
    t.expire_snapshots(keep_last=1)
    with pytest.raises(Exception) as ei:
        (
            registered.read.format("lake_cdc")
            .option("path", t.path)
            .option("fromVersion", str(versions[1]))
            .load()
            .collect()
        )
    assert "not retained" in str(ei.value)


def test_cdc_diff_on_partial_update_table(registered, tmpdir_path):
    """lake_cdc over a merge_engine='partial-update' table: the diff's
    bucket-local PU fold must match scan_changes exactly (patches that
    change one field surface as updates carrying the MERGED row)."""
    spark = registered
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "pucdc"), transcript_schema(),
        n_buckets=4, merge_engine="partial-update",
    )
    full = _batch(spark, 0, 120, "base")
    merge_append(t, full, batch_id="b0")
    v1 = t.version
    patch = full.select(
        (F.col("lsn") + 1000).alias("lsn"), "conv_id", "turn_idx",
        F.lit(None).cast("string").alias("role"),
        F.concat(F.lit("p-"), "text").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    ).where(F.col("turn_idx") % 3 == 0)
    merge_append(t, patch, batch_id="b1")
    got = (
        registered.read.format("lake_cdc")
        .option("path", t.path)
        .option("fromVersion", str(v1))
        .load()
    )
    want = t.scan_changes(v1)
    assert _rows(got) == _rows(want)
    one = got.where("change_type = 'update'").select("role", "text").first()
    assert one.role == "user" and one.text.startswith("p-")


def test_branch_read_through_ds(registered, staged):
    """The branch option reads a branch's head, isolated from main."""
    t, _ = staged
    b = t.create_branch("audit")
    merge_append(b, _batch(registered, 900, 40, "bb"), batch_id="bb")
    got_b = _load(registered, t, branch="audit")
    got_m = _load(registered, t)
    assert _rows(got_b) == _rows(b.scan())
    assert _rows(got_m) == _rows(t.scan())
    assert len(_rows(got_b)) > len(_rows(got_m))


def test_cdc_diff_across_rename(registered, tmpdir_path):
    """A rename committed BETWEEN the two diffed snapshots: the old
    side's files still store the pre-rename column name, and the diff
    must forward-map them through the NEW snapshot's rename list (the
    scan_changes rule) — otherwise every unchanged row would surface as
    a spurious update (old null vs new value)."""
    spark = registered
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "ren"), transcript_schema(), n_buckets=2
    )
    merge_append(t, _batch(spark, 0, 100, "b0"), batch_id="b0")
    v1 = t.version
    t.rename_column("tool", "tool_name")
    merge_append(t, _batch(spark, 300, 30, "b1"), batch_id="b1")
    got = (
        registered.read.format("lake_cdc")
        .option("path", t.path)
        .option("fromVersion", str(v1))
        .load()
    )
    want = t.scan_changes(v1)
    assert got.schema == want.schema
    assert _rows(got) == _rows(want)
    # the rename alone must not produce updates for untouched keys: the
    # only changes are batch b1's 30 events' keys

    n_expected = want.count()
    assert got.count() == n_expected
    assert n_expected <= 30
