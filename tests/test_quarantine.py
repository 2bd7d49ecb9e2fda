"""Dead-letter quarantine: malformed change events are diverted with a
reason, the valid remainder merges, metrics count them, and crash-retry
or replay never duplicates the dead letters."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from ds_floodexposure_monitoring_spark.datagen import ChangeLogSpec, generate_changelog
from ds_floodexposure_monitoring_spark.datagen.transcripts import transcript_schema
from ds_floodexposure_monitoring_spark.sources.lake import LakeTable
from ds_floodexposure_monitoring_spark.streaming.quarantine import (
    Quarantine,
    invalid_reason,
)
from ds_floodexposure_monitoring_spark.streaming.runner import CDCPipeline


def _inject_bad_shard(log_dir: str) -> None:
    """Append a shard whose file holds 2 malformed + 1 valid event."""
    d = os.path.join(log_dir, "shard=9")
    os.makedirs(d, exist_ok=True)
    tbl = pa.table(
        {
            "lsn": pa.array([10_000_001, None, 10_000_003], pa.int64()),
            "shard": pa.array([9, 9, 9], pa.int32()),
            "op": pa.array(["U", "U", "U"]),
            "conv_id": pa.array([None, "c-ok", "c-ok"]),
            "turn_idx": pa.array([0, 0, 99], pa.int32()),
            "role": pa.array(["user"] * 3),
            "text": pa.array(["bad-key", "bad-lsn", "good-row"]),
            "tool": pa.array([None, None, None], pa.string()),
            "ts": pa.array([1_700_000_000_000_000] * 3, pa.timestamp("us", tz="UTC")),
        }
    )
    pq.write_table(tbl, os.path.join(d, "events-000000000001-000000000003.parquet"))


@pytest.fixture()
def pipeline_env(spark, tmpdir_path):
    log = os.path.join(tmpdir_path, "log")
    generate_changelog(
        spark,
        ChangeLogSpec(
            n_events=3_000, n_convs=60, n_shards=2, dup_rate=0.05,
            delete_rate=0.02, ooo_window=100, schema_change_at=None,
            events_per_file=1_000, seed=7,
        ),
        log,
    )
    _inject_bad_shard(log)
    table = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), transcript_schema(), n_buckets=8
    )
    return log, table, tmpdir_path


def test_invalid_reason_rules(spark):
    df = spark.createDataFrame(
        [(1, "c1", 0), (2, None, 0), (None, "c3", 0), (4, "c4", None)],
        "lsn long, conv_id string, turn_idx int",
    )
    got = df.select("lsn", invalid_reason(["conv_id", "turn_idx"]).alias("r")).collect()
    by_lsn = {r["lsn"]: r["r"] for r in got}
    assert by_lsn[1] is None
    assert by_lsn[2] == "null merge key: conv_id"
    assert by_lsn[None] == "null lsn column: lsn"
    assert by_lsn[4] == "null merge key: turn_idx"


def test_pipeline_quarantines_and_merges_valid_rows(spark, pipeline_env):
    log, table, root = pipeline_env
    qdir = os.path.join(root, "dead")
    pipe = CDCPipeline(
        spark, log, table, os.path.join(root, "ckpt"),
        metrics_dir=os.path.join(root, "metrics"),
        max_events_per_batch=2_000, mode="mor", quarantine_dir=qdir,
    )
    results = pipe.run_until_caught_up()
    assert results
    # the valid row from the poisoned shard landed in the table
    good = table.scan().where(F.col("conv_id") == "c-ok").collect()
    assert len(good) == 1 and good[0]["text"] == "good-row"
    # both malformed rows are in quarantine with machine-readable reasons
    q = Quarantine(spark, qdir).scan()
    rows = {r["text"]: r[Quarantine.REASON_COL] for r in q.collect()}
    assert rows == {
        "bad-key": "null merge key: conv_id",
        "bad-lsn": "null lsn column: lsn",
    }
    # metrics recorded the count on exactly one batch
    m = pipe.metrics.read()
    assert [r["quarantined"] for r in m.orderBy("batch_seq").collect()].count(2) == 1
    assert m.agg(F.sum("quarantined")).collect()[0][0] == 2
    # no malformed row ever reached the table
    assert table.scan().where(F.col("conv_id").isNull()).count() == 0


def test_replay_does_not_duplicate_dead_letters(spark, pipeline_env):
    log, table, root = pipeline_env
    qdir = os.path.join(root, "dead")
    pipe = CDCPipeline(
        spark, log, table, os.path.join(root, "ckpt"),
        max_events_per_batch=2_000, mode="mor", quarantine_dir=qdir,
    )
    pipe.run_until_caught_up()
    n_q = Quarantine(spark, qdir).scan().count()
    n_rows = table.scan().count()
    # fresh checkpoint, same table: every batch replays and is skipped
    pipe2 = CDCPipeline(
        spark, log, table, os.path.join(root, "ckpt2"),
        max_events_per_batch=2_000, mode="mor", quarantine_dir=qdir,
    )
    rs = pipe2.run_until_caught_up()
    assert rs and all(r.replayed for r in rs)
    assert Quarantine(spark, qdir).scan().count() == n_q
    assert table.scan().count() == n_rows


def test_custom_contract_predicate(spark, pipeline_env):
    log, table, root = pipeline_env
    qdir = os.path.join(root, "dead")
    pipe = CDCPipeline(
        spark, log, table, os.path.join(root, "ckpt"),
        max_events_per_batch=10_000, mode="mor", quarantine_dir=qdir,
        invalid_when=F.col("turn_idx") > 90,
    )
    pipe.run_until_caught_up()
    q = Quarantine(spark, qdir).scan()
    # the injected good-row has turn_idx=99 -> caught by the contract
    assert q.where(
        (F.col("text") == "good-row")
        & (F.col(Quarantine.REASON_COL) == "failed contract predicate")
    ).count() == 1
    assert table.scan().where(F.col("turn_idx") > 90).count() == 0


def test_quarantine_off_by_default_ingests_everything(spark, pipeline_env):
    log, table, root = pipeline_env
    pipe = CDCPipeline(
        spark, log, table, os.path.join(root, "ckpt"),
        max_events_per_batch=10_000, mode="mor",
    )
    pipe.run_until_caught_up()
    # no quarantine dirs appeared anywhere under the run root
    assert not glob.glob(os.path.join(root, "**", "batch=*"), recursive=True)
