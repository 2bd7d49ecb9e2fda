"""CDCPipeline over JSON-envelope changelogs (sources/envelope.py
EnvelopeChangelogReader): a Debezium/Maxwell tail must produce the
byte-identical final state the native parquet tail produces — same
batch plans, same exactly-once semantics — and corrupt envelopes must
dead-letter (or fail loudly), never merge or vanish."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from ds_floodexposure_monitoring_spark.datagen.transcripts import (
    ChangeLogSpec,
    generate_changelog,
    transcript_schema,
    write_envelope_changelog,
)
from ds_floodexposure_monitoring_spark.sources.lake import LakeTable
from ds_floodexposure_monitoring_spark.streaming.quarantine import Quarantine
from ds_floodexposure_monitoring_spark.streaming.runner import CDCPipeline

SPEC = ChangeLogSpec(
    n_events=6_000,
    n_convs=150,
    n_shards=2,
    dup_rate=0.08,
    delete_rate=0.05,
    ooo_window=300,
    schema_change_at=4_000,
    events_per_file=1_000,
    seed=23,
)
# widest payload: post-schema-change shape (model present, turn_idx wide)
WIDE = transcript_schema(with_model=True, wide_turn_idx=True)


def _state(table):
    return sorted(
        (r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts, r.model)
        for r in table.scan().collect()
    )


def _run(spark, changelog_dir, root, name, **pipe_kw):
    t = LakeTable.create(
        spark, os.path.join(root, name), transcript_schema(), n_buckets=4
    )
    p = CDCPipeline(
        spark,
        changelog_dir,
        t,
        os.path.join(root, name + "_ck"),
        max_events_per_batch=2_500,
        mode="mor",
        compact_every=2,
        **pipe_kw,
    )
    p.run_until_caught_up()
    return t, p


@pytest.fixture(scope="module")
def logs(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("envpipe"))
    pdir = os.path.join(root, "parquet")
    generate_changelog(spark, SPEC, pdir)
    ddir, mdir = os.path.join(root, "dbz"), os.path.join(root, "mxw")
    n1 = write_envelope_changelog(pdir, ddir, "debezium")
    n2 = write_envelope_changelog(pdir, mdir, "maxwell")
    assert n1 == n2 == len(glob.glob(os.path.join(pdir, "shard=*", "*.parquet")))
    native, _ = _run(spark, pdir, root, "native")
    return root, pdir, ddir, mdir, _state(native)


def test_debezium_pipeline_matches_native(spark, logs):
    root, _, ddir, _, want = logs
    t, p = _run(
        spark, ddir, root, "dbz_t",
        changelog_format="debezium", payload_schema=WIDE,
        quarantine_dir=os.path.join(root, "dbz_q"),
    )
    assert _state(t) == want
    # offsets/filenames line up -> resumed reader sees nothing new
    assert p.run_once() is None
    # nothing was quarantined on a clean tail
    assert not os.path.exists(os.path.join(root, "dbz_q")) or not glob.glob(
        os.path.join(root, "dbz_q", "batch=*")
    )


def test_maxwell_pipeline_matches_native(spark, logs):
    root, _, _, mdir, want = logs
    t, _ = _run(
        spark, mdir, root, "mxw_t",
        changelog_format="maxwell", payload_schema=WIDE,
    )
    assert _state(t) == want


def test_corrupt_envelopes_quarantine_with_reason(spark, logs):
    root, _, ddir, _, want = logs
    # poison one file: append garbage + an op-less (but valid-JSON) line
    bad_dir = os.path.join(root, "dbz_bad")
    import shutil

    shutil.copytree(ddir, bad_dir)
    victim = sorted(glob.glob(os.path.join(bad_dir, "shard=*", "*.jsonl")))[0]
    with open(victim, "a") as fh:
        fh.write("{this is not json\n")
        fh.write('{"noise": true}\n')
    qdir = os.path.join(root, "bad_q")
    t, _ = _run(
        spark, bad_dir, root, "bad_t",
        changelog_format="debezium", payload_schema=WIDE,
        quarantine_dir=qdir,
    )
    # valid remainder merged to the exact same state
    assert _state(t) == want
    q = Quarantine(spark, qdir).scan()
    reasons = [r[Quarantine.REASON_COL] for r in q.collect()]
    assert len(reasons) == 2
    assert all("corrupt envelope" in r for r in reasons)


def test_corrupt_without_quarantine_fails_loudly(spark, logs, tmpdir_path):
    root, _, ddir, _, _ = logs
    bad_dir = os.path.join(tmpdir_path, "dbz_bad2")
    import shutil

    shutil.copytree(ddir, bad_dir)
    victim = sorted(glob.glob(os.path.join(bad_dir, "shard=*", "*.jsonl")))[0]
    with open(victim, "a") as fh:
        fh.write("garbage{{{\n")
    with pytest.raises(ValueError, match="corrupt envelopes"):
        _run(spark, bad_dir, tmpdir_path, "bad_t2",
             changelog_format="debezium", payload_schema=WIDE)


def test_unknown_format_rejected(spark, logs, tmpdir_path):
    root, pdir, _, _, _ = logs
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "x"), transcript_schema(), n_buckets=2
    )
    with pytest.raises(ValueError, match="changelog_format"):
        CDCPipeline(spark, pdir, t, os.path.join(tmpdir_path, "ck"),
                    changelog_format="avro")


def test_envelope_batch_plans_match_parquet_plans(spark, logs):
    """Filename/offset parity: the envelope reader plans the SAME batch
    ids as the parquet reader — replay detection and checkpoints are
    format-portable."""
    from ds_floodexposure_monitoring_spark.sources.changelog import ChangelogReader
    from ds_floodexposure_monitoring_spark.sources.envelope import (
        EnvelopeChangelogReader,
    )

    _, pdir, ddir, _, _ = logs
    a = ChangelogReader(spark, pdir, 2_500)
    b = EnvelopeChangelogReader(
        spark, ddir, 2_500, dialect="debezium", payload_schema=WIDE
    )
    off_a, off_b, seq = {}, {}, 0
    while True:
        seq += 1
        ba, bb = a.plan_batch(off_a, seq), b.plan_batch(off_b, seq)
        if ba is None or bb is None:
            assert ba is None and bb is None
            break
        assert ba.batch_id == bb.batch_id
        assert ba.n_events == bb.n_events
        off_a, off_b = ba.offsets_after, bb.offsets_after
