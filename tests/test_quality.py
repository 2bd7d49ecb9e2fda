"""Write-audit-publish quality gate (operators/quality.py): one-pass
expectation audit, publish refusal with a full report, repair-on-branch
then publish, main never exposing unaudited rows."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ds_floodexposure_monitoring_spark.operators import quality as Q
from ds_floodexposure_monitoring_spark.operators.compact import merge_append
from ds_floodexposure_monitoring_spark.operators.dml import delete_where
from ds_floodexposure_monitoring_spark.sources.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("score", T.IntegerType(), True),
        T.StructField("tag", T.StringType(), True),
    ]
)

def _expectations():
    # built lazily: Column exprs need an active SparkContext
    return [
        Q.not_null("tag"),
        Q.in_range("score", 0, 100),
        Q.matches("tag", r"^[a-z]+$"),
        Q.satisfies(
            "score_even_when_tag_x",
            (F.col("tag") != "x") | (F.col("score") % 2 == 0),
        ),
    ]


def _mk(spark, tmpdir_path):
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), SCHEMA,
        merge_keys=("k",), n_buckets=2,
    )
    return t


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k long, score int, tag string, lsn long")


def test_audit_counts_every_violation_kind(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path)
    merge_append(t, _batch(spark, [
        (1, 50, "ok", 1),
        (2, None, "alsook", 2),      # null score: in_range skips (not required)
        (3, 150, "high", 3),         # out of range
        (4, 60, None, 4),            # null tag
        (5, 70, "UPPER", 5),         # regex violation
        (6, 7, "x", 6),              # custom contract violation (odd under x)
    ]), batch_id="b1")
    report = Q.audit(t, _expectations())
    assert report == {
        "not_null(tag)": 1,
        "in_range(score,0,100)": 1,
        "matches(tag)": 1,
        "score_even_when_tag_x": 1,
        Q.UNIQUE_KEY: 0,
    }
    # required=True makes the null score count too
    strict = Q.audit(t, [Q.in_range("score", 0, 100, required=True)],
                     unique_key=False)
    assert strict == {"in_range(score,0,100)": 2}


def test_publish_checked_refuses_then_repairs(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path)
    merge_append(t, _batch(spark, [(1, 10, "seed", 1)]), batch_id="b0")
    v_main = t.version
    b = t.create_branch("audit")
    merge_append(b, _batch(spark, [
        (2, 20, "good", 2),
        (3, 999, "bad", 3),    # violates in_range
    ]), batch_id="b1")
    with pytest.raises(Q.AuditError, match="in_range"):
        Q.publish_checked(t, "audit", _expectations())
    # main untouched by the refused publish
    assert t.version == v_main
    assert sorted(r.k for r in t.scan().collect()) == [1]
    # repair ON THE BRANCH, then publish succeeds
    delete_where(b, "score > 100")
    out = Q.publish_checked(t, "audit", _expectations())
    assert all(v == 0 for v in out["audit"].values())
    assert sorted(r.k for r in t.scan().collect()) == [1, 2]


def test_audit_is_one_job_per_call(spark, tmpdir_path):
    """All row-level expectations fold into a single agg pass."""
    t = _mk(spark, tmpdir_path)
    merge_append(t, _batch(spark, [(i, i, "t", i) for i in range(1, 50)]),
                 batch_id="b1")
    df = t.scan()

    def plan_for(es):
        aggs = [
            F.sum(F.when(e.violation, 1).otherwise(0)).alias(e.name)
            for e in es
        ]
        return df.agg(*aggs)._jdf.queryExecution().executedPlan().toString()

    one = plan_for(_expectations()[:1])
    four = plan_for(_expectations())
    # every expectation folds into the same single aggregate pass:
    # 4 expectations cost exactly the exchanges/aggregates/scans of 1
    for marker in ("Exchange", "HashAggregate", "Scan"):
        assert four.count(marker) == one.count(marker), marker
