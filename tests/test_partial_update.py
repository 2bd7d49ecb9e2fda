"""partial_update_state: field-granular merge (Paimon partial-update
merge-engine analog) — each column keeps its last non-null value by
LSN, independent of the other columns."""

from pyspark.sql import functions as F

from ds_floodexposure_monitoring_spark.operators.dedup import (
    dedup_last_writer,
    partial_update_state,
)

DDL = "k string, lsn long, a string, b string"


def test_fields_merge_across_events(spark):
    rows = [
        ("x", 1, "a1", "b1"),
        ("x", 2, None, "b2"),   # patches b only
        ("x", 3, "a3", None),   # patches a only
        ("y", 1, None, None),   # key exists, no fields yet
    ]
    out = {
        r["k"]: (r["a"], r["b"], r["lsn"])
        for r in partial_update_state(
            spark.createDataFrame(rows, DDL), keys=("k",), order_col="lsn"
        ).collect()
    }
    assert out["x"] == ("a3", "b2", 3)   # union of latest per field
    assert out["y"] == (None, None, 1)   # never-written fields stay null


def test_differs_from_row_lww(spark):
    rows = [("x", 1, "a1", "b1"), ("x", 2, None, "b2")]
    df = spark.createDataFrame(rows, DDL)
    lww = dedup_last_writer(df, keys=("k",), order_cols=("lsn",)).collect()[0]
    pus = partial_update_state(df, keys=("k",), order_col="lsn").collect()[0]
    assert lww["a"] is None      # newest event erases the field it omits
    assert pus["a"] == "a1"      # partial update keeps it


def test_out_of_order_patches(spark):
    # late-arriving older patch must not displace a newer field value
    rows = [("x", 3, "a3", None), ("x", 1, "a1", "b1"), ("x", 2, "a2", "b2")]
    r = partial_update_state(
        spark.createDataFrame(rows, DDL), keys=("k",), order_col="lsn"
    ).collect()[0]
    assert (r["a"], r["b"], r["lsn"]) == ("a3", "b2", 3)


def test_patch_cols_subset(spark):
    rows = [("x", 1, "a1", "b1"), ("x", 2, "a2", "b2")]
    out = partial_update_state(
        spark.createDataFrame(rows, DDL), keys=("k",), order_col="lsn",
        patch_cols=("a",),
    )
    assert set(out.columns) == {"k", "a", "lsn"}


def test_single_agg_plan_no_window(spark):
    rows = [("x", 1, "a1", "b1")]
    df = partial_update_state(
        spark.createDataFrame(rows, DDL), keys=("k",), order_col="lsn"
    )
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "Window" not in plan  # never a window over the corpus
    # formatted explain lists each node twice (tree + detail): count
    # tree entries only ("Name (id)")
    assert plan.count("Aggregate (") >= 2  # partial (map-side) + final
    assert plan.count("Exchange (") == 1  # one shuffle on the key
