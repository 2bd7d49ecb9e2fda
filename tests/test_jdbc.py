"""JDBC-shaped partitioned source adapter (sources/jdbc.py): split
planning mirrors Spark's JDBC options, each split fetched executor-side
over its own read-only embedded-DB connection as Arrow batches."""

import datetime as dt
import os

import duckdb
import pytest

from ds_floodexposure_monitoring_spark.sources.jdbc import read_sql, write_table


@pytest.fixture()
def db(tmpdir_path):
    path = os.path.join(tmpdir_path, "op.duckdb")
    con = duckdb.connect(path)
    con.execute(
        """
        CREATE TABLE ev AS
        SELECT i AS id, i % 7 AS grp, CAST(i * 1.5 AS DOUBLE) AS v,
               TIMESTAMP '2024-01-01' + INTERVAL (i % 90) DAY AS ts,
               'r' || CAST(i AS VARCHAR) AS label
        FROM range(1000) t(i)
        """
    )
    con.close()
    return path


def test_partitioned_read_is_complete_and_exact(spark, db):
    df = read_sql(spark, db, "ev", partition_column="id", num_partitions=4)
    assert df.count() == 1000
    got = {r["id"]: (r["grp"], r["v"], r["label"]) for r in df.collect()}
    assert got[999] == (999 % 7, 999 * 1.5, "r999")
    # timestamps arrive as UTC instants matching the stored values
    row = df.where("id = 45").collect()[0]
    assert row["ts"] == dt.datetime(2024, 1, 1) + dt.timedelta(days=45)
    # every split ran (the physical plan fans out over the split frame)
    assert df.rdd.getNumPartitions() == 4


def test_bounds_do_not_lose_out_of_range_rows(spark, db):
    # Spark JDBC semantics: first/last splits are unbounded, so rows
    # outside sampled/proposed bounds still load
    df = read_sql(
        spark, db, "ev", partition_column="id",
        lower_bound=300, upper_bound=600, num_partitions=3,
    )
    assert df.count() == 1000


def test_predicate_and_projection_push_down(spark, db):
    df = read_sql(
        spark, db, "ev", partition_column="id", num_partitions=4,
        predicate="grp = 3", columns=("id", "grp"),
    )
    rows = df.collect()
    assert len(rows) == len([i for i in range(1000) if i % 7 == 3])
    assert df.columns == ["id", "grp"]
    assert all(r["grp"] == 3 for r in rows)


def test_empty_table_yields_empty_frame_with_schema(spark, tmpdir_path):
    path = os.path.join(tmpdir_path, "empty.duckdb")
    con = duckdb.connect(path)
    con.execute("CREATE TABLE ev (id BIGINT, v DOUBLE)")
    con.close()
    df = read_sql(spark, path, "ev", partition_column="id")
    assert df.count() == 0
    assert set(df.columns) == {"id", "v"}


def test_write_table_round_trip(spark, db):
    out = read_sql(spark, db, "ev", partition_column="id", num_partitions=2)
    agg = out.groupBy("grp").count()
    n = write_table(agg, db, "grp_counts")
    assert n == 7
    con = duckdb.connect(db, read_only=True)
    try:
        assert con.sql("SELECT SUM(count) FROM grp_counts").fetchone()[0] == 1000
    finally:
        con.close()
    # append mode stacks
    write_table(agg, db, "grp_counts", mode="append")
    con = duckdb.connect(db, read_only=True)
    try:
        assert con.sql("SELECT COUNT(*) FROM grp_counts").fetchone()[0] == 14
    finally:
        con.close()


def test_jdbc_scan_contract_matches_oracle(spark):
    from ds_floodexposure_monitoring_spark.plans import REGISTRY

    sf = "/root/testdata/sf0.001"
    spec = REGISTRY["jdbc_scan"]
    got = sorted(tuple(r) for r in spec.fn(spark, sf).collect())
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'"
        )
        want = sorted(tuple(r) for r in con.sql(spec.oracle_sql).fetchall())
    finally:
        con.close()
    assert got == want and len(got) > 0
