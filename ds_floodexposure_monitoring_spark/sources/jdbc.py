"""JDBC-shaped partitioned SQL source (embedded-database edition).

The reference ingests from and upserts into an operational SQL database
(reference: src/utils/database.py:83 ``pd.read_sql`` and :111
``postgres_upsert``). This sandbox has no network, so the adapter
speaks to an embedded SQL database FILE (DuckDB) — but through the same
architecture Spark's own JDBC source uses, so swapping the connection
factory for a real driver changes nothing structural:

- the DRIVER plans K non-overlapping split predicates on a numeric
  partition column (``partitionColumn`` / ``lowerBound`` /
  ``upperBound`` / ``numPartitions``, Spark JDBC option semantics:
  stride splits, first/last split unbounded below/above so no rows
  outside the sampled bounds are lost);
- each EXECUTOR task opens its own read-only connection and fetches
  exactly one split as Arrow record batches (``mapInArrow`` — never a
  driver-side materialization, never per-row Python);
- predicates the caller supplies are pushed into each split's WHERE
  clause, i.e. evaluated inside the database like Spark's
  ``pushDownPredicate``.

At 100 TB the facts live in the lake, not behind JDBC — this adapter
exists for the reference's residual lifecycle (dimension pulls,
operational-store backfills), where the table is DB-sized and K splits
of it saturate the DB long before they trouble the cluster.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession


def _utc_schema(schema: pa.Schema) -> pa.Schema:
    """Embedded DBs hand back naive timestamps (stored UTC); Spark's
    Arrow bridge wants tz-aware — cast naive ts fields to UTC so the
    result carries plain TimestampType like every other source here."""
    fields = []
    for f in schema:
        if pa.types.is_timestamp(f.type) and f.type.tz is None:
            f = f.with_type(pa.timestamp(f.type.unit, tz="UTC"))
        fields.append(f)
    return pa.schema(fields)


def read_sql(
    spark: SparkSession,
    db_path: str,
    table: str,
    partition_column: str,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    predicate: str | None = None,
    columns: tuple[str, ...] | None = None,
) -> DataFrame:
    """Partitioned read of ``table`` from the DuckDB file at ``db_path``.

    Mirrors ``spark.read.format("jdbc")`` planning: bounds default to
    MIN/MAX of ``partition_column`` (one tiny driver query), the range
    splits into ``num_partitions`` strides, and the first/last splits
    drop their outer bound so late-arriving rows outside the sampled
    range still load. ``predicate`` (SQL text) and ``columns`` push
    down into every split's query.
    """
    import duckdb

    proj = ", ".join(columns) if columns else "*"
    where_extra = f" AND ({predicate})" if predicate else ""

    con = duckdb.connect(db_path, read_only=True)
    try:
        peek = con.sql(f"SELECT {proj} FROM {table} LIMIT 0").arrow()
        if lower_bound is None or upper_bound is None:
            lo, hi = con.sql(
                f"SELECT min({partition_column}), max({partition_column}) FROM {table}"
            ).fetchone()
            lower_bound = lo if lower_bound is None else lower_bound
            upper_bound = hi if upper_bound is None else upper_bound
    finally:
        con.close()

    arrow_schema = _utc_schema(peek.schema)
    from pyspark.sql.pandas.types import from_arrow_schema

    out_schema = from_arrow_schema(arrow_schema)

    if lower_bound is None:  # empty table
        splits = []
    else:
        lo_b, hi_b = int(lower_bound), int(upper_bound)
        k = max(1, min(num_partitions, hi_b - lo_b + 1))
        stride = max(1, (hi_b - lo_b) // k or 1)
        splits = []
        for i in range(k):
            s_lo = lo_b + i * stride
            s_hi = lo_b + (i + 1) * stride
            conds = []
            if i > 0:
                conds.append(f"{partition_column} >= {s_lo}")
            if i < k - 1:
                conds.append(f"{partition_column} < {s_hi}")
            where = " AND ".join(conds) or "TRUE"
            splits.append(
                (i, f"SELECT {proj} FROM {table} WHERE ({where}){where_extra}")
            )

    if not splits:
        return spark.createDataFrame([], out_schema)

    split_df = spark.createDataFrame(splits, "split_id int, split_sql string").repartition(
        len(splits), "split_id"
    )

    def fetch(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import duckdb as _dd
        import pyarrow as _pa

        for b in batches:
            for sql in b.column(b.schema.get_field_index("split_sql")).to_pylist():
                c = _dd.connect(db_path, read_only=True)
                try:
                    reader = c.sql(sql).fetch_arrow_reader(batch_size=1 << 16)
                    for rb in reader:
                        tbl = _pa.Table.from_batches([rb]).cast(arrow_schema)
                        yield from tbl.to_batches()
                finally:
                    c.close()

    return split_df.mapInArrow(fetch, out_schema)


def write_table(
    df: DataFrame, db_path: str, table: str, mode: str = "overwrite"
) -> int:
    """Export a BOUNDED DataFrame (a dim table, a rollup result) into
    the embedded DB — the reference's ``to_sql(..., chunksize=10000)``
    analog (src/utils/database.py:111). Embedded DBs are single-writer,
    so this is driver-side by design; it GUARDS against misuse as a
    fact-table sink (the lake + MERGE is that path) by refusing
    unbounded inputs above a sanity cap.
    """
    import duckdb

    rows = df.limit(2_000_001).count()
    if rows > 2_000_000:
        raise ValueError(
            "write_table is the bounded dim-export path (single-writer "
            "embedded DB); route fact-scale data through LakeTable + merge_into"
        )
    tbl = df.toArrow()
    con = duckdb.connect(db_path)
    try:
        con.register("_export", tbl)
        if mode == "overwrite":
            con.execute(f"CREATE OR REPLACE TABLE {table} AS SELECT * FROM _export")
        elif mode == "append":
            con.execute(f"INSERT INTO {table} SELECT * FROM _export")
        else:
            raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    finally:
        con.close()
    return rows


__all__ = ["read_sql", "write_table"]
