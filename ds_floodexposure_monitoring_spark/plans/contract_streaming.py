"""Streaming contract queries: event-time windowed aggregation with
watermark, driven synchronously over the bounded file source."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming.stream import run_windowed_counts_sync
from .spec import QuerySpec

REGISTRY: dict[str, QuerySpec] = {}

REGISTRY["streaming_windowed_counts"] = QuerySpec(
    fn=lambda spark, sf: _run(spark, sf),
    oracle_sql="""
    SELECT time_bucket(INTERVAL '1 day', ts) AS win_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM events GROUP BY 1, 2
    """,
    note="Structured Streaming tumbling event-time window + watermark (memory sink, availableNow-style); oracle is the equivalent batch GROUP BY",
)


def _run(spark: SparkSession, sf: str) -> DataFrame:
    return run_windowed_counts_sync(spark, f"{sf}/events.parquet")
