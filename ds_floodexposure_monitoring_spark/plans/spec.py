from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """One driver-contract query: a Spark plan + its ANSI-SQL oracle.

    ``oracle_sql`` is None for genuinely non-SQL-expressible operators
    (the driver then records a weaker rows-only check).
    """

    fn: Callable[[SparkSession, str], DataFrame]
    oracle_sql: str | None
    note: str = ""


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
