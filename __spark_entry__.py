"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (SURVEY.md §7.4) at sf0.001;
``queries()``/``oracle_sql()`` expose the full operator registry
(ds_floodexposure_monitoring_spark.plans) — one entry per implemented
operator family from SURVEY.md §2, each with an exact DuckDB oracle
where ANSI-expressible (rows-only otherwise).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from ds_floodexposure_monitoring_spark.plans import REGISTRY  # noqa: E402
from ds_floodexposure_monitoring_spark.plans.flagship import (  # noqa: E402
    FLAGSHIP_SQL,
    flagship,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "flagship_daily_health": flagship
    }
    for name, spec in REGISTRY.items():
        out[name] = spec.fn
    return out


def oracle_sql() -> dict[str, str]:
    out = {"flagship_daily_health": FLAGSHIP_SQL}
    for name, spec in REGISTRY.items():
        if spec.oracle_sql is not None:
            out[name] = spec.oracle_sql
    return out
