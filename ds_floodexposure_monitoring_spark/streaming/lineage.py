"""Per-batch lineage + throughput/lag metrics table.

Append-only parquet dataset: one file per batch (single-writer append
without any table-format coordination), schema per SURVEY.md §7.1.10.
Lineage = (source offset range → snapshot id), the auditable link the
north_star requires; metrics give events/sec per batch for the bench.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("batch_seq", T.LongType(), False),
        T.StructField("batch_id", T.StringType(), False),
        T.StructField("offsets_before", T.StringType(), True),  # JSON {shard: seq}
        T.StructField("offsets_after", T.StringType(), True),
        T.StructField("snapshot_version", T.LongType(), True),
        T.StructField("events", T.LongType(), True),
        # malformed rows diverted to the dead-letter quarantine this
        # batch (streaming/quarantine.py) — alert on a spike
        T.StructField("quarantined", T.LongType(), True),
        T.StructField("dedup_dropped", T.LongType(), True),
        T.StructField("merge_updated", T.LongType(), True),
        T.StructField("merge_inserted", T.LongType(), True),
        T.StructField("carried_rows", T.LongType(), True),
        T.StructField("files_removed", T.LongType(), True),
        T.StructField("files_added", T.LongType(), True),
        T.StructField("wall_ms", T.DoubleType(), True),
        T.StructField("events_per_sec", T.DoubleType(), True),
        # events discovered in the source but deferred past this batch,
        # measured at plan time from file metadata — how far behind the
        # changelog head the pipeline is running
        T.StructField("source_lag_events", T.LongType(), True),
        T.StructField("replayed", T.BooleanType(), True),
    ]
)


class MetricsLog:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path)
        os.makedirs(self.path, exist_ok=True)

    def append(self, row: dict) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        # Tiny single-row append: write driver-side via Arrow (a Spark
        # job for one row would be pure overhead), file-per-batch so
        # appends never contend.
        full = {f.name: row.get(f.name) for f in METRICS_SCHEMA.fields}
        for k in ("offsets_before", "offsets_after"):
            if isinstance(full[k], dict):
                full[k] = json.dumps({str(a): b for a, b in sorted(full[k].items())})
        tbl = pa.table({k: [v] for k, v in full.items()})
        pq.write_table(tbl, os.path.join(self.path, f"batch-{row['batch_seq']:08d}.parquet"))

    def read(self) -> DataFrame:
        import glob

        if not glob.glob(os.path.join(self.path, "*.parquet")):
            return self.spark.createDataFrame([], METRICS_SCHEMA)
        return self.spark.read.parquet(self.path)
