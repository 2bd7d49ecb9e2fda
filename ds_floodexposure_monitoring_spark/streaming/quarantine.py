"""Dead-letter quarantine for malformed change events.

A production WAL tail carries garbage sooner or later — null merge keys
(an upstream extractor bug), null LSNs (a broken envelope), rows failing
a caller-supplied contract. Failing the whole micro-batch on one bad row
stalls ingest; silently merging it corrupts the table (a null key hashes
to one garbage bucket that grows forever). The CDC-standard answer is a
dead-letter side channel: invalid rows are diverted to a quarantine
table with a machine-readable reason, the batch's valid remainder merges
normally, and the per-batch metrics record the quarantined count so
monitoring can alert on a spike.

Exactly-once: quarantine output is keyed by batch_id — a directory per
batch, written with overwrite — so a crash-retry of the same batch
replaces rather than duplicates its dead letters, and batch replay
detection (streaming/runner.py) skips the write entirely.

The reference's analog is the inverse shape: it crashes the whole run on
any malformed blob (no isolation; reference:
src/datasources/floodscan.py:97-110 assumes every listed file parses).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def invalid_reason(
    merge_keys: list[str] | tuple[str, ...],
    lsn_col: str = "lsn",
    extra: Column | None = None,
    extra_reason: str = "failed contract predicate",
) -> Column:
    """First matching rejection reason, NULL for valid rows.

    Built-in rules: any merge-key component NULL, or the LSN NULL —
    either makes last-writer-wins resolution meaningless for the row.
    ``extra`` adds a caller contract (evaluated null-safely: a NULL
    predicate result does NOT quarantine)."""
    reason = F.lit(None).cast("string")
    checks: list[tuple[Column, str]] = [
        (F.col(k).isNull(), f"null merge key: {k}") for k in merge_keys
    ]
    checks.append((F.col(lsn_col).isNull(), f"null lsn column: {lsn_col}"))
    if extra is not None:
        checks.append((F.coalesce(extra, F.lit(False)), extra_reason))
    for cond, label in reversed(checks):
        reason = F.when(cond, F.lit(label)).otherwise(reason)
    return reason


class Quarantine:
    """Batch-keyed dead-letter store: one overwritten directory per
    batch_id (idempotent under crash-retry), readable as one table."""

    REASON_COL = "_reason"
    BATCH_COL = "_batch_id"

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def write(self, bad: DataFrame, batch_id: str) -> int:
        """Persist one batch's dead letters (``bad`` must already carry
        REASON_COL); returns the row count. Zero rows -> no directory."""
        from pyspark.sql import Observation

        out_dir = os.path.join(self.path, f"batch={batch_id}")
        obs = Observation()
        (
            bad.observe(obs, F.count(F.lit(1)).alias("n"))
            .write.mode("overwrite")
            .parquet(out_dir)
        )
        n = int(obs.get["n"])
        if n == 0:
            shutil.rmtree(out_dir, ignore_errors=True)
        return n

    def scan(self) -> DataFrame:
        """All quarantined rows across batches + BATCH_COL, or an empty
        frame when nothing was ever quarantined."""
        import glob as _glob

        dirs = sorted(_glob.glob(os.path.join(self.path, "batch=*")))
        if not dirs:
            return self.spark.createDataFrame(
                [], f"{self.REASON_COL} string, {self.BATCH_COL} string"
            )
        parts = []
        for d in dirs:
            bid = os.path.basename(d).split("=", 1)[1]
            parts.append(
                self.spark.read.parquet(d).withColumn(self.BATCH_COL, F.lit(bid))
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out
