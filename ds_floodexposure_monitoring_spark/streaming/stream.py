"""Structured Streaming adapter over the same MERGE sink.

The engine's primary runtime is the deterministic micro-batch loop
(runner.py) — simpler to prove exactly-once and the only way to handle
mid-stream *schema changes* (Spark's file streaming source requires a
fixed schema). This adapter runs the identical merge as a
``readStream → foreachBatch(merge_into)`` pipeline for deployments that
want a long-running query: exactly-once holds because foreachBatch
re-delivers a failed epoch under the same epoch_id, and merge commits
are idempotent on batch_id = (checkpoint identity, epoch_id)
(streaming/checkpoint.py semantics).

Also provides ``streaming_windowed_counts`` — event-time tumbling-window
aggregation with watermarking (late-data bound), the §2.9 windowed-agg
analog, runnable synchronously for tests via the memory sink.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.merge import merge_into
from ..sources.lake import LakeTable


def stream_changelog_into(
    spark: SparkSession,
    changelog_glob: str,
    table: LakeTable,
    schema: T.StructType,
    checkpoint_dir: str,
    max_files_per_trigger: int = 8,
):
    """Start a streaming MERGE of changelog files into the lake table.

    Returns the StreamingQuery; callers use ``processAllAvailable()``
    (tests / availableNow semantics) or leave it running.
    """
    run_id = uuid.uuid4().hex[:8]
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(changelog_glob)
    )

    def apply_batch(df: DataFrame, epoch_id: int) -> None:
        batch_id = f"stream-{run_id}-{epoch_id}"
        if batch_id in table.committed_batch_ids():
            return  # replayed epoch — already applied
        merge_into(
            table,
            df,
            op_col="op" if "op" in df.columns else None,
            batch_id=batch_id,
        )

    return (
        src.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_counts(
    events: DataFrame,
    window_len: str = "1 day",
    watermark: str = "2 days",
) -> DataFrame:
    """Event-time tumbling-window counts with a late-data watermark.

    Works on a streaming or batch DataFrame with (ts, event_type, value).
    """
    # watermarks need TIMESTAMP (LTZ); NTZ sources are interpreted as UTC
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_len).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n",
            "total",
        )
    )


def enriched_windowed_counts(
    events: DataFrame,
    dim: DataFrame,
    join_key: tuple[str, str] = ("user_id", "c_custkey"),
    group_col: str = "n_name",
    window_len: str = "1 day",
    watermark: str = "2 days",
) -> DataFrame:
    """Stream-static enrichment join + event-time windowed aggregation.

    The §2.3 fact×dim broadcast join lifted into Structured Streaming:
    stream-static inner joins are stateless (each micro-batch joins
    against the static side independently; no join state, no watermark
    interaction), so the dim is broadcast exactly as in the batch plan
    and the only stateful operator remains the windowed agg. At scale
    the static side is the small dimension table — broadcast keeps the
    stream side shuffle-free until the aggregation."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    left, right = join_key
    joined = events.join(F.broadcast(dim), events[left] == dim[right], "inner")
    return (
        joined.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_len).alias("win"), group_col)
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .select(F.col("win.start").alias("win_start"), group_col, "n", "total")
    )


def _stream_from_file(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """File streaming source over a single parquet file (the source API
    requires a directory; stage via symlink)."""
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="streamsrc-")
    os.symlink(os.path.abspath(path), os.path.join(d, "part-0.parquet"))
    return spark.readStream.schema(schema).parquet(d)


def _drain_to_df(spark: SparkSession, streaming_df: DataFrame, out_schema) -> DataFrame:
    """Run a complete-mode streaming aggregation to completion over its
    bounded source (memory sink) and return the final result."""
    name = f"snk_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table(name).collect()
    return spark.createDataFrame(rows, out_schema)


def run_enriched_counts_sync(
    spark: SparkSession, events_path: str, dim: DataFrame
) -> DataFrame:
    """Drive the stream-static join + windowed agg to completion over a
    bounded file source."""
    static = spark.read.parquet(events_path)
    src = _stream_from_file(spark, events_path, static.schema)
    out_schema = enriched_windowed_counts(static, dim).schema
    return _drain_to_df(spark, enriched_windowed_counts(src, dim), out_schema)


def run_windowed_counts_sync(spark: SparkSession, events_path: str) -> DataFrame:
    """Drive the streaming windowed agg to completion over a bounded
    file source (memory sink) and return the result as a DataFrame."""
    static = spark.read.parquet(events_path)
    # the file streaming source requires a *directory*; stage the file in
    # a temp dir via symlink
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="streamsrc-")
    os.symlink(os.path.abspath(events_path), os.path.join(d, "part-0.parquet"))
    src = spark.readStream.schema(static.schema).parquet(d)
    name = f"wincounts_{uuid.uuid4().hex[:8]}"
    q = (
        windowed_counts(src)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # materialize: the memory table dies with the query's sink lifecycle
    rows = spark.table(name).collect()
    out_schema = windowed_counts(static).schema
    return spark.createDataFrame(rows, out_schema)
