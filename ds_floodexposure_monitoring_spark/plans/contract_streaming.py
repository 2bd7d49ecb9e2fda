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


REGISTRY["streaming_join_enrich"] = QuerySpec(
    fn=lambda spark, sf: _run_enriched(spark, sf),
    oracle_sql="""
    SELECT time_bucket(INTERVAL '1 day', e.ts) AS win_start, n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2
    """,
    note="stream-static broadcast enrichment join (stateless per "
         "micro-batch, no join state) feeding the watermarked windowed "
         "agg; oracle is the equivalent batch join + GROUP BY",
)


def _run_enriched(spark: SparkSession, sf: str) -> DataFrame:
    from ..streaming.stream import run_enriched_counts_sync

    cust = spark.read.parquet(f"{sf}/customer.parquet").select("c_custkey", "c_nationkey")
    nat = spark.read.parquet(f"{sf}/nation.parquet").select("n_nationkey", "n_name")
    dim = cust.join(nat, cust.c_nationkey == nat.n_nationkey).select("c_custkey", "n_name")
    return run_enriched_counts_sync(spark, f"{sf}/events.parquet", dim)


REGISTRY["streaming_lww_dedup"] = QuerySpec(
    fn=lambda spark, sf: _run_lww(spark, sf),
    # same semantics as the batch lww_state query: the stateful streaming
    # dedup must converge to the identical per-key winners once the
    # watermark flushes every key
    oracle_sql="""
    SELECT user_id, event_type, value, ts AS last_ts, event_id AS last_event_id
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id DESC) = 1
    """,
    note="applyInPandasWithState keyed last-writer-wins dedup (state = one "
         "winner row per key, evicted at the watermark); the streaming "
         "twin of the per-batch LWW inside the MERGE path — oracle is the "
         "batch lww_state SQL",
)


def _run_lww(spark: SparkSession, sf: str) -> DataFrame:
    from ..streaming.stateful import run_lww_dedup_stream_sync

    return run_lww_dedup_stream_sync(spark, f"{sf}/events.parquet")


REGISTRY["streaming_sessionize"] = QuerySpec(
    fn=lambda spark, sf: _run_sessions(spark, sf),
    # identical semantics to the batch sessionize_events oracle: the
    # stateful streaming operator must converge to the same sessions
    # once the watermark closes them (strict 30-min gap, exact decimal
    # value sums, per-user ordinal numbering)
    oracle_sql="""
    WITH t AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess
      FROM t
    )
    SELECT user_id, CAST(sess AS BIGINT) AS session_no,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) AS TIMESTAMP) AS session_end,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
    FROM s GROUP BY 1, 2
    """,
    note="applyInPandasWithState gap sessionization (custom stateful streaming operator, event-time timeout closes sessions at the watermark); oracle = the batch sessionization SQL",
)


def _run_sessions(spark: SparkSession, sf: str) -> DataFrame:
    from ..streaming.stateful import run_sessionize_stream_sync

    return run_sessionize_stream_sync(spark, f"{sf}/events.parquet")


REGISTRY["streaming_partial_update"] = QuerySpec(
    fn=lambda spark, sf: _run_partial_update(spark, sf),
    # identical semantics to the batch partial_update_state query: the
    # stateful field-granular fold must converge to the same merged
    # state once the watermark flushes every key
    oracle_sql="""
    WITH p AS (
      SELECT user_id, event_type, event_id,
             CASE WHEN event_id % 3 <> 0 THEN value END AS value,
             CASE WHEN event_id % 5 <> 0 THEN props END AS props,
             CASE WHEN event_id % 7 <> 0 THEN ts END AS ts
      FROM events
    ),
    w AS (
      SELECT user_id, event_type, event_id,
             last_value(value IGNORE NULLS) OVER win AS value,
             last_value(props IGNORE NULLS) OVER win AS props,
             last_value(ts IGNORE NULLS) OVER win AS ts,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY event_id DESC) AS rn
      FROM p
      WINDOW win AS (PARTITION BY user_id, event_type ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING
                              AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, event_type, value, props, ts,
           CAST(event_id AS BIGINT) AS last_lsn
    FROM w WHERE rn = 1
    """,
    note="applyInPandasWithState partial-update merge engine (streaming "
         "twin of partial_update_state): state keeps per-FIELD "
         "(lsn, value) of the newest non-null write, patch events "
         "compete only for fields they carry, keys evicted at the "
         "watermark — oracle is the batch IGNORE-NULLS window SQL",
)


def _run_partial_update(spark: SparkSession, sf: str) -> DataFrame:
    from ..streaming.stateful import run_partial_update_stream_sync

    return run_partial_update_stream_sync(spark, f"{sf}/events.parquet")


REGISTRY["streaming_envelope_decode"] = QuerySpec(
    fn=lambda spark, sf: _run_envelope(spark, sf),
    # the oracle bypasses JSON entirely: it computes the surviving state
    # straight from events (newest change per key wins; keys whose
    # newest change is the derived delete — event_id%11=0 — are GONE),
    # so a green row proves the full streaming encode -> from_json
    # decode -> tombstone-aware stateful fold loop is lossless
    oracle_sql="""
    WITH last AS (
      SELECT user_id, event_type, value, props, ts, event_id,
             (event_id % 11 = 0) AS is_del,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, event_type, value, props, CAST(ts AS TIMESTAMP) AS ts,
           CAST(event_id AS BIGINT) AS last_lsn
    FROM last WHERE rn = 1 AND NOT is_del
    """,
    note="Debezium envelopes under Structured Streaming: the same "
         "decode_debezium projection as the batch debezium_decode_lww "
         "(from_json is streaming-compatible — no batch-only machinery) "
         "feeding a tombstone-aware applyInPandasWithState LWW whose "
         "deleted keys emit NOTHING at the watermark flush (the MERGE "
         "path's delete semantics, unlike streaming_lww_dedup's "
         "delete-less winners); deletes carry the full last image in "
         "`before` (the connector's richer documented delete shape), "
         "which keeps the event-time watermark column non-null for "
         "every op",
)


def _run_envelope(spark: SparkSession, sf: str) -> DataFrame:
    from ..streaming.stateful import run_envelope_lww_stream_sync

    return run_envelope_lww_stream_sync(spark, f"{sf}/events.parquet")
