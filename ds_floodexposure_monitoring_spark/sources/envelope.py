"""Standard CDC envelope decoders: Debezium / Maxwell JSON → canonical
change events.

The engine's native changelog (sources/changelog.py) is already-columnar
parquet, but a real binlog/WAL tail usually arrives as the JSON envelopes
the standard connectors emit — Debezium (postgres/mysql → Kafka) or
Maxwell (mysql → Kafka). These decoders turn a DataFrame holding raw
envelope strings into the engine's canonical change-event shape:

    payload columns…  +  _lsn (bigint)  +  _tombstone (boolean)

which is exactly what ``operators/merge.merge_into`` /
``operators/dedup.dedup_last_writer`` consume, so a Kafka-shaped source
plugs into the same MERGE path as the native changelog with one extra
projection.

Everything is a single JVM-side projection — ``from_json`` with an
explicit envelope schema, then ``when``/``coalesce`` field routing. No
Python UDFs, no shuffle: decoding N events is one narrow map stage that
whole-stage-codegens, and Catalyst prunes the envelope struct down to
the fields actually selected downstream.

Dialect notes (both verified against the connectors' documented wire
formats — public Debezium/Maxwell docs, not any internal system):

- **Debezium**: ``{"payload": {"op", "before", "after", "source",
  "ts_ms"}}`` when ``schemas.enable=true``, or the inner object directly
  when false — :func:`decode_debezium` accepts both at once (coalesces
  the wrapped and unwrapped shapes row-by-row). ``op``: ``c``/``u``/
  ``r`` carry the row in ``after``; ``d`` carries the key (and final
  image) in ``before``. LSN: ``source.lsn`` (postgres), falling back to
  ``source.ts_ms`` then envelope ``ts_ms``. Temporal payload fields
  follow Debezium's MicroTimestamp convention — int64 epoch MICROS —
  so declare them LongType in ``payload_schema`` and rebuild with
  ``F.timestamp_micros`` downstream.
- **Maxwell**: flat ``{"database", "table", "type", "ts", "xid",
  "position", "data", "old"}``; ``type`` insert/update/delete(/
  bootstrap-*) with the full row image in ``data``. Maxwell has no LSN
  field; the default ordering key is ``ts * 1e6 + xid`` (commit-time
  seconds are too coarse alone — xid breaks intra-second ties in commit
  order). Callers with a reliable payload ordering column should pass
  ``lsn="<payload field>"`` instead (a string names a payload field; a
  Column is any expression over the INPUT DataFrame's own columns, e.g.
  a Kafka offset).

Malformed envelopes (unparseable JSON, or JSON with no recognizable op)
are never silently dropped: they come back flagged in a boolean
``corrupt_col`` so the caller can route them to the dead-letter channel
(streaming/quarantine.py) and merge the valid remainder — the same
batch-survives-bad-rows contract as the rest of the ingest path.

Reference parity: the reference has no log tail at all — it re-polls
whole blobs daily and diffs by filename (reference:
src/datasources/floodscan.py:44-58 listing + watermark prefilter). The
envelope decoders are the missing front door that lets the same MERGE
semantics consume a real WAL instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .lake import LSN_COL, TOMBSTONE_COL

__all__ = [
    "debezium_envelope_schema",
    "maxwell_envelope_schema",
    "decode_debezium",
    "decode_maxwell",
    "encode_debezium",
    "EnvelopeChangelogReader",
]


def debezium_envelope_schema(payload_schema: T.StructType) -> T.StructType:
    """Envelope schema for ``from_json`` accepting BOTH the
    ``schemas.enable`` wrapped form (top-level ``payload`` object) and
    the unwrapped form (op/before/after at top level) — absent fields
    simply parse to null, so one schema covers both dialects."""
    source = T.StructType(
        [
            T.StructField("lsn", T.LongType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("db", T.StringType()),
            T.StructField("schema", T.StringType()),
            T.StructField("table", T.StringType()),
        ]
    )
    inner_fields = [
        T.StructField("op", T.StringType()),
        T.StructField("before", payload_schema),
        T.StructField("after", payload_schema),
        T.StructField("source", source),
        T.StructField("ts_ms", T.LongType()),
    ]
    return T.StructType(
        [T.StructField("payload", T.StructType(inner_fields))] + inner_fields
    )


def maxwell_envelope_schema(payload_schema: T.StructType) -> T.StructType:
    """Maxwell's flat envelope; ``old`` holds only the changed columns'
    prior values on update, the same payload type works for both."""
    return T.StructType(
        [
            T.StructField("database", T.StringType()),
            T.StructField("table", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("ts", T.LongType()),
            T.StructField("xid", T.LongType()),
            T.StructField("commit", T.BooleanType()),
            T.StructField("position", T.StringType()),
            T.StructField("data", payload_schema),
            T.StructField("old", payload_schema),
        ]
    )


def _payload_cols(payload: Column, payload_schema: T.StructType) -> list[Column]:
    return [payload[f.name].alias(f.name) for f in payload_schema.fields]


def decode_debezium(
    df: DataFrame,
    value_col: str,
    payload_schema: T.StructType,
    *,
    lsn: Column | str | None = None,
    drop_reads: bool = False,
    corrupt_col: str = "_corrupt",
    keep_cols: tuple[str, ...] = (),
    op_col_out: str | None = None,
) -> DataFrame:
    """Decode Debezium JSON envelopes in ``df[value_col]`` to canonical
    change events.

    ``op_col_out`` optionally surfaces the raw Debezium op code
    ('c'/'u'/'r'/'d') as an output column — consumers that need the
    create-vs-update distinction (e.g. reconstructing a change feed)
    read it there; the MERGE path ignores it.

    Returns payload columns + ``_lsn`` + ``_tombstone`` + ``corrupt_col``
    (+ any ``keep_cols`` passed through from ``df``, e.g. a Kafka
    partition/offset pair for lineage). Row routing:

    - op ``c``/``u`` (and ``r`` snapshot reads unless ``drop_reads``):
      payload from ``after``, ``_tombstone`` false
    - op ``d``: payload from ``before`` (Debezium guarantees at least
      the key fields there), ``_tombstone`` true
    - op ``t``/``m`` (truncate/message — no row image) and snapshot
      reads under ``drop_reads``: EXCLUDED from the output
    - unparseable / op-less rows: kept with ``corrupt_col`` true and
      null payload, so the caller can quarantine them; every VALID
      output row has ``corrupt_col`` false

    ``lsn`` overrides the ordering key (default
    ``source.lsn → source.ts_ms → ts_ms``). The decode is one
    whole-stage-codegen projection + one filter; tests pin the plan
    shape (tests/test_envelope.py).
    """
    env_schema = debezium_envelope_schema(payload_schema)
    parsed = F.from_json(F.col(value_col), env_schema)
    inner = F.struct(
        *[parsed[f.name].alias(f.name) for f in env_schema["payload"].dataType.fields]
    )
    env = F.when(parsed["payload"].isNotNull(), parsed["payload"]).otherwise(inner)

    tmp = "_dbz_env"
    out = df.withColumn(tmp, env)
    e = F.col(tmp)
    op = e["op"]
    corrupt = op.isNull()
    is_del = op == "d"
    dropped_ops = ["t", "m"] + (["r"] if drop_reads else [])
    payload = F.when(is_del, e["before"]).otherwise(e["after"])
    if lsn is None:
        lsn_expr = F.coalesce(e["source"]["lsn"], e["source"]["ts_ms"], e["ts_ms"])
    elif isinstance(lsn, str):
        lsn_expr = payload[lsn]  # a payload field carries the ordering
    else:
        lsn_expr = lsn
    return (
        out.where(corrupt | ~op.isin(dropped_ops))
        .select(
            *[F.col(c) for c in keep_cols],
            *_payload_cols(payload, payload_schema),
            lsn_expr.cast("long").alias(LSN_COL),
            F.when(corrupt, F.lit(None).cast("boolean"))
            .otherwise(is_del)
            .alias(TOMBSTONE_COL),
            corrupt.alias(corrupt_col),
            *([op.alias(op_col_out)] if op_col_out else []),
        )
    )


def decode_maxwell(
    df: DataFrame,
    value_col: str,
    payload_schema: T.StructType,
    *,
    lsn: Column | str | None = None,
    drop_bootstrap: bool = False,
    corrupt_col: str = "_corrupt",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Decode Maxwell JSON envelopes to the same canonical shape as
    :func:`decode_debezium`.

    ``insert``/``update`` (and ``bootstrap-insert`` unless
    ``drop_bootstrap``) upsert from ``data``; ``delete`` tombstones from
    ``data`` (Maxwell carries the full deleted image there);
    ``bootstrap-start``/``bootstrap-complete`` markers (no row image)
    are excluded; anything unparseable is flagged via ``corrupt_col``.
    Default ordering key ``ts * 1_000_000 + xid`` (see module notes).
    """
    env_schema = maxwell_envelope_schema(payload_schema)
    tmp = "_mxw_env"
    out = df.withColumn(tmp, F.from_json(F.col(value_col), env_schema))
    e = F.col(tmp)
    typ = e["type"]
    corrupt = typ.isNull()
    is_del = typ == "delete"
    row_ops = ["insert", "update", "delete"] + (
        [] if drop_bootstrap else ["bootstrap-insert"]
    )
    if lsn is None:
        lsn_expr = e["ts"] * F.lit(1_000_000) + F.coalesce(e["xid"], F.lit(0))
    elif isinstance(lsn, str):
        lsn_expr = e["data"][lsn]
    else:
        lsn_expr = lsn
    return (
        out.where(corrupt | typ.isin(row_ops))
        .select(
            *[F.col(c) for c in keep_cols],
            *_payload_cols(e["data"], payload_schema),
            lsn_expr.cast("long").alias(LSN_COL),
            F.when(corrupt, F.lit(None).cast("boolean"))
            .otherwise(is_del)
            .alias(TOMBSTONE_COL),
            corrupt.alias(corrupt_col),
        )
    )


# --------------------------------------------------------------------------
# Pipeline wiring: a ChangelogReader over JSON-envelope files, so the
# same CDCPipeline (discovery, watermark pruning, deterministic batch
# ids, exactly-once replay detection, quarantine, MERGE) ingests a
# Debezium/Maxwell tail with zero changes to its control loop. Only the
# read step differs: text scan + the one-projection decode above.
from dataclasses import dataclass as _dataclass

from .changelog import ChangelogReader, MicroBatch


def _json_side_schema(payload_schema: T.StructType) -> T.StructType:
    """The schema handed to ``from_json``: temporal payload fields travel
    as int64 epoch micros on the wire (Debezium MicroTimestamp; the
    Maxwell fixture mirrors it), so declare them LongType for parsing
    and rebuild real timestamps afterwards."""
    fields = []
    for f in payload_schema.fields:
        dt = f.dataType
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            dt = T.LongType()
        fields.append(T.StructField(f.name, dt, True))
    return T.StructType(fields)


@_dataclass
class EnvelopeChangelogReader(ChangelogReader):
    """Drop-in ``ChangelogReader`` over ``shard=S/events-<a>-<b>.jsonl``
    files of Debezium or Maxwell JSON envelopes (one envelope per line).

    Same offset-encoded filename convention, so discovery, watermark
    pruning, micro-batch planning and batch ids are inherited unchanged
    — the wire format is purely a read_batch concern. The decoded batch
    comes back in the pipeline's native contract: payload columns +
    ``lsn`` + ``op`` ('D' tombstones / 'U' upserts) + ``_corrupt``
    (malformed envelopes, null payload/lsn — the runner dead-letters
    them via the standard quarantine channel, or fails loudly when no
    quarantine is configured; they are never silently dropped or
    merged).

    ``payload_schema`` is the REAL payload schema (timestamps as
    TimestampType): wire-side int64 micros are declared automatically
    for parsing and rebuilt with ``timestamp_micros``. Mid-stream
    additive schema changes need no special handling — pass the widest
    schema; earlier envelopes simply parse the missing fields to null,
    exactly what align_to_schema produces on the parquet path.

    Scale shape: the decode is the same single whole-stage-codegen
    projection as :func:`decode_debezium` — one narrow map stage over
    however many line-split tasks the text scan yields; no extra
    shuffle vs the parquet path. JSON parse cost is inherent to the
    wire format, not this reader.
    """

    dialect: str = "debezium"
    payload_schema: T.StructType | None = None

    FILE_GLOB = "events-*.jsonl"

    def __post_init__(self):
        if self.dialect not in ("debezium", "maxwell"):
            raise ValueError(f"unknown envelope dialect {self.dialect!r}")
        if self.payload_schema is None:
            raise ValueError("EnvelopeChangelogReader requires payload_schema")

    def read_batch(self, batch: MicroBatch) -> DataFrame:
        assert batch.files
        wire = _json_side_schema(self.payload_schema)
        raw = self.spark.read.text([f.path for f in batch.files])
        dec = (
            decode_debezium(raw, "value", wire)
            if self.dialect == "debezium"
            else decode_maxwell(raw, "value", wire)
        )
        cols: list[Column] = []
        for f in self.payload_schema.fields:
            c = F.col(f.name)
            if isinstance(f.dataType, T.TimestampType):
                c = F.timestamp_micros(c)
            elif isinstance(f.dataType, T.TimestampNTZType):
                # epoch micros -> NTZ is exact under the engine's pinned
                # UTC session (session.py)
                c = F.timestamp_micros(c).cast("timestamp_ntz")
            cols.append(c.alias(f.name))
        return dec.select(
            *cols,
            F.col(LSN_COL).alias("lsn"),
            F.when(F.col(TOMBSTONE_COL), F.lit("D")).otherwise(F.lit("U")).alias("op"),
            F.col("_corrupt"),
        )


def encode_debezium(
    df: DataFrame,
    payload_cols: list[str] | tuple[str, ...],
    *,
    op_col: str = "change_type",
    lsn_col: str = "change_lsn",
    wrapped: bool = True,
    db: str = "lake",
    table: str = "table",
    value_col: str = "value",
) -> DataFrame:
    """The export half of the envelope story: serialize change rows
    (e.g. ``LakeTable.scan_changes`` output) as Debezium-shaped JSON so
    a downstream consumer — another engine instance, a Kafka topic, any
    Debezium-speaking sink — can tail THIS lake the way this engine
    tails an upstream WAL.

    ``op_col`` accepts 'insert'/'update'/'delete' (the change-feed
    vocabulary) or already-Debezium 'c'/'u'/'d'/'r'. Deletes carry the
    payload (the feed's pre-image) in ``before``; everything else in
    ``after``. Temporal payload columns serialize as int64 epoch micros
    (MicroTimestamp), ``lsn_col`` rides ``source.lsn`` — exactly what
    :func:`decode_debezium` reverses, and the round trip is lossless
    (pytest + the cdc_feed_envelope_roundtrip contract query prove it
    value-exact on a real change feed).

    One whole-stage-codegen ``to_json`` projection: no shuffle, no
    Python, same scale shape as the decode."""
    op_norm = (
        F.when(F.col(op_col).isin("insert", "c", "r"), F.lit("c"))
        .when(F.col(op_col).isin("update", "u"), F.lit("u"))
        .when(F.col(op_col).isin("delete", "d"), F.lit("d"))
    )
    img_fields = []
    for c in payload_cols:
        col = F.col(c)
        dt = df.schema[c].dataType
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            col = F.unix_micros(col.cast("timestamp"))
        img_fields.append(col.alias(c))
    img = F.struct(*img_fields)
    is_del = op_norm == "d"
    inner = F.struct(
        op_norm.alias("op"),
        F.when(is_del, img).alias("before"),
        F.when(~is_del, img).alias("after"),
        F.struct(
            F.col(lsn_col).cast("long").alias("lsn"),
            F.lit(None).cast("long").alias("ts_ms"),
            F.lit(db).alias("db"),
            F.lit(None).cast("string").alias("schema"),
            F.lit(table).alias("table"),
        ).alias("source"),
        F.lit(None).cast("long").alias("ts_ms"),
    )
    env = F.struct(inner.alias("payload")) if wrapped else inner
    return df.select(F.to_json(env).alias(value_col))
