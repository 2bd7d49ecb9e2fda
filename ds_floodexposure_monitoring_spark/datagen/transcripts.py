"""Deterministic seeded transcript change-log generator.

Generates a CDC change log over the ``input_hint`` transcript schema
(FIXTURES.md §2): events ``(lsn, shard, op, conv_id, turn_idx, role,
text, tool, ts[, model])`` laid out as offset-ordered parquet files
``shard=S/events-<start_seq>-<end_seq>.parquet`` — the generalization of
the reference's filename-keyed blob discovery
(reference: src/datasources/floodscan.py:44-58, filenames parsed back to
keys at :97-99).

Everything is derived from the event id with hash functions, entirely
JVM-side (no Python UDFs, no wall-clock, no RNG state), so generation
scales with the cluster: ``spark.range(n)`` partitions the id space and
every column is a deterministic expression of ``id`` and ``seed``.

Knobs (all seeded):
- ``n_events``          base change events (lsn = 1..n, global order)
- ``n_convs``           conversation population
- ``hot_frac``/``n_hot``  skew: fraction of events hitting n_hot hot convs
- ``dup_rate``          re-delivered events (identical lsn + payload)
- ``ooo_window``        out-of-order shuffle distance in arrival order
- ``schema_change_at``  lsn where ``model`` appears and turn_idx widens
- ``n_shards``          source partitions; shard = hash(conv_id) % n,
                        so per-shard lsn subsequences stay increasing
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_FILE_RE = re.compile(r"events-(\d{12})-(\d{12})\.(?:parquet|jsonl)$")


@dataclass(frozen=True)
class ChangeLogSpec:
    n_events: int = 100_000
    n_convs: int = 2_000
    max_turns: int = 40
    n_shards: int = 4
    seed: int = 42
    hot_frac: float = 0.3      # fraction of events routed to hot convs
    n_hot: int = 3             # number of hot conversations
    dup_rate: float = 0.05     # fraction of events re-delivered
    delete_rate: float = 0.0   # fraction of events that are deletes (op='D')
    ooo_window: int = 500      # arrival-order jitter distance
    schema_change_at: int | None = None  # lsn; None = no mid-stream change
    events_per_file: int = 10_000


def _frac(col, seed: int):
    """Deterministic uniform-ish fraction in [0,1) from a column."""
    return (F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(1_000_000)) / 1_000_000.0)


def _base_events(spark: SparkSession, spec: ChangeLogSpec) -> DataFrame:
    """lsn-ordered base events; every column a pure function of id."""
    df = spark.range(spec.n_events).withColumn("lsn", F.col("id") + 1)

    is_hot = _frac(F.col("id"), spec.seed + 1) < spec.hot_frac
    hot_ix = F.pmod(F.xxhash64("id", F.lit(spec.seed + 2)), F.lit(spec.n_hot))
    cold_ix = (
        F.pmod(F.xxhash64("id", F.lit(spec.seed + 3)), F.lit(max(spec.n_convs - spec.n_hot, 1)))
        + spec.n_hot
    )
    conv_ix = F.when(is_hot, hot_ix).otherwise(cold_ix)
    df = df.withColumn("conv_id", F.format_string("conv-%08d", conv_ix))

    df = df.withColumn(
        "turn_idx",
        F.pmod(F.xxhash64("id", F.lit(spec.seed + 4)), F.lit(spec.max_turns)).cast("int"),
    )
    df = df.withColumn("shard", F.pmod(F.xxhash64("conv_id"), F.lit(spec.n_shards)).cast("int"))
    df = df.withColumn(
        "op",
        F.when(_frac(F.col("id"), spec.seed + 10) < spec.delete_rate, "D")
        .when(F.pmod(F.xxhash64("id", F.lit(spec.seed + 5)), F.lit(5)) == 0, "U")
        .otherwise("I"),
    )
    roles = F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool"))
    df = df.withColumn("role", F.element_at(roles, (F.pmod(F.col("turn_idx"), F.lit(4)) + 1).cast("int")))
    df = df.withColumn(
        "tool",
        F.when(
            F.col("role") == "tool",
            F.format_string("tool-%02d", F.pmod(F.xxhash64("id", F.lit(spec.seed + 6)), F.lit(16))),
        ),
    )
    # The byte-for-byte invariant column: unique per (key, lsn) so a
    # wrong winner is always detectable.
    df = df.withColumn(
        "text",
        F.format_string(
            "turn %s#%04d rev=%d :: %s",
            F.col("conv_id"),
            F.col("turn_idx"),
            F.col("lsn"),
            F.sha2(F.concat_ws("|", "conv_id", "turn_idx", "lsn"), 256),
        ),
    )
    df = df.withColumn(
        "ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("lsn"))
    )
    if spec.schema_change_at is not None:
        df = df.withColumn(
            "model",
            F.when(
                F.col("lsn") >= spec.schema_change_at,
                F.format_string("model-v%d", F.pmod(F.xxhash64("id", F.lit(spec.seed + 7)), F.lit(3))),
            ),
        )
    return df.drop("id")


def generate_changelog(spark: SparkSession, spec: ChangeLogSpec, out_dir: str) -> dict:
    """Write the change log to ``out_dir`` and return a manifest.

    Layout: ``out_dir/shard=S/events-<start>-<end>.parquet`` where
    start/end are per-shard *arrival* sequence numbers (Kafka-offset
    analog). Out-of-order delivery means a file's lsn span overlaps its
    neighbours'; last-writer-wins by lsn corrects it downstream.
    """
    base = _base_events(spark, spec)

    # Re-deliveries: identical (lsn, payload) rows arriving later.
    if spec.dup_rate > 0:
        dups = base.where(_frac(F.col("lsn"), spec.seed + 8) < spec.dup_rate).withColumn(
            "_redelivery", F.lit(1)
        )
        events = base.withColumn("_redelivery", F.lit(0)).unionByName(dups)
    else:
        events = base.withColumn("_redelivery", F.lit(0))

    # Arrival order: lsn + bounded jitter (+ a big shove for redeliveries).
    jitter = F.pmod(F.xxhash64("lsn", F.lit(spec.seed + 9), "_redelivery"), F.lit(max(spec.ooo_window, 1)))
    events = events.withColumn(
        "_arrival", F.col("lsn") + jitter + F.col("_redelivery") * (2 * spec.ooo_window + 10)
    )

    from pyspark.sql.window import Window

    seq_w = Window.partitionBy("shard").orderBy("_arrival", "lsn", "_redelivery")
    events = events.withColumn("_seq", F.row_number().over(seq_w))
    events = events.withColumn(
        "_file_no", F.floor((F.col("_seq") - 1) / spec.events_per_file).cast("int")
    )

    # Mid-stream schema change happens at a file boundary per shard:
    # files whose first event has lsn >= schema_change_at carry `model`
    # and a widened turn_idx (int -> bigint).
    staging = os.path.join(out_dir, "_staging")
    payload = ["lsn", "shard", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]
    if spec.schema_change_at is not None:
        payload.append("model")

    (
        events.select(*payload, "_seq", "_file_no")
        .repartition("shard", "_file_no")
        .sortWithinPartitions("_seq")
        .write.mode("overwrite")
        .partitionBy("shard", "_file_no")
        .parquet(staging)
    )

    # Driver-side finalize: one file per (shard, file_no) chunk renamed to
    # the offset-encoded convention. (At production scale the tail writer
    # emits these directly; this path only runs in datagen.)
    import glob as _glob

    import pyarrow.parquet as pq

    def _finalize_chunk(shard: int, dst_dir: str, chunk_dir: str) -> dict:
        import pyarrow as pa

        parts = sorted(_glob.glob(os.path.join(chunk_dir, "*.parquet")))
        assert parts, chunk_dir
        if len(parts) == 1:
            tbl = pq.read_table(parts[0])
        else:
            tbl = pa.concat_tables([pq.read_table(p) for p in parts])
        seq_col = tbl.column("_seq")
        import pyarrow.compute as pc

        start = pc.min(seq_col).as_py()
        end = pc.max(seq_col).as_py()
        out_tbl = tbl.drop_columns(["_seq"])
        # Spark's vectorized reader needs isAdjustedToUTC=true to read
        # the column back as TIMESTAMP (LTZ); pyarrow round-trips
        # Spark's INT96 as naive ns otherwise.
        ts_ix = out_tbl.schema.get_field_index("ts")
        out_tbl = out_tbl.set_column(
            ts_ix, "ts", out_tbl.column("ts").cast(pa.timestamp("us", tz="UTC"))
        )
        if spec.schema_change_at is not None:
            # The schema changes with the first file *containing* a
            # post-change event. Rows keep consistent values across
            # redeliveries: model is null for lsn < change everywhere.
            max_lsn_in_file = pc.max(tbl.column("lsn")).as_py()
            if max_lsn_in_file < spec.schema_change_at:
                out_tbl = out_tbl.drop_columns(["model"])
            else:
                ix = out_tbl.schema.get_field_index("turn_idx")
                out_tbl = out_tbl.set_column(
                    ix, "turn_idx", out_tbl.column("turn_idx").cast(pa.int64())
                )
        fname = f"events-{start:012d}-{end:012d}.parquet"
        # small row groups keep the files splittable: Spark's scan
        # parallelism is bounded by row-group count, and a batch of a few
        # single-row-group files would cap the width of the whole ingest
        pq.write_table(out_tbl, os.path.join(dst_dir, fname), row_group_size=65536)
        return {"shard": shard, "start_seq": start, "end_seq": end,
                "path": os.path.join(dst_dir, fname)}

    from concurrent.futures import ThreadPoolExecutor

    jobs = []
    for shard_dir in sorted(_glob.glob(os.path.join(staging, "shard=*"))):
        shard = int(shard_dir.split("=")[-1])
        dst_dir = os.path.join(out_dir, f"shard={shard}")
        os.makedirs(dst_dir, exist_ok=True)
        for chunk_dir in sorted(
            _glob.glob(os.path.join(shard_dir, "_file_no=*")),
            key=lambda p: int(p.split("=")[-1]),
        ):
            jobs.append((shard, dst_dir, chunk_dir))
    with ThreadPoolExecutor(max_workers=min(16, len(jobs) or 1)) as ex:
        manifest_files = list(ex.map(lambda j: _finalize_chunk(*j), jobs))
    manifest_files.sort(key=lambda m: (m["shard"], m["start_seq"]))
    import shutil

    shutil.rmtree(staging)
    return {
        "n_files": len(manifest_files),
        "files": manifest_files,
        "spec": {k: getattr(spec, k) for k in spec.__dataclass_fields__},
    }


def transcript_schema(with_model: bool = False, wide_turn_idx: bool = False) -> T.StructType:
    """The maintained lake-table schema (FIXTURES.md §1)."""
    fields = [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.LongType() if wide_turn_idx else T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
    if with_model:
        fields.append(T.StructField("model", T.StringType(), True))
    return T.StructType(fields)


def parse_changelog_filename(path: str) -> tuple[int, int] | None:
    """Parse (start_seq, end_seq) from an offset-encoded filename."""
    m = _FILE_RE.search(path)
    if not m:
        return None
    return int(m.group(1)), int(m.group(2))


def write_envelope_changelog(
    parquet_root: str, jsonl_root: str, dialect: str = "debezium"
) -> int:
    """Re-express a generated parquet changelog as JSON-envelope files
    (``shard=S/events-<a>-<b>.jsonl``, one envelope per line) for the
    EnvelopeChangelogReader (sources/envelope.py) — the test/bench
    fixture for Debezium/Maxwell-shaped ingest. Returns files written.

    Deterministic mapping, file-for-file and row-for-row (same offsets,
    same arrival order, so batch plans and batch ids line up with the
    parquet tail):

    - debezium: op I→c, U→u, D→d (full last image in ``before``, the
      connector's documented delete shape); ``source.lsn`` carries the
      lsn; ``ts`` travels as int64 epoch micros (MicroTimestamp); EVEN
      lsns are schemas.enable-wrapped ({"payload": …}), ODD unwrapped —
      both dialects exercised in every file.
    - maxwell: type insert/update/delete with the full image in
      ``data``; fixture convention ``ts``=0, ``xid``=lsn so the
      decoder's default ordering key ts*1e6+xid reproduces the lsn
      exactly.

    Driver-side pyarrow (datagen only runs at test scale; the
    production tail writer would emit envelopes directly).
    """
    import glob as _glob
    import json as _json

    import pyarrow.parquet as pq

    if dialect not in ("debezium", "maxwell"):
        raise ValueError(f"unknown dialect {dialect!r}")
    n_files = 0
    for shard_dir in sorted(_glob.glob(os.path.join(parquet_root, "shard=*"))):
        out_dir = os.path.join(jsonl_root, os.path.basename(shard_dir))
        os.makedirs(out_dir, exist_ok=True)
        for p in sorted(_glob.glob(os.path.join(shard_dir, "events-*.parquet"))):
            rows = pq.read_table(p).to_pylist()
            lines = []
            for r in rows:
                lsn, op = r.pop("lsn"), r.pop("op")
                r.pop("shard", None)
                ts = r.get("ts")
                if ts is not None:  # epoch micros on the wire
                    epoch = ts.timestamp() if ts.tzinfo else (
                        ts - __import__("datetime").datetime(1970, 1, 1)
                    ).total_seconds()
                    r["ts"] = int(round(epoch * 1_000_000))
                if dialect == "debezium":
                    code = {"I": "c", "U": "u", "D": "d"}[op]
                    inner = {
                        "op": code,
                        "before": r if code == "d" else None,
                        "after": None if code == "d" else r,
                        "source": {"lsn": lsn, "db": "fixture", "table": "t"},
                        "ts_ms": None,
                    }
                    env = {"payload": inner} if lsn % 2 == 0 else inner
                else:
                    typ = {"I": "insert", "U": "update", "D": "delete"}[op]
                    env = {
                        "database": "fixture",
                        "table": "t",
                        "type": typ,
                        "ts": 0,
                        "xid": lsn,
                        "position": f"fixture:{lsn}",
                        "data": r,
                    }
                lines.append(_json.dumps(env, sort_keys=True))
            base = os.path.basename(p)[: -len(".parquet")]
            with open(os.path.join(out_dir, base + ".jsonl"), "w") as fh:
                fh.write("\n".join(lines) + "\n")
            n_files += 1
    return n_files
