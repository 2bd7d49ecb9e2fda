"""Replay-to-match at scale: the north rule's end-to-end criterion as
one self-contained, independently-verified run.

Generates an N-event transcript change log carrying every adversarial
ingredient the rule names — duplicate re-deliveries, out-of-order
arrival, deletes, one mid-stream schema change, Zipf-hot
conversations — replays it through the FULL ingest pipeline
(micro-batches, MOR merge, tiered compaction, checkpointing) on a
pinned local[W] session, then verifies the final table state against
an INDEPENDENT DuckDB oracle computed straight from the log files:
row count plus an exact order-independent checksum over
(conv_id, turn_idx, text) — sum of 60-bit md5 prefixes, identical
arithmetic in both engines — i.e. byte-for-byte per-turn text equality
under stable key order without collecting either side to the driver.

Emits ONE JSON line: events, wall, events/sec, per-phase steal
disclosure (same /proc/stat basis as bench.py), live rows, oracle
rows, and checksum_match. Usage:

    python bench/replay_match.py [n_events] [cpus] [batch_events]

Defaults 100M events / 8 cores / 10M-event batches — 10^8 events is
1% of the rule's 10^10 target, the largest single-artifact scale this
sandbox's disk and epoch variance make honest.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _pin_cpus(cpus: int) -> bool:
    try:
        avail = sorted(os.sched_getaffinity(0))
        if len(avail) < cpus:
            return False
        os.sched_setaffinity(0, set(avail[:cpus]))
        return True
    except (AttributeError, OSError):
        return False


def _cpu_sample() -> tuple[int, int]:
    steal = total = 0
    with open("/proc/stat") as fh:
        for line in fh:
            p = line.split()
            if p[0] == "cpu":
                vals = list(map(int, p[1:]))
                steal, total = vals[7], sum(vals)
                break
    return steal, total


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    batch_events = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000_000
    pinned = _pin_cpus(cpus)

    from pyspark.sql import functions as F

    from ds_floodexposure_monitoring_spark.datagen.transcripts import (
        ChangeLogSpec,
        generate_changelog,
        transcript_schema,
    )
    from ds_floodexposure_monitoring_spark.session import get_spark
    from ds_floodexposure_monitoring_spark.sources.lake import LakeTable
    from ds_floodexposure_monitoring_spark.streaming.runner import CDCPipeline

    spark = get_spark(
        app_name=f"replay-match-{cpus}", master=f"local[{cpus}]",
        extra_conf={"spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)},
    )
    root = tempfile.mkdtemp(prefix="replaymatch-")
    log_dir = os.path.join(root, "log")
    spec = ChangeLogSpec(
        n_events=n_events,
        n_convs=max(2_000, n_events // 5_000),
        n_shards=max(cpus, 8),
        dup_rate=0.05,
        delete_rate=0.02,
        ooo_window=1_000,
        schema_change_at=2 * n_events // 3,
        events_per_file=min(2_000_000, max(10_000, n_events // 64)),
        seed=20260820,
    )
    t_gen0 = time.monotonic()
    generate_changelog(spark, spec, log_dir)
    gen_wall = time.monotonic() - t_gen0

    table = LakeTable.create(
        spark, os.path.join(root, "t"), transcript_schema(), n_buckets=64
    )
    pipe = CDCPipeline(
        spark, log_dir, table, os.path.join(root, "ck"),
        max_events_per_batch=batch_events,
        target_rows_per_file=2_000_000,
        mode="mor", compact_every=2, compact_min_files=4,
    )
    s0 = _cpu_sample()
    t0 = time.monotonic()
    results = pipe.run_until_caught_up()
    wall = time.monotonic() - t0
    s1 = _cpu_sample()
    steal_pct = round(
        100.0 * (s1[0] - s0[0]) / max(1, s1[1] - s0[1]), 2
    )
    events = sum(r.batch.n_events for r in results)

    # ---- engine-side exact checksum (one aggregate, nothing collected)
    sep, nul = "\x01", "\x00NULL"
    key = F.concat_ws(
        sep, F.col("conv_id"), F.col("turn_idx").cast("string"),
        F.coalesce(F.col("text"), F.lit(nul)),
    )
    digest = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("decimal(38,0)")
    row = (
        table.scan().select("conv_id", "turn_idx", "text")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(digest).alias("sum"))
        .collect()[0]
    )
    spark_n, spark_sum = int(row["n"]), int(row["sum"])

    # ---- independent oracle: DuckDB straight over the log files
    import duckdb

    con = duckdb.connect()
    o = con.sql(f"""
        SELECT count(*) AS n,
               sum(('0x' || substr(md5(
                   conv_id || chr(1) || CAST(turn_idx AS VARCHAR) || chr(1)
                   || coalesce(text, chr(0) || 'NULL')), 1, 15))::UBIGINT) AS s
        FROM (
          SELECT conv_id, turn_idx, text,
                 row_number() OVER (PARTITION BY conv_id, turn_idx
                                    ORDER BY lsn DESC) rn, op
          FROM read_parquet('{log_dir}/*/*.parquet', union_by_name=true)
        ) WHERE rn = 1 AND op <> 'D'
    """).fetchone()
    oracle_n, oracle_sum = int(o[0]), int(o[1])

    out = {
        "metric": "replay_to_match",
        "events": events,
        "replay_wall_sec": round(wall, 1),
        "events_per_sec": round(events / wall, 1),
        "batches": len(results),
        "replay_steal_pct": steal_pct,
        "datagen_wall_sec": round(gen_wall, 1),
        "live_rows": spark_n,
        "oracle_rows": oracle_n,
        "rows_match": spark_n == oracle_n,
        "checksum_match": spark_sum == oracle_sum,
        "cpus": cpus,
        "pinned": pinned,
        "batch_events": batch_events,
        "n_convs": spec.n_convs,
        "dup_rate": spec.dup_rate,
        "delete_rate": spec.delete_rate,
        "ooo_window": spec.ooo_window,
        "schema_change_at": spec.schema_change_at,
    }
    print(json.dumps(out), flush=True)
    spark.stop()
    shutil.rmtree(root, ignore_errors=True)
    if not (out["rows_match"] and out["checksum_match"]):
        sys.exit(1)


if __name__ == "__main__":
    main()
