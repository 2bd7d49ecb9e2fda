"""spark-submit entrypoint for the CDC engine (north_rule deployment
surface: ``spark-submit --py-files`` on a multi-executor cluster).

Cluster deployment::

    cd <repo>
    zip -qr /tmp/engine.zip ds_floodexposure_monitoring_spark
    spark-submit --master <cluster-master> \\
        --py-files /tmp/engine.zip \\
        run_job.py ingest \\
        --log-dir   s3a://.../changelog \\
        --table-dir s3a://.../transcripts \\
        --checkpoint-dir s3a://.../ckpt \\
        --metrics-dir s3a://.../metrics --mode mor

``run_job.py`` (repo root) is a shim that calls :func:`main`; locally
``python -m ds_floodexposure_monitoring_spark.cli ingest ...`` runs the
same code on ``local[N]``. When ``--master`` is omitted the session
factory defers to whatever master spark-submit supplies (a real
cluster) or falls back to ``local[$SPARK_GRAFT_CPUS]``.

Subcommands mirror the engine lifecycle: ``datagen`` (seeded synthetic
change log), ``ingest`` (resume-from-checkpoint micro-batch replay),
``compact`` (MOR delta folding), ``expire`` (snapshot retention +
orphan vacuum), ``show`` (table state), ``clone`` (zero-copy shallow
clone). Every subcommand prints one
JSON summary line on stdout so cluster logs stay machine-parseable.

Reference analog: the repo's pipelines are invoked as module scripts
per run (reference: pipelines/update_floodscan.py:1-30); this CLI is
that surface made transactional and resumable.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import types as T


def _spark(args, app_name: str):
    from .session import get_spark

    return get_spark(app_name=app_name, master=args.master)


def _emit(obj: dict) -> None:
    # default=str: timestamps (e.g. history's committed_at) render ISO-ish
    print(json.dumps(obj, default=str))


def cmd_datagen(args) -> int:
    from .datagen import ChangeLogSpec, generate_changelog

    spark = _spark(args, "cdc-datagen")
    spec = ChangeLogSpec(
        n_events=args.events,
        n_convs=max(args.events // 50, 100),
        n_shards=args.shards,
        dup_rate=args.dup_rate,
        delete_rate=args.delete_rate,
        ooo_window=args.ooo_window,
        schema_change_at=args.schema_change_at,
        events_per_file=max(args.events // 64, 10_000),
        seed=args.seed,
    )
    generate_changelog(spark, spec, args.log_dir)
    _emit({"op": "datagen", "log_dir": args.log_dir, "events": args.events,
           "shards": args.shards, "seed": args.seed})
    return 0


def cmd_ingest(args) -> int:
    from .datagen.transcripts import transcript_schema
    from .sources.lake import LakeTable
    from .streaming.runner import CDCPipeline

    spark = _spark(args, "cdc-ingest")
    if LakeTable.exists(args.table_dir):
        table = LakeTable.load(spark, args.table_dir)
    else:
        schema = (
            T.StructType.fromJson(json.load(open(args.schema_json)))
            if args.schema_json
            else transcript_schema()
        )
        table = LakeTable.create(
            spark, args.table_dir, schema,
            merge_keys=tuple(args.merge_keys.split(",")),
            n_buckets=args.n_buckets,
            stat_cols=tuple(c for c in args.stat_cols.split(",") if c)
            if args.stat_cols else (),
            partition_by=args.partition_by,
            key_bloom_bits=args.key_bloom_bits,
        )
    if args.branch:
        table = table.on_branch(args.branch)
    indexes = {}
    for spec in args.index or ():
        col, _, ipath = spec.partition("=")
        if not ipath:
            raise SystemExit(f"--index expects col=path, got {spec!r}")
        indexes[col] = _load_or_create_index(spark, ipath, table, col)
    pipe = CDCPipeline(
        spark,
        args.log_dir,
        table,
        args.checkpoint_dir,
        metrics_dir=args.metrics_dir,
        max_events_per_batch=args.batch_events,
        target_rows_per_file=args.rows_per_file,
        mode=args.mode,
        compact_every=args.compact_every,
        compact_min_files=args.compact_min_files,
        compact_mode=args.compact_policy,
        major_every=args.major_every,
        expire_every=args.expire_every,
        keep_snapshots=args.keep_snapshots,
        orphan_grace_sec=args.orphan_grace_sec,
        quarantine_dir=args.quarantine_dir,
        indexes=indexes or None,
        changelog_format=args.log_format,
        # widest payload for envelope decode: an explicit --schema-json
        # wins (lets a declared future column evolve in mid-stream);
        # else the table's current schema
        payload_schema=(
            (T.StructType.fromJson(json.load(open(args.schema_json)))
             if args.schema_json else table.schema())
            if args.log_format != "parquet"
            else None
        ),
    )
    results = pipe.run_until_caught_up(max_batches=args.max_batches)
    events = sum(r.batch.n_events for r in results)
    wall = sum(r.wall_ms for r in results) / 1000.0
    _emit({
        "op": "ingest", "table_dir": args.table_dir, "mode": args.mode,
        "batches": len(results),
        "replayed_batches": sum(1 for r in results if r.replayed),
        "events": events,
        "events_per_sec": round(events / wall, 1) if wall > 0 else None,
        "final_version": table.version,
        "final_rows": table.total_rows(),
    })
    return 0


def cmd_compact(args) -> int:
    from .operators.compact import cluster_rewrite, compact
    from .sources.lake import LakeTable

    spark = _spark(args, "cdc-compact")
    table = LakeTable.load(spark, args.table_dir)
    before = len(table.files())
    if args.cluster_by:
        cols = tuple(c.strip() for c in args.cluster_by.split(",") if c.strip())
        cluster_rewrite(
            table, cols,
            target_rows_per_file=args.rows_per_file,
            order=args.cluster_order,
        )
        _emit({"op": "compact", "table_dir": args.table_dir, "mode": "cluster",
               "cluster_by": list(cols), "cluster_order": args.cluster_order,
               "files_before": before, "files_after": len(table.files()),
               "final_version": table.version})
        return 0
    compact(
        table,
        min_files_per_bucket=args.compact_min_files,
        target_rows_per_file=args.rows_per_file,
        mode=args.compact_mode,
    )
    _emit({"op": "compact", "table_dir": args.table_dir, "mode": args.compact_mode,
           "files_before": before, "files_after": len(table.files()),
           "final_version": table.version})
    return 0


def cmd_maintain(args) -> int:
    from .operators.maintain import (
        MaintenancePolicy,
        plan_maintenance,
        run_maintenance,
    )
    from .sources.lake import LakeTable

    spark = _spark(args, "cdc-maintain")
    table = LakeTable.load(spark, args.table_dir)
    pol = MaintenancePolicy(
        compact_at_files=args.compact_at_files,
        major_delta_ratio=args.major_delta_ratio,
        target_rows_per_file=args.rows_per_file,
        tombstone_watermark_lsn=args.tombstone_watermark_lsn,
        analyze_stats=not args.no_analyze,
        keep_snapshots=args.keep_snapshots,
        orphan_grace_sec=args.orphan_grace_sec,
        stale_txn_branch_sec=args.stale_txn_branch_sec,
        txn_wal_dir=args.txn_wal_dir,
    )
    if args.dry_run:
        _emit({"op": "maintain", "table_dir": args.table_dir, "dry_run": True,
               "plan": plan_maintenance(table, pol).to_json()})
        return 0
    rep = run_maintenance(table, pol)
    _emit({"op": "maintain", "table_dir": args.table_dir, "dry_run": False,
           **rep, "final_version": table.version})
    return 0


def cmd_expire(args) -> int:
    from .sources.lake import LakeTable

    spark = _spark(args, "cdc-expire")
    table = LakeTable.load(spark, args.table_dir)
    res = table.expire_snapshots(
        keep_last=args.keep_snapshots, orphan_grace_sec=args.orphan_grace_sec
    )
    _emit({"op": "expire", "table_dir": args.table_dir, **res})
    return 0


def cmd_drop_partitions(args) -> int:
    from .sources.lake import LakeTable

    spark = _spark(args, "cdc-drop-partitions")
    table = LakeTable.load(spark, args.table_dir)
    import datetime as dt

    try:
        before = dt.datetime.fromisoformat(args.before)
    except ValueError:
        # identity partition value: prefer numeric (an int-typed identity
        # partition compared against a raw string raises in Spark), fall
        # back to the raw string only for genuinely string partitions.
        try:
            before = int(args.before)
        except ValueError:
            try:
                before = float(args.before)
            except ValueError:
                before = args.before
    snap = table.drop_partitions(before)
    _emit({
        "op": "drop-partitions", "table_dir": args.table_dir,
        "before": args.before,
        "dropped": snap["summary"]["partitions_dropped"] if snap else [],
        "rows_dropped": snap["summary"]["rows_dropped"] if snap else 0,
        "final_version": table.version,
    })
    return 0


def cmd_show(args) -> int:
    from .sources.lake import LakeTable

    spark = _spark(args, "cdc-show")
    table = LakeTable.load(spark, args.table_dir)
    snap = table.current()
    _emit({
        "op": "show", "table_dir": args.table_dir,
        "version": snap["version"], "snapshot_id": snap["snapshot_id"],
        "schema_version": snap["schema_version"],
        "schema": table.schema().simpleString(),
        "merge_keys": snap["merge_keys"], "n_buckets": snap["n_buckets"],
        "requires_resolve": snap.get("requires_resolve", False),
        "files": len(snap["files"]), "rows": table.total_rows(),
        # logical count: LWW-resolved, tombstones filtered (one count
        # job; physical "rows" above is metadata-only and includes
        # not-yet-compacted delta versions + tombstones under MOR)
        "live_rows": table.scan().count(),
    })
    return 0


def cmd_metrics(args) -> int:
    from pyspark.sql import functions as F

    from .streaming.lineage import MetricsLog

    spark = _spark(args, "cdc-metrics")
    log = MetricsLog(spark, args.metrics_dir)
    df = log.read()
    agg = df.agg(
        F.count("*").alias("batches"),
        F.sum("events").alias("events"),
        F.sum(F.when(F.col("replayed"), 1).otherwise(0)).alias("replayed_batches"),
        F.sum("dedup_dropped").alias("dedup_dropped"),
        F.round(F.avg("events_per_sec"), 1).alias("avg_events_per_sec"),
        F.max("snapshot_version").alias("last_snapshot_version"),
        F.max("batch_seq").alias("last_batch_seq"),
    ).collect()[0]
    out = {"op": "metrics", "metrics_dir": args.metrics_dir, **agg.asDict()}
    if args.tail:
        tail = (
            df.orderBy(F.desc("batch_seq")).limit(args.tail)
            .select("batch_seq", "batch_id", "events", "events_per_sec",
                    "snapshot_version", "replayed")
            .collect()
        )
        out["tail"] = [r.asDict() for r in reversed(tail)]
    _emit(out)
    return 0


def cmd_rollback(args) -> int:
    from .sources.lake import LakeTable

    spark = _spark(args, "cdc-rollback")
    table = LakeTable.load(spark, args.table_dir)
    snap = table.rollback(args.to_version)
    _emit({
        "op": "rollback", "table_dir": args.table_dir,
        "rolled_back_to": args.to_version, "new_version": snap["version"],
        "rows": snap["summary"]["total_rows"],
    })
    return 0


def _load_or_create_index(spark, ipath, table, col):
    from .operators import secondary_index as sx
    from .sources.lake import LakeTable

    if LakeTable.exists(ipath):
        return LakeTable.load(spark, ipath)
    return sx.create_index(spark, ipath, table, col)


def cmd_index(args) -> int:
    from .operators import secondary_index as sx
    from .sources.lake import LakeTable

    spark = _spark(args, "cdc-index")
    table = LakeTable.load(spark, args.table_dir)
    if args.action == "create":
        idx = _load_or_create_index(spark, args.index_dir, table, args.column)
        out = {"op": "index-create", "index_dir": args.index_dir,
               "column": args.column, "version": idx.version}
        if args.backfill:
            sx.index_backfill(idx, table, args.column)
            out["backfilled_to_version"] = table.version
            out["version"] = idx.version
        _emit(out)
        return 0
    # lookup: values parsed to the indexed column's python type
    if not args.values:
        raise SystemExit("index lookup requires --values v1,v2,...")
    idx = LakeTable.load(spark, args.index_dir)
    ftype = table.schema()[args.column].dataType.simpleString()
    conv = int if ftype in ("tinyint", "smallint", "int", "bigint") else (
        float if ftype in ("float", "double") else str
    )
    values = [conv(v) for v in args.values.split(",")]
    rows = sx.lookup(idx, table, args.column, values)
    n = rows.count()
    _emit({
        "op": "index-lookup", "column": args.column, "values": values,
        "rows": n,
        "sample": [
            {k: (v if isinstance(v, (int, float, str, bool, type(None)))
                 else str(v)) for k, v in r.asDict().items()}
            for r in rows.limit(5).collect()
        ] if args.sample else None,
    })
    return 0


def cmd_analyze(args) -> int:
    from .operators.analyze import analyze, set_stat_cols
    from .sources.lake import LakeTable

    spark = _spark(args, "cdc-analyze")
    table = LakeTable.load(spark, args.table_dir)
    out = {"op": "analyze", "table_dir": args.table_dir}
    if args.stat_cols is not None:
        cols = tuple(c for c in args.stat_cols.split(",") if c)
        set_stat_cols(table, cols)
        out["stat_cols"] = list(cols)
    st = analyze(table)
    out.update({
        "files_total": st.files_total,
        "files_analyzed": st.files_analyzed,
        "version": st.snapshot_version,
    })
    _emit(out)
    return 0


def cmd_feed(args) -> int:
    from .sources.feed import FeedCursor
    from .sources.lake import LakeTable

    spark = _spark(args, "cdc-feed")
    table = LakeTable.load(spark, args.table_dir)
    cur = FeedCursor(args.cursor_dir, args.consumer)
    if args.action == "position":
        _emit({"op": "feed-position", "consumer": args.consumer,
               "position": cur.position(), "head": table.version,
               "consumers": FeedCursor.list_consumers(args.cursor_dir)})
        return 0
    if args.action == "reset":
        if args.to_version is None:
            raise SystemExit("feed reset requires --to-version")
        cur.reset(args.to_version)
        _emit({"op": "feed-reset", "consumer": args.consumer,
               "position": args.to_version})
        return 0
    batch = cur.poll(table)
    if batch is None:
        _emit({"op": "feed-poll", "consumer": args.consumer,
               "caught_up": True, "position": cur.position()})
        return 0
    n = batch.df.count()
    by_type = {
        r["change_type"]: r["n"]
        for r in batch.df.groupBy("change_type").count()
        .withColumnRenamed("count", "n").collect()
    }
    if args.out_dir:
        batch.df.write.mode("overwrite").parquet(args.out_dir)
    if args.ack:
        batch.ack()
    _emit({
        "op": "feed-poll", "consumer": args.consumer, "caught_up": False,
        "from_version": batch.from_version, "to_version": batch.to_version,
        "changes": n, "by_type": by_type, "acked": bool(args.ack),
        "out_dir": args.out_dir,
    })
    return 0


def cmd_clone(args) -> int:
    from .sources.lake import LakeTable

    spark = _spark(args, "cdc-clone")
    table = LakeTable.load(spark, args.table_dir)
    c = table.clone(args.dest_dir)
    snap = c.current()
    _emit({
        "op": "clone", "table_dir": args.table_dir, "dest_dir": args.dest_dir,
        "source_version": table.version, "files_shared": len(snap["files"]),
        "rows": snap["summary"]["total_rows"],
    })
    return 0


def cmd_rebucket(args) -> int:
    from .sources.lake import LakeTable

    spark = _spark(args, "cdc-rebucket")
    table = LakeTable.load(spark, args.table_dir)
    snap = table.rebucket(args.n_buckets)
    _emit({
        "op": "rebucket", "table_dir": args.table_dir,
        "from_buckets": snap["summary"]["from_buckets"],
        "to_buckets": snap["summary"]["to_buckets"],
        "rows": snap["summary"]["total_rows"],
        "new_version": snap["version"],
    })
    return 0


def cmd_erase(args) -> int:
    from .operators.erase import erase_cascade
    from .sources.lake import LakeTable

    spark = _spark(args, "cdc-erase")
    table = LakeTable.load(spark, args.table_dir)

    def _cast_keys(t, col, raw):
        dt = t.schema()[col].dataType.simpleString()
        if dt in ("bigint", "int", "smallint", "tinyint"):
            try:
                return [int(v) for v in raw]
            except ValueError:
                raise SystemExit(
                    f"erase: column {col!r} of {t.path} is {dt} but keys "
                    f"{raw!r} are not integers — pass --sidecar-keys with "
                    "ids mapped into that table's key space"
                )
        return list(raw)

    raw_keys = [s.strip() for s in args.keys.split(",") if s.strip()]
    vals = _cast_keys(table, table.merge_keys[0], raw_keys)
    mapped = {}
    for spec in args.sidecar_keys or []:
        label, keys = spec.split("=", 1)
        mapped[label] = [s.strip() for s in keys.split(",") if s.strip()]
    sidecars = {}
    for spec in args.sidecar or []:
        # label=path:col — erase from that table's col, using the base
        # keys (cast into the sidecar column's type) or the explicitly
        # mapped --sidecar-keys for cross-id-space indexes
        label, rest = spec.split("=", 1)
        path, col = rest.rsplit(":", 1)
        st = LakeTable.load(spark, path)
        sidecars[label] = (st, col, _cast_keys(st, col, mapped.get(label, raw_keys)))
    rep = erase_cascade(
        table, vals, sidecars=sidecars,
        expire_keep_last=args.expire_keep_last,
        orphan_grace_sec=args.orphan_grace_sec,
    )
    _emit({"op": "erase", "table_dir": args.table_dir,
           "keys": len(vals), **rep.to_json()})
    return 0


def cmd_history(args) -> int:
    from .sources.lake import LakeTable

    spark = _spark(args, "cdc-history")
    table = LakeTable.load(spark, args.table_dir)
    rows = table.history().orderBy("version").collect()
    _emit({
        "op": "history", "table_dir": args.table_dir,
        "snapshots": [r.asDict() for r in rows],
    })
    return 0


def cmd_delete(args) -> int:
    from .operators.dml import delete_where
    from .sources.lake import LakeTable

    spark = _spark(args, "cdc-delete")
    table = LakeTable.load(spark, args.table_dir)
    st = delete_where(table, args.where)
    out = {"op": "delete", "table_dir": args.table_dir, "where": args.where}
    if st is None:
        out["rows_matched"] = 0
    else:
        out.update({
            "rows_matched": st.rows_matched,
            "buckets_rewritten": st.buckets_rewritten,
            "snapshot_version": st.snapshot_version,
        })
    _emit(out)
    return 0


def cmd_tag(args) -> int:
    from .sources.lake import LakeTable

    spark = _spark(args, "cdc-tag")
    table = LakeTable.load(spark, args.table_dir)
    if args.drop:
        table.drop_tag(args.name)
        _emit({"op": "drop-tag", "table_dir": args.table_dir, "name": args.name})
    else:
        v = table.tag(args.name, version=args.version, replace=args.replace)
        _emit({"op": "tag", "table_dir": args.table_dir, "name": args.name, "version": v})
    return 0


def cmd_branch(args) -> int:
    from .sources.lake import LakeTable

    if args.action != "list" and args.name is None:
        raise SystemExit(f"branch {args.action} requires --name")
    spark = _spark(args, "cdc-branch")
    table = LakeTable.load(spark, args.table_dir)
    if args.action == "create":
        b = table.create_branch(args.name)
        _emit({"op": "branch-create", "table_dir": args.table_dir,
               "name": args.name, "at_version": b.version})
    elif args.action == "publish":
        snap = table.publish_branch(args.name, drop=not args.keep)
        _emit({"op": "branch-publish", "table_dir": args.table_dir,
               "name": args.name, "main_version": snap["version"]})
    elif args.action == "drop":
        table.drop_branch(args.name)
        _emit({"op": "branch-drop", "table_dir": args.table_dir, "name": args.name})
    else:  # list
        _emit({"op": "branch-list", "table_dir": args.table_dir,
               "branches": table.branches(), "tags": table.tags()})
    return 0


def cmd_alter(args) -> int:
    from .sources.lake import LakeTable

    spark = _spark(args, "cdc-alter")
    table = LakeTable.load(spark, args.table_dir)
    if args.rename:
        old, new = args.rename.split(":", 1)
        snap = table.rename_column(old, new)
        _emit({"op": "rename-column", "table_dir": args.table_dir,
               "from": old, "to": new, "new_version": snap["version"]})
    elif args.drop_column:
        snap = table.drop_column(args.drop_column)
        _emit({"op": "drop-column", "table_dir": args.table_dir,
               "dropped": args.drop_column, "new_version": snap["version"]})
    elif args.partition_by:
        spec = None if args.partition_by.lower() == "none" else args.partition_by
        snap = table.set_partition_spec(spec)
        _emit({"op": "set-partition-spec", "table_dir": args.table_dir,
               "partition_by": spec, "new_version": snap["version"]})
    else:
        raise SystemExit("alter: pass --rename old:new, --drop-column name, "
                         "or --partition-by spec")
    return 0


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--master", default=None,
                   help="Spark master; omit under spark-submit (cluster provides it)")


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="ds_floodexposure_monitoring_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("datagen", help="generate a seeded synthetic change log")
    _add_common(g)
    g.add_argument("--log-dir", required=True)
    g.add_argument("--events", type=int, default=1_000_000)
    g.add_argument("--shards", type=int, default=8)
    g.add_argument("--dup-rate", type=float, default=0.05)
    g.add_argument("--delete-rate", type=float, default=0.02)
    g.add_argument("--ooo-window", type=int, default=1_000)
    g.add_argument("--schema-change-at", type=int, default=None)
    g.add_argument("--seed", type=int, default=42)
    g.set_defaults(fn=cmd_datagen)

    i = sub.add_parser("ingest", help="replay the change log into the lake table")
    _add_common(i)
    i.add_argument("--log-dir", required=True)
    i.add_argument("--table-dir", required=True)
    i.add_argument("--checkpoint-dir", required=True)
    i.add_argument("--metrics-dir", default=None)
    i.add_argument("--schema-json", default=None,
                   help="StructType JSON file for table create (default: transcript schema)")
    i.add_argument("--merge-keys", default="conv_id,turn_idx")
    i.add_argument("--n-buckets", type=int, default=64)
    i.add_argument("--stat-cols", default=None,
                   help="comma-separated non-key columns to keep per-file min/max stats for")
    i.add_argument("--partition-by", default=None,
                   help="value-partition transform, e.g. days(ts) (Iceberg partition-spec analog)")
    i.add_argument("--key-bloom-bits", type=int, default=0,
                   help="per-file manifest bloom over the first merge key "
                        "(bits; 0=off) for point-lookup file skipping")
    i.add_argument("--batch-events", type=int, default=1_000_000)
    i.add_argument("--rows-per-file", type=int, default=2_000_000)
    i.add_argument("--mode", choices=("cow", "mor"), default="mor")
    i.add_argument("--compact-every", type=int, default=8)
    i.add_argument("--compact-min-files", type=int, default=4)
    i.add_argument("--compact-policy", choices=("major", "tiered"), default="major",
                   help="tiered = LSM minors with every --major-every-th a major")
    i.add_argument("--major-every", type=int, default=8)
    i.add_argument("--expire-every", type=int, default=None)
    i.add_argument("--keep-snapshots", type=int, default=8)
    i.add_argument("--orphan-grace-sec", type=float, default=3600.0)
    i.add_argument("--max-batches", type=int, default=None)
    i.add_argument("--branch", default=None,
                   help="ingest to this branch head instead of main (write-audit-publish)")
    i.add_argument("--quarantine-dir", default=None,
                   help="dead-letter store for malformed events (default: fail-open, no validation)")
    i.add_argument("--log-format", choices=("parquet", "debezium", "maxwell"),
                   default="parquet",
                   help="changelog wire format: native columnar parquet, or "
                        "JSON envelope files decoded via sources/envelope.py "
                        "(payload schema = the table schema; pass "
                        "--schema-json on first ingest if it differs)")
    i.add_argument("--index", action="append", default=None, metavar="COL=PATH",
                   help="maintain a secondary index on COL at PATH during "
                        "ingest (repeatable; created on first use, exactly-"
                        "once per batch — operators/secondary_index.py)")
    i.set_defaults(fn=cmd_ingest)

    ix = sub.add_parser("index", help="secondary index on a non-key column: "
                        "create/backfill, or prune-then-verify lookup")
    _add_common(ix)
    ix.add_argument("action", choices=("create", "lookup"))
    ix.add_argument("--table-dir", required=True)
    ix.add_argument("--index-dir", required=True)
    ix.add_argument("--column", required=True)
    ix.add_argument("--backfill", action="store_true",
                    help="(create) index the table's current state in one "
                         "O(table) pass — for enabling an index on a table "
                         "that already has data")
    ix.add_argument("--values", default=None,
                    help="(lookup) comma-separated values, parsed to the "
                         "column's type")
    ix.add_argument("--sample", action="store_true",
                    help="(lookup) include up to 5 matched rows in the JSON")
    ix.set_defaults(fn=cmd_index)

    az = sub.add_parser("analyze", help="ANALYZE TABLE analog: backfill "
                        "manifest stats (sums/blooms/tombstones) for "
                        "deficient files; optionally evolve stat cols first")
    _add_common(az)
    az.add_argument("--table-dir", required=True)
    az.add_argument("--stat-cols", default=None,
                    help="comma-separated columns to set as the tracked "
                         "stat set before analyzing (set_stat_cols DDL)")
    az.set_defaults(fn=cmd_analyze)

    fd = sub.add_parser("feed", help="durable change-feed subscription: "
                        "poll the next change window, ack, inspect/reset "
                        "consumer positions")
    _add_common(fd)
    fd.add_argument("action", choices=("poll", "position", "reset"))
    fd.add_argument("--table-dir", required=True)
    fd.add_argument("--cursor-dir", required=True)
    fd.add_argument("--consumer", default="default")
    fd.add_argument("--ack", action="store_true",
                    help="(poll) acknowledge the window after writing it "
                         "(advance the cursor)")
    fd.add_argument("--out-dir", default=None,
                    help="(poll) write the change window as parquet here")
    fd.add_argument("--to-version", type=int, default=None,
                    help="(reset) cursor position to set")
    fd.set_defaults(fn=cmd_feed)

    c = sub.add_parser("compact", help="fold MOR delta files into base files")
    _add_common(c)
    c.add_argument("--table-dir", required=True)
    c.add_argument("--compact-min-files", type=int, default=2)
    c.add_argument("--rows-per-file", type=int, default=2_000_000)
    c.add_argument("--compact-mode", choices=("major", "minor"), default="major",
                   help="minor = LSM-style delta-only fold, base untouched")
    c.add_argument("--cluster-by", default=None,
                   help="comma-separated columns: full sort-order clustering "
                        "rewrite instead of a fold (OPTIMIZE/rewrite_data_files"
                        " sort analog)")
    c.add_argument("--cluster-order", choices=("linear", "zorder"),
                   default="linear")
    c.set_defaults(fn=cmd_compact)

    mt = sub.add_parser("maintain", help="one-shot maintenance cycle: plan "
                        "from manifests, then compact + analyze + expire in "
                        "dependency order")
    _add_common(mt)
    mt.add_argument("--table-dir", required=True)
    mt.add_argument("--dry-run", action="store_true",
                    help="print the metadata-only plan, change nothing")
    mt.add_argument("--compact-at-files", type=int, default=4)
    mt.add_argument("--major-delta-ratio", type=float, default=0.3)
    mt.add_argument("--rows-per-file", type=int, default=2_000_000)
    mt.add_argument("--tombstone-watermark-lsn", type=int, default=None)
    mt.add_argument("--no-analyze", action="store_true")
    mt.add_argument("--keep-snapshots", type=int, default=8)
    mt.add_argument("--orphan-grace-sec", type=float, default=3600.0)
    mt.add_argument("--stale-txn-branch-sec", type=float, default=86400.0,
                    help="GC abandoned txn-* stage branches older than this "
                         "(they pin snapshot chains from expiry)")
    mt.add_argument("--txn-wal-dir", default=None,
                    help="transaction WAL dir: branches with a PENDING "
                         "intent there are never GC'd")
    mt.set_defaults(fn=cmd_maintain)

    e = sub.add_parser("expire", help="expire snapshots + vacuum orphan files")
    _add_common(e)
    e.add_argument("--table-dir", required=True)
    e.add_argument("--keep-snapshots", type=int, default=8)
    e.add_argument("--orphan-grace-sec", type=float, default=3600.0)
    e.set_defaults(fn=cmd_expire)

    s = sub.add_parser("show", help="print table state")
    _add_common(s)
    s.add_argument("--table-dir", required=True)
    s.set_defaults(fn=cmd_show)

    m = sub.add_parser("metrics", help="summarize the lineage/metrics table")
    _add_common(m)
    m.add_argument("--metrics-dir", required=True)
    m.add_argument("--tail", type=int, default=0,
                   help="also print the last N per-batch lineage rows")
    m.set_defaults(fn=cmd_metrics)

    r = sub.add_parser("rollback", help="restore an earlier snapshot as a new commit")
    _add_common(r)
    r.add_argument("--table-dir", required=True)
    r.add_argument("--to-version", type=int, required=True)
    r.set_defaults(fn=cmd_rollback)

    cl = sub.add_parser("clone", help="zero-copy metadata-only table clone "
                        "(SHALLOW CLONE analog; no data read or copied)")
    _add_common(cl)
    cl.add_argument("--table-dir", required=True)
    cl.add_argument("--dest-dir", required=True)
    cl.set_defaults(fn=cmd_clone)

    rb = sub.add_parser("rebucket", help="change the table's bucket count (full rewrite)")
    _add_common(rb)
    rb.add_argument("--table-dir", required=True)
    rb.add_argument("--n-buckets", type=int, required=True)
    rb.set_defaults(fn=cmd_rebucket)

    h = sub.add_parser("history", help="list retained snapshots")
    _add_common(h)
    h.add_argument("--table-dir", required=True)
    h.set_defaults(fn=cmd_history)

    d = sub.add_parser("delete", help="predicate DELETE (bucket-granular COW rewrite)")
    _add_common(d)
    d.add_argument("--table-dir", required=True)
    d.add_argument("--where", required=True, help="SQL predicate, e.g. \"conv_id = 'c1'\"")
    d.set_defaults(fn=cmd_delete)

    er = sub.add_parser("erase", help="GDPR erase cascade: remove every row "
                        "version of a key list from the base table and its "
                        "index sidecars, then expire the history")
    _add_common(er)
    er.add_argument("--table-dir", required=True)
    er.add_argument("--keys", required=True,
                    help="comma-separated first-merge-key values to erase")
    er.add_argument("--sidecar", action="append", default=None,
                    metavar="LABEL=PATH:COL",
                    help="also erase the keys from this table's column "
                         "(repeatable), e.g. ix=/lake/ix_role:conv_id")
    er.add_argument("--sidecar-keys", action="append", default=None,
                    metavar="LABEL=V1,V2",
                    help="per-sidecar key values for indexes keyed in a "
                         "different id space (e.g. the LSH index's long "
                         "doc_id for a string conv_id)")
    er.add_argument("--expire-keep-last", type=int, default=None,
                    help="after erasing, expire all but the last N snapshots "
                         "on every touched table (physically deletes the "
                         "replaced files; omit to keep history)")
    er.add_argument("--orphan-grace-sec", type=float, default=0.0)
    er.set_defaults(fn=cmd_erase)

    t = sub.add_parser("tag", help="pin/drop a named snapshot tag (expire-proof)")
    _add_common(t)
    t.add_argument("--table-dir", required=True)
    t.add_argument("--name", required=True)
    t.add_argument("--version", type=int, default=None, help="default: current head")
    t.add_argument("--replace", action="store_true")
    t.add_argument("--drop", action="store_true")
    t.set_defaults(fn=cmd_tag)

    b = sub.add_parser("branch", help="branch lifecycle: create / publish / drop / list")
    _add_common(b)
    b.add_argument("action", choices=["create", "publish", "drop", "list"])
    b.add_argument("--table-dir", required=True)
    b.add_argument("--name", default=None)
    b.add_argument("--keep", action="store_true",
                   help="publish: keep the branch pointer after fast-forward")
    b.set_defaults(fn=cmd_branch)

    dp = sub.add_parser("drop-partitions",
                        help="metadata-only retention drop of value partitions below a cutoff")
    dp.add_argument("--table-dir", required=True)
    dp.add_argument("--before", required=True,
                    help="ISO datetime (time transforms) or raw value (identity)")
    _add_common(dp)
    dp.set_defaults(fn=cmd_drop_partitions)

    al = sub.add_parser("alter", help="metadata-only column rename/drop "
                                      "or partition evolution")
    _add_common(al)
    al.add_argument("--table-dir", required=True)
    al.add_argument("--rename", default=None, metavar="OLD:NEW")
    al.add_argument("--drop-column", default=None)
    al.add_argument("--partition-by", default=None, metavar="SPEC",
                    help="evolve the partition spec, e.g. months(ts); "
                         "'none' stops partitioning new writes")
    al.set_defaults(fn=cmd_alter)
    return ap


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
