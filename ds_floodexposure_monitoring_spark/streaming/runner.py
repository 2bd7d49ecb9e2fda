"""Micro-batch CDC pipeline: plan → read → merge (dedup fused) → commit
→ checkpoint → metrics.

Deterministic batch loop with Trigger.AvailableNow semantics
(SURVEY.md §7.2): simpler and exactly-once-provable vs a long-running
Structured Streaming query on a filesystem source; a streaming adapter
over the same merge lives in streaming/stream.py. The reference analog
is the batch_size=100 polling loop (src/datasources/floodscan.py:70-87)
made transactional and resumable.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators.compact import compact, merge_append
from ..operators.merge import MergeStats, merge_into
from ..sources.changelog import ChangelogReader, MicroBatch
from ..sources.lake import LakeTable
from .checkpoint import CheckpointStore
from .lineage import MetricsLog


@dataclass
class BatchResult:
    batch: MicroBatch
    stats: MergeStats | None  # None when the batch was a detected replay
    replayed: bool
    wall_ms: float


class CDCPipeline:
    def __init__(
        self,
        spark: SparkSession,
        changelog_dir: str,
        table: LakeTable,
        checkpoint_dir: str,
        metrics_dir: str | None = None,
        max_events_per_batch: int = 1_000_000,
        target_rows_per_file: int = 2_000_000,
        mode: str = "cow",
        compact_every: int = 8,
        compact_min_files: int = 4,
        compact_mode: str = "major",
        major_every: int = 8,
        expire_every: int | None = None,
        keep_snapshots: int = 8,
        orphan_grace_sec: float = 3600.0,
        quarantine_dir: str | None = None,
        invalid_when=None,
        changelog_format: str = "parquet",
        payload_schema=None,
        indexes: dict[str, LakeTable] | None = None,
        views: list | None = None,
    ):
        """``mode``: 'cow' rewrites affected buckets per batch (read-
        optimized); 'mor' appends delta files and resolves at scan
        (write-optimized — the 10^10-scale ingest path), compacting
        every ``compact_every`` batches.

        ``compact_mode``: 'major' folds whole buckets every time;
        'tiered' runs LSM-style MINOR compactions (deltas only, base
        untouched — O(delta) writes) with every ``major_every``-th
        compaction a major — the write-amplification-bounded policy for
        sustained 10^10-event ingest (operators/compact.py).

        ``expire_every``: every N batches, expire snapshots beyond the
        newest ``keep_snapshots`` and vacuum unreferenced data files.
        Without this, sustained COW/compaction ingest strands every
        replaced file forever — at 10^10 events storage grows without
        bound. ``keep_snapshots`` must cover the replay-detection
        horizon (the checkpoint already stops older batches from being
        re-offered, and ``_committed`` caches every batch id seen this
        run, so retention only has to cover a crash-restart window).

        ``quarantine_dir``: dead-letter channel — rows with a NULL merge
        key or NULL lsn (plus any ``invalid_when`` contract predicate)
        are diverted there with a reason instead of failing the batch or
        corrupting the table; the merge sees only valid rows and metrics
        record the per-batch quarantined count (streaming/quarantine.py).
        Default None = validation off, zero extra passes over the batch.

        ``indexes``: secondary indexes maintained AT INGEST — a mapping
        of indexed column → its postings lake table (created via
        operators/secondary_index.create_index, or backfilled onto an
        existing table via index_backfill). Each batch's (value, key)
        pairs merge into every index right after the base merge, under
        the index's OWN exactly-once ledger id ``<batch_id>:ix:<col>``,
        so both crash windows converge on restart: base committed but
        index not (base replays as a no-op, the index append still
        runs), or index committed but checkpoint not (both replay as
        no-ops). Cost is O(batch) per index per batch — the same
        bounded at-ingest discipline as the LSH and IVF indexes.

        ``views``: materialized views maintained AT INGEST — a list of
        ``streaming.views.RollupView`` / ``JoinView`` objects over this
        pipeline's table. After every batch commit each view advances
        its derived table by exactly the uncovered version window (the
        IVM operators' bounded changed-keys plan) and then commits its
        own atomic cursor — at-least-once with idempotent windows, so
        every crash window converges and a replayed batch short-circuits
        on metadata. The reference's analog is the full derived-table
        rebuild each run (pipelines/update_exposure_quantile.py).

        ``changelog_format``: 'parquet' (native columnar tail) or
        'debezium'/'maxwell' — JSON-envelope files in the same
        offset-encoded shard layout, decoded by
        sources/envelope.EnvelopeChangelogReader (requires
        ``payload_schema``, the widest payload StructType). Envelope
        batches carry a ``_corrupt`` flag: with a quarantine configured
        corrupt envelopes dead-letter with reason 'corrupt envelope';
        without one the batch FAILS loudly rather than merging rows
        whose key/lsn are unparseable."""
        self.spark = spark
        if changelog_format == "parquet":
            self.reader = ChangelogReader(spark, changelog_dir, max_events_per_batch)
        elif changelog_format in ("debezium", "maxwell"):
            from ..sources.envelope import EnvelopeChangelogReader

            self.reader = EnvelopeChangelogReader(
                spark,
                changelog_dir,
                max_events_per_batch,
                dialect=changelog_format,
                payload_schema=payload_schema,
            )
        else:
            raise ValueError(f"unknown changelog_format {changelog_format!r}")
        self.table = table
        self.ckpt = CheckpointStore(checkpoint_dir)
        self.metrics = MetricsLog(spark, metrics_dir) if metrics_dir else None
        self.target_rows_per_file = target_rows_per_file
        if mode not in ("cow", "mor"):
            raise ValueError(f"unknown mode {mode!r}")
        self.mode = mode
        self.compact_every = compact_every
        self.compact_min_files = compact_min_files
        if compact_mode not in ("major", "tiered"):
            raise ValueError(f"unknown compact_mode {compact_mode!r}")
        self.compact_mode = compact_mode
        self.major_every = major_every
        self.expire_every = expire_every
        self.keep_snapshots = keep_snapshots
        self.orphan_grace_sec = orphan_grace_sec
        from .quarantine import Quarantine

        self.quarantine = Quarantine(spark, quarantine_dir) if quarantine_dir else None
        self.invalid_when = invalid_when
        self.indexes = dict(indexes or {})
        self.views = list(views or [])
        for col in self.indexes:
            if col not in table.schema().fieldNames():
                raise ValueError(f"indexed column {col!r} not in table schema")
        # replay-detection sets: O(snapshots) once at startup, O(1) per batch
        self._committed = self.table.committed_batch_ids()
        self._index_committed = {
            col: ix.committed_batch_ids() for col, ix in self.indexes.items()
        }
        # mor skew-split hint: previous batch's per-bucket winner rows
        # (AQE-style stat reuse; sizing only, never correctness)
        self._bucket_rows_hint: dict[int, int] | None = None

    def _read_clean_batch(self, batch, write_quarantine: bool):
        """Read a planned batch and apply the corrupt-envelope and
        quarantine contracts; returns (valid-rows df, n_quarantined).
        ``write_quarantine=False`` filters invalid rows WITHOUT writing
        them to the dead-letter channel — the index-recovery replay path,
        where the original run already quarantined them."""
        df = self.reader.read_batch(batch)
        # Envelope formats flag undecodable rows instead of dropping
        # them (sources/envelope.py). They must never reach the
        # merge: null key/lsn would corrupt LWW resolution.
        has_corrupt_flag = "_corrupt" in df.columns
        n_quarantined = 0
        if has_corrupt_flag and self.quarantine is None:
            if not df.where(F.col("_corrupt")).isEmpty():
                raise ValueError(
                    f"batch {batch.batch_id} contains corrupt envelopes "
                    "and no quarantine_dir is configured — refusing to "
                    "merge (configure quarantine_dir to dead-letter them)"
                )
            df = df.drop("_corrupt")
        if self.quarantine is not None:
            from .quarantine import Quarantine as _Q
            from .quarantine import invalid_reason

            reason = invalid_reason(
                self.table.merge_keys, "lsn", extra=self.invalid_when
            )
            if has_corrupt_flag:
                # corrupt outranks the null-key/null-lsn rules: the
                # row wasn't malformed data, it never parsed at all
                reason = F.when(
                    F.col("_corrupt"),
                    F.lit("corrupt envelope: unparseable or missing op"),
                ).otherwise(reason)
            if write_quarantine:
                bad = df.where(reason.isNotNull()).withColumn(_Q.REASON_COL, reason)
                n_quarantined = self.quarantine.write(bad, batch.batch_id)
                if n_quarantined:
                    df = df.where(reason.isNull())
            else:
                df = df.where(reason.isNull())
            if has_corrupt_flag:
                df = df.drop("_corrupt")
        return df, n_quarantined

    def run_once(self) -> BatchResult | None:
        """Apply the next micro-batch; None if fully caught up."""
        state = self.ckpt.read()
        batch = self.reader.plan_batch(state.offsets, state.batch_seq + 1)
        if batch is None:
            return None
        t0 = time.monotonic()

        # O(1) replay detection: cached set + the latest snapshot (covers
        # the crash window where a commit landed but no checkpoint did)
        replayed = (
            batch.batch_id in self._committed
            or self.table.current().get("batch_id") == batch.batch_id
        )
        stats: MergeStats | None = None
        n_quarantined = 0
        df = None
        if not replayed:
            df, n_quarantined = self._read_clean_batch(batch, write_quarantine=True)
            common = dict(
                op_col="op" if "op" in df.columns else None,
                batch_id=batch.batch_id,
                target_rows_per_file=self.target_rows_per_file,
            )
            if self.mode == "cow":
                stats = merge_into(self.table, df, **common)
            else:
                from ..operators.skew import plan_bucket_splits

                hint = (
                    plan_bucket_splits(
                        list(self._bucket_rows_hint.items()), self.target_rows_per_file
                    )
                    if self._bucket_rows_hint
                    else None
                )
                stats = merge_append(
                    self.table,
                    df,
                    splits_hint=hint,
                    approx_rows=batch.n_events,
                    **common,
                )
                if stats.bucket_rows:
                    self._bucket_rows_hint = stats.bucket_rows
            if self.mode == "mor" and batch.batch_seq % self.compact_every == 0:
                nth = batch.batch_seq // self.compact_every
                cmode = (
                    "minor"
                    if self.compact_mode == "tiered" and nth % self.major_every != 0
                    else "major"
                )
                compact(
                    self.table,
                    min_files_per_bucket=self.compact_min_files,
                    target_rows_per_file=self.target_rows_per_file,
                    mode=cmode,
                )
            if self.expire_every and batch.batch_seq % self.expire_every == 0:
                self.table.expire_snapshots(
                    keep_last=self.keep_snapshots,
                    orphan_grace_sec=self.orphan_grace_sec,
                )
        # secondary-index maintenance: exactly-once per (batch, index),
        # OUTSIDE the replay guard — a crash between the base commit and
        # an index commit replays the batch with the base as a no-op,
        # and only the missing index appends run
        if self.indexes:
            from ..operators.secondary_index import index_append

            for col, idx in self.indexes.items():
                ib = f"{batch.batch_id}:ix:{col}"
                if ib in self._index_committed[col]:
                    continue
                if df is None:
                    df, _ = self._read_clean_batch(batch, write_quarantine=False)
                index_append(idx, self.table, df, col, batch_id=ib)
                self._index_committed[col].add(ib)
        # materialized-view maintenance: ALSO outside the replay guard —
        # a crash between the base commit and a view's cursor write
        # replays the batch with the base as a no-op, and the view
        # re-runs its (idempotent) uncovered window; replayed batches
        # leave the base byte-identical, so the window short-circuits
        for v in self.views:
            v.refresh()
        self._committed.add(batch.batch_id)

        state.offsets = batch.offsets_after
        state.batch_seq = batch.batch_seq
        state.last_batch_id = batch.batch_id
        state.snapshot_version = self.table.version
        self.ckpt.write(state)

        wall_ms = (time.monotonic() - t0) * 1000.0
        if self.metrics is not None:
            self.metrics.append(
                {
                    "batch_seq": batch.batch_seq,
                    "batch_id": batch.batch_id,
                    "offsets_before": batch.offsets_before,
                    "offsets_after": batch.offsets_after,
                    "snapshot_version": self.table.version,
                    "events": batch.n_events,
                    "quarantined": n_quarantined,
                    "dedup_dropped": stats.dedup_dropped if stats else 0,
                    "merge_updated": getattr(stats, "updated", 0) if stats else 0,
                    "merge_inserted": getattr(stats, "inserted", 0) if stats else 0,
                    "carried_rows": getattr(stats, "carried_rows", 0) if stats else 0,
                    "files_removed": getattr(stats, "removed_files", 0) if stats else 0,
                    "files_added": stats.added_files if stats else 0,
                    "wall_ms": wall_ms,
                    "events_per_sec": batch.n_events / (wall_ms / 1000.0) if wall_ms > 0 else None,
                    "source_lag_events": batch.backlog_events,
                    "replayed": replayed,
                }
            )
        return BatchResult(batch, stats, replayed, wall_ms)

    def run_until_caught_up(self, max_batches: int | None = None) -> list[BatchResult]:
        out: list[BatchResult] = []
        while max_batches is None or len(out) < max_batches:
            r = self.run_once()
            if r is None:
                break
            out.append(r)
        return out
