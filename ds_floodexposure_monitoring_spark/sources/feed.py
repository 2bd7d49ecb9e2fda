"""Durable change-feed subscription: a per-consumer cursor over a
LakeTable's snapshot-diff change feed — the consumer-group analog for
the lake-as-a-source story (the pull twin of the Debezium export in
sources/envelope.py).

``scan_changes`` (sources/lake.py) answers "what changed between two
snapshots" statelessly; every downstream consumer — an incremental
rollup, a search-index refresher, a replica tailer — still has to
REMEMBER which snapshot it last processed, survive its own crashes, and
never double-apply or skip a window. That bookkeeping is this module:

- the cursor is one JSON file per (feed dir, consumer id), written with
  the same fsync+rename atomic discipline as table HEADs — a torn write
  cannot exist, a crash leaves either the old or the new position;
- ``poll`` returns the diff ``(position, head]`` plus an ``ack``
  callback; the cursor advances ONLY on ack, so a consumer that crashes
  mid-processing re-polls the SAME window (at-least-once), and because
  each window is a snapshot diff keyed by version range, a consumer
  whose side effects are idempotent per (from_version, to_version) gets
  exactly-once end-to-end — the identical contract CDCPipeline uses for
  its own batches (checkpoint advances after commit; replay detected by
  batch id);
- ack validates it matches the outstanding poll (a stale or reordered
  ack raises instead of silently skipping a window);
- a consumer that falls behind snapshot retention gets a LOUD
  ``FeedLagError`` (its from-version is no longer retained, the diff
  base is gone) — the Kafka offset-out-of-range analog; recovery is an
  explicit ``reset`` to a retained version plus whatever backfill the
  consumer's semantics need. Never silent data loss.

Scale shape: a poll is exactly one ``scan_changes`` — metadata bucket
pruning first, then one key-partitioned diff join over touched buckets
only — plus O(1) driver-side cursor I/O. A thousand consumers are a
thousand tiny JSON files, not a thousand table scans of state.

Reference parity: the reference's consumers re-read whole blob outputs
every poll and keep no position at all (reference:
src/datasources/floodscan.py:60-110); this module is that polling loop
made resumable and exactly-once.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame

from .lake import LakeTable, _atomic_write


class FeedLagError(RuntimeError):
    """The consumer's acknowledged position predates snapshot retention:
    the diff base is gone, so the next window cannot be computed. Reset
    explicitly; do not guess."""


@dataclass
class FeedBatch:
    """One polled change window. ``df`` is ``scan_changes(from_version,
    to_version)`` — merge keys + post-image (pre-image for deletes) +
    change_type + change_lsn. Call ``ack()`` after the window's effects
    are durable; only then does the next poll move forward."""

    df: DataFrame
    from_version: int
    to_version: int
    ack: Callable[[], None] = field(repr=False)


class FeedCursor:
    """Durable per-consumer position over a table's change feed.

    ``dir_path`` holds one ``<consumer_id>.json`` per consumer; create
    one FeedCursor per (consumer, table) pair. The table handle is
    passed per call so a cursor file outlives any session.
    """

    def __init__(self, dir_path: str, consumer_id: str = "default"):
        if not consumer_id or "/" in consumer_id:
            raise ValueError(f"bad consumer_id {consumer_id!r}")
        self.dir = dir_path
        self.consumer_id = consumer_id
        os.makedirs(dir_path, exist_ok=True)
        self._path = os.path.join(dir_path, f"{consumer_id}.json")
        self._outstanding: tuple[int, int] | None = None

    # ------------------------------------------------------------ state
    def position(self) -> int | None:
        """Last acknowledged snapshot version; None before first ack."""
        if not os.path.exists(self._path):
            return None
        with open(self._path) as f:
            return int(json.load(f)["version"])

    def reset(self, version: int) -> None:
        """Explicitly move the cursor (initial placement, or recovery
        after FeedLagError). The version must be retained NOW so the
        next poll has a diff base."""
        self._outstanding = None
        self._write(version)

    def _write(self, version: int) -> None:
        _atomic_write(
            self._path,
            json.dumps(
                {
                    "consumer_id": self.consumer_id,
                    "version": int(version),
                    "acked_at": time.time(),
                }
            ),
        )

    # ------------------------------------------------------------- poll
    def poll(self, table: LakeTable, to_version: int | None = None):
        """Next change window ``(position, head]`` as a FeedBatch, or
        None when caught up. A consumer with no position yet starts at
        the table's OLDEST retained snapshot (full history replay —
        Kafka ``auto.offset.reset=earliest``); use ``reset(head)`` first
        for latest-only semantics."""
        head = table.version if to_version is None else to_version
        retained = sorted(s["version"] for s in table.snapshots())
        pos = self.position()
        if pos is None:
            pos = retained[0]
            self._write(pos)
        if pos >= head:
            return None
        if pos not in retained:
            raise FeedLagError(
                f"consumer {self.consumer_id!r} is at version {pos}, no "
                f"longer retained (oldest retained: {retained[0]}); the "
                "change-feed base is gone — reset() to a retained version "
                "and backfill"
            )
        df = table.scan_changes(pos, head)
        self._outstanding = (pos, head)

        def ack() -> None:
            if self._outstanding != (pos, head):
                raise RuntimeError(
                    f"stale ack for window ({pos}, {head}]: outstanding "
                    f"window is {self._outstanding}"
                )
            on_disk = self.position()
            if on_disk != pos:
                # another process (a restarted consumer) advanced the
                # cursor while this poll was in flight — acking would
                # regress or double-count; the window was already handled
                self._outstanding = None
                raise RuntimeError(
                    f"stale ack for window ({pos}, {head}]: cursor on "
                    f"disk has moved to {on_disk}"
                )
            self._write(head)
            self._outstanding = None

        return FeedBatch(df, pos, head, ack)

    # ------------------------------------------------------- convenience
    @staticmethod
    def list_consumers(dir_path: str) -> dict[str, int]:
        """{consumer_id: acked version} for every cursor in the dir."""
        out: dict[str, int] = {}
        if not os.path.isdir(dir_path):
            return out
        for name in sorted(os.listdir(dir_path)):
            if name.endswith(".json") and ".tmp." not in name:
                with open(os.path.join(dir_path, name)) as f:
                    d = json.load(f)
                out[d["consumer_id"]] = int(d["version"])
        return out
