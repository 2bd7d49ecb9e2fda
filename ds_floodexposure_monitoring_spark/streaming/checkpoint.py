"""Exactly-once two-phase coordination: snapshot commit + checkpoint.

Protocol (SURVEY.md §7.1.9):

1. plan batch deterministically from the checkpointed offsets;
2. MERGE commits a snapshot that *embeds the batch_id* (a stable hash
   of the consumed offset ranges — sources/changelog.py);
3. only then is the checkpoint advanced (atomic ``os.replace``).

Crash windows:
- crash before the snapshot commit → resume replans the identical batch
  (same offsets in the checkpoint, deterministic planner) and applies it
  normally — nothing was lost;
- crash between snapshot commit and checkpoint write → resume replans
  the identical batch, sees its batch_id already among the table's
  committed snapshots, skips the apply, and just advances the
  checkpoint — nothing is double-applied.

This mirrors the reference's idempotent skip-if-processed guard
(reference: src/datasources/floodscan.py:101-107) upgraded from
per-key skip to per-batch transactional replay detection.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field


@dataclass
class CheckpointState:
    offsets: dict[int, int] = field(default_factory=dict)  # shard -> last consumed seq
    batch_seq: int = 0
    last_batch_id: str | None = None
    snapshot_version: int | None = None

    def to_json(self) -> dict:
        return {
            "offsets": {str(k): v for k, v in self.offsets.items()},
            "batch_seq": self.batch_seq,
            "last_batch_id": self.last_batch_id,
            "snapshot_version": self.snapshot_version,
        }

    @staticmethod
    def from_json(d: dict) -> "CheckpointState":
        return CheckpointState(
            offsets={int(k): v for k, v in d.get("offsets", {}).items()},
            batch_seq=d.get("batch_seq", 0),
            last_batch_id=d.get("last_batch_id"),
            snapshot_version=d.get("snapshot_version"),
        )


class CheckpointStore:
    """Atomic single-file checkpoint with a retained history."""

    def __init__(self, path: str):
        self.dir = os.path.abspath(path)
        os.makedirs(self.dir, exist_ok=True)
        self._current = os.path.join(self.dir, "checkpoint.json")

    def read(self) -> CheckpointState:
        if not os.path.exists(self._current):
            return CheckpointState()
        with open(self._current) as f:
            return CheckpointState.from_json(json.load(f))

    def write(self, state: CheckpointState) -> None:
        data = json.dumps(state.to_json(), indent=1)
        hist = os.path.join(self.dir, f"ckpt-{state.batch_seq:08d}.json")
        tmp = f"{hist}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, hist)
        tmp2 = f"{self._current}.tmp.{uuid.uuid4().hex}"
        with open(tmp2, "w") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp2, self._current)
