"""Multi-table transactions: stage writes on per-table branches, then
publish ALL of them under one write-ahead intent with roll-forward
recovery.

The engine's base+sidecar pairs (secondary/LSH/IVF indexes, materialized
views) already CONVERGE across crash windows via per-artifact ledgers
and cursors — but between a crash and the next run, a reader can see
the base advanced and an index not. This module closes that to a
bounded, recoverable window for arbitrary table sets, the way
catalog-level lakehouses do it (Iceberg/Nessie multi-table commit):

1. **stage** — each table gets a private branch ``txn-<id>``; the
   caller writes through the branch handle with the NORMAL operators
   (merge/DML/compact all commit to ``HEAD.txn-<id>``), so main readers
   see nothing and every single-table invariant (optimistic
   concurrency, schema epochs, bucket layout validation) applies
   unchanged — this is write-audit-publish, generalized to N tables;
2. **commit** — after validating every branch fast-forwards, ONE
   fsync-atomic WAL intent records (table, branch, target version) for
   all participants — the point of no return — then each table's HEAD
   flips via the existing atomic ``publish_branch``, and the WAL entry
   is marked done;
3. **recover** — a crash anywhere after the WAL write leaves a pending
   intent; ``recover()`` rolls every participant FORWARD (idempotent:
   already-published tables are detected by version, unpublished ones
   re-publish) and marks the intent done. A crash BEFORE the WAL write
   leaves main untouched on every table — ``abort()`` (or branch
   hygiene) cleans the stage.

Guarantee — stated honestly: all-or-nothing DURABILITY (after recovery,
either every table shows the transaction or none does), with per-table
atomic visibility. It is not cross-table snapshot isolation: during the
flip sequence (or before recovery runs) a reader consulting two tables
can observe table A published and table B not yet — the same window
HEAD-pointer lakehouses have without a shared catalog pointer. The
window is bounded by the flip loop (O(tables) renames), carries no
torn single-table state, and recovery is mandatory-forward (the intent
exists ⇒ the transaction WILL complete).

Scale shape: staging cost is the writes themselves (branch heads are
one pointer file each); commit is O(tables) pointer swaps + one WAL
file; recovery is O(pending txns × tables) metadata reads. Nothing
scans data.
"""

from __future__ import annotations

import json
import os
import uuid

from .lake import CommitConflictError, LakeTable, _atomic_write


class TxnStateError(RuntimeError):
    pass


def _wal_path(wal_dir: str, txn_id: str) -> str:
    return os.path.join(wal_dir, f"txn-{txn_id}.json")


def _done_path(wal_dir: str, txn_id: str) -> str:
    return os.path.join(wal_dir, f"txn-{txn_id}.done.json")


class MultiTableTransaction:
    """One transaction instance; not thread-safe; single coordinator
    per ``wal_dir`` assumed (the local-FS single-writer discipline the
    snapshot log itself documents)."""

    def __init__(self, wal_dir: str, txn_id: str | None = None):
        self.wal_dir = wal_dir
        os.makedirs(wal_dir, exist_ok=True)
        self.txn_id = txn_id or uuid.uuid4().hex[:12]
        self.branch = f"txn-{self.txn_id}"
        self._staged: list[tuple[LakeTable, LakeTable]] = []  # (main, branch)
        self._committed = False

    def stage(self, table: LakeTable) -> LakeTable:
        """Open ``table`` for writing inside this transaction: returns
        a branch handle — use the normal operators on it. ``table``
        itself (main) stays untouched until commit."""
        if self._committed:
            raise TxnStateError("transaction already committed")
        if table.branch != "main":
            raise TxnStateError("stage() expects a main-branch handle")
        b = table.create_branch(self.branch)
        self._staged.append((table, b))
        return b

    def commit(self) -> dict:
        """Publish every staged table. Returns the WAL record."""
        if self._committed:
            raise TxnStateError("transaction already committed")
        if not self._staged:
            raise TxnStateError("nothing staged")
        # validate every branch BEFORE the point of no return: each main
        # head must be an ancestor of its branch head (publish_branch's
        # own rule), so no flip can fail for a reason we could have seen
        for main, b in self._staged:
            head, target = main.current(), b.current()
            if target["version"] == head["version"]:
                continue  # no-op participant
            by_id = {s["snapshot_id"]: s for s in main.snapshots()}
            cur = target
            while cur is not None and cur["snapshot_id"] != head["snapshot_id"]:
                cur = by_id.get(cur.get("parent"))
            if cur is None:
                raise CommitConflictError(
                    f"table {main.path}: main advanced past the staged "
                    f"branch; roll the transaction back and restage"
                )
        record = {
            "txn_id": self.txn_id,
            "branch": self.branch,
            "tables": [
                {"path": main.path, "target_version": b.version}
                for main, b in self._staged
            ],
        }
        # point of no return: after this write the transaction WILL
        # complete (here or in recover())
        _atomic_write(_wal_path(self.wal_dir, self.txn_id), json.dumps(record))
        for main, b in self._staged:
            if b.version != main.version:
                main.publish_branch(self.branch)
            else:
                main.drop_branch(self.branch)
        _atomic_write(_done_path(self.wal_dir, self.txn_id), json.dumps(record))
        os.remove(_wal_path(self.wal_dir, self.txn_id))
        self._committed = True
        return record

    def abort(self) -> None:
        """Drop every staged branch; main was never touched. Only valid
        before commit (a WAL intent must roll forward, never back)."""
        if self._committed or os.path.exists(_wal_path(self.wal_dir, self.txn_id)):
            raise TxnStateError("cannot abort after the WAL intent exists")
        for main, _ in self._staged:
            main.drop_branch(self.branch)
        self._staged.clear()


def recover(spark, wal_dir: str) -> list[dict]:
    """Roll every pending transaction FORWARD. Idempotent; call at
    coordinator startup (the checkpoint-resume analog for txns).
    Returns the records that were completed."""
    import glob

    completed = []
    for p in sorted(glob.glob(os.path.join(wal_dir, "txn-*.json"))):
        if p.endswith(".done.json"):
            continue
        with open(p) as f:
            rec = json.load(f)
        branch = rec["branch"]
        for entry in rec["tables"]:
            t = LakeTable.load(spark, entry["path"])
            if t.version >= entry["target_version"]:
                # already published before the crash; drop a leftover
                # branch pointer if the flip beat the drop
                t.drop_branch(branch)
                continue
            t.publish_branch(branch)
        _atomic_write(_done_path(wal_dir, rec["txn_id"]), json.dumps(rec))
        os.remove(p)
        completed.append(rec)
    return completed
