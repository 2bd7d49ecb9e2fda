"""Materialized views maintained AT INGEST: declare a rollup or an
enrichment join over a lake table and let the pipeline keep it fresh.

The reference rebuilds its derived tables from scratch on every run
(reference: pipelines/update_exposure_quantile.py — full recompute;
floodscan.py:256-258 — full join before every upsert). Here a view is a
durable incremental consumer of the base table's change feed: each
``refresh()`` reads its own fsync-atomic cursor, advances the derived
table by exactly the uncovered version window via the IVM operators
(``refresh_rollup`` / ``refresh_join``), and only then commits the
cursor — the same at-least-once + idempotent-window contract the
change-feed subscription (sources/feed.py) and the pipeline checkpoint
use, so every crash window converges:

- crash after derived commit, before cursor write → the next refresh
  re-runs the SAME window; the refresh LSN makes it a byte-identical
  overwrite (tests/test_incremental_rollup.py, test_incremental_join.py);
- base committed, view not yet refreshed → the view is behind by one
  window; the next refresh (or pipeline batch) covers it;
- a replayed ingest batch leaves the base byte-identical → the view's
  window diffs empty file sets and short-circuits on metadata alone.

First refresh on a view with no cursor BOOTSTRAPS by full recompute of
the live state (the ``index_backfill`` analog — correct even when the
base predates the view or its early snapshots are expired), then goes
incremental.

Scale shape: each refresh is the underlying IVM operator's plan —
O(changed keys), bucket-pruned scans, one MERGE into the derived
table — plus O(1) cursor I/O. A pipeline with N views adds N bounded
refreshes per micro-batch, never a full recompute.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..operators.incremental import (
    join_state,
    refresh_join,
    refresh_rollup,
    rollup_state,
)
from ..operators.merge import merge_into
from ..sources.lake import LakeTable, _atomic_write

def _cursor_path(derived: LakeTable, kind: str) -> str:
    # per-kind filename (NOT "v*.json" — the meta dir's snapshot
    # discovery globs that pattern): re-attaching a derived table to a
    # different view kind must re-bootstrap, never misread the other
    # kind's cursor schema
    return os.path.join(derived._meta_dir, f"cursor_view_{kind}.json")


def _read_cursor(derived: LakeTable, kind: str) -> dict | None:
    try:
        with open(_cursor_path(derived, kind)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def _write_cursor(derived: LakeTable, kind: str, payload: dict) -> None:
    _atomic_write(_cursor_path(derived, kind), json.dumps(payload))


_VLSN = "_view_lsn"
_VOP = "_view_op"


def _bootstrap_merge(derived: LakeTable, keys: list[str], full, lsn: int,
                     batch_id: str) -> None:
    """Full-recompute bootstrap WITH delete reconciliation: rows already
    in the derived table but absent from the recomputed full state are
    tombstoned in the same merge. Without this, a bootstrap retried
    after a crash (cursor lost, base advanced past deletes) would leave
    the vanished keys in the view forever — they never appear in any
    later change-feed window."""
    full = full.withColumn(_VLSN, F.lit(lsn).cast("long"))
    data_cols = [c for c in full.columns if c not in keys and c != _VLSN]
    types = {f.name: f.dataType for f in full.schema.fields}
    stale = derived.scan().select(*keys).join(
        full.select(*keys), on=keys, how="left_anti"
    )
    deletes = stale.select(
        *keys,
        *[F.lit(None).cast(types[c]).alias(c) for c in data_cols],
        F.lit(lsn).cast("long").alias(_VLSN),
    )
    batch = (
        full.withColumn(_VOP, F.lit("U"))
        .unionByName(deletes.withColumn(_VOP, F.lit("D")))
    )
    merge_into(derived, batch, lsn_col=_VLSN, op_col=_VOP, delete_op="D",
               batch_id=batch_id)


class RollupView:
    """``derived = base.groupBy(group_keys).agg(agg_exprs())`` kept
    fresh incrementally. ``derived`` must be merge-keyed on exactly
    ``group_keys`` (refresh_rollup's contract)."""

    def __init__(
        self,
        base: LakeTable,
        derived: LakeTable,
        group_keys: Sequence[str],
        agg_exprs: Callable[[], list[Column]],
    ):
        self.base = base
        self.derived = derived
        self.group_keys = list(group_keys)
        self.agg_exprs = agg_exprs

    KIND = "rollup"

    def _bootstrap(self) -> None:
        head = self.base.version
        full = rollup_state(
            self.base.scan(version=head), self.group_keys, self.agg_exprs
        )
        _bootstrap_merge(self.derived, self.group_keys, full, head,
                         f"viewboot-{self.derived.path}-{head}")
        _write_cursor(self.derived, self.KIND, {"base_version": head})

    def refresh(self) -> None:
        cur = _read_cursor(self.derived, self.KIND)
        if cur is None:
            self._bootstrap()
            return
        head = self.base.version
        if head == cur["base_version"]:
            return
        refresh_rollup(
            self.base, self.derived, self.group_keys, self.agg_exprs,
            from_version=cur["base_version"], to_version=head,
        )
        _write_cursor(self.derived, self.KIND, {"base_version": head})


class JoinView:
    """``derived = base ⋈ dim`` (n:1 equi-join on ``on``) kept fresh
    from BOTH tables' change feeds (refresh_join's contract: dim
    merge-keyed on ``on``, derived on the base's merge keys)."""

    def __init__(
        self,
        base: LakeTable,
        dim: LakeTable,
        derived: LakeTable,
        on: Sequence[str],
        project: Callable[[], list[Column]],
        how: str = "inner",
    ):
        self.base = base
        self.dim = dim
        self.derived = derived
        self.on = list(on)
        self.project = project
        self.how = how

    KIND = "join"

    def _bootstrap(self) -> None:
        lv, rv = self.base.version, self.dim.version
        full = join_state(
            self.base.scan(version=lv), self.dim.scan(version=rv),
            self.on, self.base.merge_keys, self.project, how=self.how,
        )
        _bootstrap_merge(self.derived, list(self.base.merge_keys), full,
                         lv + rv, f"viewboot-{self.derived.path}-{lv}.{rv}")
        _write_cursor(self.derived, self.KIND,
                      {"left_version": lv, "right_version": rv})

    def refresh(self) -> None:
        cur = _read_cursor(self.derived, self.KIND)
        if cur is None:
            self._bootstrap()
            return
        lv, rv = self.base.version, self.dim.version
        if (lv, rv) == (cur["left_version"], cur["right_version"]):
            return
        refresh_join(
            self.base, self.dim, self.derived, self.on, self.project,
            from_versions=(cur["left_version"], cur["right_version"]),
            to_versions=(lv, rv), how=self.how,
        )
        _write_cursor(self.derived, self.KIND,
                      {"left_version": lv, "right_version": rv})
