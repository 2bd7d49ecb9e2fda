"""Incremental materialized-rollup maintenance over lake change feeds.

The reference's core incremental semantic is "recompute only the changed
(iso3, date) slices" (reference: src/datasources/floodscan.py:196-213 —
anti-join new keys, recompute, upsert; pipelines/update_exposure_quantile.py
rebuilds a derived table from the base each run). This operator lifts that
semantic to *derived aggregate tables*: given a base :class:`LakeTable` and
a grouping spec, :func:`refresh_rollup` recomputes ONLY the groups touched
by the base table's change feed between two snapshots and MERGEs them into
the derived table — inserting new groups, updating changed ones, and
deleting groups whose last live member vanished.

Scale shape (10^10-row base table, per-batch refresh):

- ``scan_changes`` prunes untouched buckets from both snapshot scans using
  metadata only, so the change feed costs O(touched buckets), not O(table).
- the changed-group key set is bounded by the batch's row count, typically
  ≪ the total group count; the semi join against the base scan is left to
  AQE, which broadcasts the key set when it is small and falls back to a
  shuffle join when a huge batch touches many groups — either way the
  recompute reads only touched groups' rows, never re-aggregates the table.
- the derived-table MERGE then touches only the buckets holding changed
  groups (operators/merge.py bucket + key-range pruning).

The refresh is idempotent per (from_version, to_version) pair: the derived
rows carry ``to_version`` as their LSN, so replaying a refresh
last-writer-wins to the identical state, and refreshes always advance the
LSN because table versions are monotonic.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..sources.lake import LakeTable
from .merge import MergeStats, merge_into

_OP = "_rollup_op"
_LSN = "_rollup_lsn"


@dataclass(frozen=True)
class RefreshStats:
    """What one incremental refresh did."""

    changed_groups: int
    upserted_groups: int
    deleted_groups: int
    from_version: int
    to_version: int
    merge: MergeStats | None

    def to_json(self) -> dict:
        return {
            "changed_groups": self.changed_groups,
            "upserted_groups": self.upserted_groups,
            "deleted_groups": self.deleted_groups,
            "from_version": self.from_version,
            "to_version": self.to_version,
        }


def rollup_state(
    base_df: DataFrame,
    group_keys: Sequence[str],
    agg_exprs: Callable[[], list[Column]],
) -> DataFrame:
    """The full (non-incremental) rollup of a base state — the oracle the
    incremental path must converge to, and the bootstrap for an empty
    derived table."""
    return base_df.groupBy(*group_keys).agg(*agg_exprs())


def refresh_rollup(
    base: LakeTable,
    derived: LakeTable,
    group_keys: Sequence[str],
    agg_exprs: Callable[[], list[Column]],
    from_version: int,
    to_version: int | None = None,
    batch_id: str | None = None,
    target_rows_per_file: int = 2_000_000,
) -> RefreshStats:
    """Advance ``derived`` to reflect ``base`` at ``to_version``,
    recomputing only groups the change feed says were touched.

    ``agg_exprs`` is a zero-arg callable returning fresh aggregate
    Columns (Columns are plan nodes and must not be reused across
    plans); every aggregate must be aliased — the aliases are the
    derived table's data columns. ``derived`` must be merge-keyed on
    exactly ``group_keys``. Both snapshots must still be RETAINED on the
    base table: keep its expire_snapshots horizon at least as long as
    the refresh cadence (same rule as checkpoint replay detection).
    """
    keys = list(group_keys)
    if derived.merge_keys != keys:
        raise ValueError(
            f"derived table is keyed on {derived.merge_keys}, rollup groups on {keys}"
        )
    to_version = base.version if to_version is None else to_version
    if to_version == from_version:
        return RefreshStats(0, 0, 0, from_version, to_version, None)

    # Zero-change short-circuit by METADATA alone: identical data-file
    # sets between the two snapshots (e.g. compaction-only or
    # replay-detected intervals) cannot differ row-wise — no Spark job
    # needed to find out.
    old_files = {f.path for f in base.files(base.snapshot(from_version))}
    new_files = {f.path for f in base.files(base.snapshot(to_version))}
    if old_files == new_files:
        return RefreshStats(0, 0, 0, from_version, to_version, None)

    # The changed-GROUP set. When the group columns are a subset of the
    # base's merge keys they are immutable per row and the feed's images
    # name every touched group directly. Otherwise an update can MOVE a
    # row between groups and the feed's post-image alone would miss the
    # moved-FROM group — union in the from-version group values of the
    # changed merge keys. Cached either way: read twice (semi-join build
    # side, vanished-group anti join), bounded by the interval's batch
    # sizes, materialized during the merge's census pass. No separate
    # count action: changed_groups falls out of the merge stats.
    feed = base.scan_changes(from_version, to_version)
    if set(keys) <= set(base.merge_keys):
        changed = feed.select(*keys).distinct().persist()
    else:
        changed_mk = feed.select(*base.merge_keys).distinct()
        old_groups = (
            base.scan(version=from_version)
            .join(changed_mk, on=base.merge_keys, how="left_semi")
            .select(*keys)
        )
        changed = feed.select(*keys).union(old_groups).distinct().persist()
    try:
        # Recompute touched groups from the base's live state. When the
        # leading group key is the bucket key, prune the scan to the
        # touched BUCKETS first (metadata-only; the bucket set collect is
        # bounded by n_buckets) — the recompute then reads O(touched
        # files), not the table. The semi join handles the rest; no
        # broadcast hint on purpose: AQE broadcasts the changed-key side
        # when it is small (the common case) and shuffle-joins when a
        # bulk backfill touches most groups — both correct, neither
        # driver-bound.
        live_files = None
        if keys[0] == base.merge_keys[0]:
            brows = (
                changed.select(base.bucket_expr(key_col=keys[0]).alias("b"))
                .distinct()
                .collect()
            )
            bset = {r["b"] for r in brows}
            live_files = [
                f for f in base.files(base.snapshot(to_version)) if f.bucket in bset
            ]
        live = base.scan(version=to_version, files=live_files)
        affected = live.join(changed, on=keys, how="left_semi")
        recomputed = affected.groupBy(*keys).agg(*agg_exprs())
        data_cols = [c for c in recomputed.columns if c not in keys]

        # Groups whose last live row vanished: changed, no longer present.
        gone = changed.join(recomputed.select(*keys), on=keys, how="left_anti")
        agg_types = {f.name: f.dataType for f in recomputed.schema.fields}
        deletes = gone.select(
            *keys, *[F.lit(None).cast(agg_types[c]).alias(c) for c in data_cols]
        ).withColumn(_OP, F.lit("D"))

        batch = (
            recomputed.withColumn(_OP, F.lit("U"))
            .unionByName(deletes, allowMissingColumns=False)
            .withColumn(_LSN, F.lit(to_version).cast("long"))
        )
        stats = merge_into(
            derived,
            batch,
            lsn_col=_LSN,
            op_col=_OP,
            delete_op="D",
            batch_id=batch_id or f"rollup-{base.path}-{from_version}-{to_version}",
            target_rows_per_file=target_rows_per_file,
        )
    finally:
        changed.unpersist()
    return RefreshStats(
        changed_groups=stats.updated + stats.inserted + stats.deleted,
        upserted_groups=stats.updated + stats.inserted,
        deleted_groups=stats.deleted,
        from_version=from_version,
        to_version=to_version,
        merge=stats,
    )


# ------------------------------------------------------------ join views
#
# The join sibling of refresh_rollup: maintain `derived = left ⋈ dim`
# incrementally from BOTH tables' change feeds. The reference's closest
# shape is the PCODE-hierarchy enrichment it recomputes from scratch on
# every run (reference: src/datasources/floodscan.py:256-258 joins the
# zonal stats to the adm dim before every upsert); here the join view is
# itself a lake table advanced by snapshot-diff deltas — the standard
# incremental-view-maintenance delta rule for n:1 equi-joins
# (dV = dL ⋈ R  ∪  L ⋈ dR), specialized to LWW state tables where
# "recompute the affected keys from live state" subsumes both terms.

_JLSN = "_join_lsn"


@dataclass(frozen=True)
class RefreshJoinStats:
    """What one incremental join refresh did."""

    changed_keys: int
    upserted_rows: int
    deleted_rows: int
    from_versions: tuple[int, int]
    to_versions: tuple[int, int]
    merge: MergeStats | None

    def to_json(self) -> dict:
        return {
            "changed_keys": self.changed_keys,
            "upserted_rows": self.upserted_rows,
            "deleted_rows": self.deleted_rows,
            "from_versions": list(self.from_versions),
            "to_versions": list(self.to_versions),
        }


def join_state(
    left_df: DataFrame,
    right_df: DataFrame,
    on: Sequence[str],
    left_keys: Sequence[str],
    project: Callable[[], list[Column]],
    how: str = "inner",
) -> DataFrame:
    """The full (non-incremental) join view of two live states — the
    oracle the incremental path must converge to, and the bootstrap for
    an empty derived table. Columns: ``left_keys`` + the projection."""
    return left_df.join(right_df, on=list(on), how=how).select(
        *left_keys, *project()
    )


def refresh_join(
    left: LakeTable,
    right: LakeTable,
    derived: LakeTable,
    on: Sequence[str],
    project: Callable[[], list[Column]],
    from_versions: tuple[int, int],
    to_versions: tuple[int, int] | None = None,
    how: str = "inner",
    batch_id: str | None = None,
    target_rows_per_file: int = 2_000_000,
) -> RefreshJoinStats:
    """Advance ``derived`` to reflect ``left ⋈ right`` (equi-join on
    ``on``) at ``to_versions``, recomputing ONLY the left keys either
    feed says were touched.

    Contract:

    - ``right.merge_keys == tuple(on)`` — the dim is unique per join
      key, so each left row yields at most one output row and the view
      can be keyed on the LEFT table's merge keys;
    - ``derived.merge_keys == left.merge_keys``;
    - ``project`` is a zero-arg callable returning fresh aliased
      Columns over the joined frame (same discipline as
      ``refresh_rollup``'s ``agg_exprs``); the derived table's data
      columns are exactly those aliases;
    - ``how`` is ``'inner'`` (a left row with no dim match has no view
      row — dim deletes DELETE from the view) or ``'left'`` (the view
      keeps every live left row; dim deletes null the dim columns).

    Affected-key algebra (the IVM delta rule for n:1 joins, on LWW
    state): a view row can change only if (a) its left row changed —
    named directly by the left feed's key images, including deletes —
    or (b) its dim row changed — the left rows holding a changed join
    value, found by ONE semi join of the live left state against the
    right feed's key set (dim-update fanout: inherent to the
    maintenance problem, bounded by the hot key's row count). Keys
    affected but absent from the recomputed join (left row deleted, or
    inner match lost) become view DELETEs.

    Scale shape: both change feeds are metadata-bucket-pruned snapshot
    diffs; when the join column is the left table's bucket key (the
    common fact⋈dim case) the live-left scans are pruned to the buckets
    holding changed keys/values — O(touched files), never O(table); the
    derived MERGE then touches only the buckets holding changed keys.
    The refresh LSN is ``to_left + to_right`` — strictly monotone across
    refreshes and identical on replay, so redelivery of a refresh
    last-writer-wins to the identical state.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    on = list(on)
    if list(right.merge_keys) != on:
        raise ValueError(
            f"right table must be merge-keyed on the join columns: "
            f"keys {right.merge_keys} vs on {on}"
        )
    lkeys = list(left.merge_keys)
    if list(derived.merge_keys) != lkeys:
        raise ValueError(
            f"derived table is keyed on {derived.merge_keys}, "
            f"the join view on the left table's keys {lkeys}"
        )
    lv0, rv0 = from_versions
    to_versions = (
        (left.version, right.version) if to_versions is None else to_versions
    )
    lv1, rv1 = to_versions

    def _files(t: LakeTable, v: int) -> set[str]:
        return {f.path for f in t.files(t.snapshot(v))}

    if lv1 == lv0 and rv1 == rv0:
        return RefreshJoinStats(0, 0, 0, from_versions, to_versions, None)
    # metadata-only zero-change short-circuit (both sides)
    if _files(left, lv0) == _files(left, lv1) and _files(right, rv0) == _files(
        right, rv1
    ):
        return RefreshJoinStats(0, 0, 0, from_versions, to_versions, None)

    # dl_keys flows only into `changed` (itself persisted below), so the
    # full left diff executes exactly once — no persist needed. dr_vals
    # is read twice (the bucket-set hash job and, via the fanout semi
    # join, `changed`'s materialization): persist the tiny dim key image
    # so the dim diff is not recomputed.
    dl_keys = left.scan_changes(lv0, lv1).select(*lkeys).distinct()
    dr_vals = (
        right.scan_changes(rv0, rv1).select(*on).distinct().persist()
    )

    # Bucket-prune the live-left scans when the join column IS the left
    # bucket key: every affected row lives in a bucket named by either
    # changed-key set. The LEFT side's buckets come from METADATA alone
    # — scan_changes prunes to buckets whose file sets differ, so every
    # dl key's bucket is in that set by construction; hashing dl_keys
    # through a Spark job would execute the full left diff just to
    # rediscover it. Only the dim feed's changed join values need the
    # hash job (their left bucket is hash(value), unknowable from left
    # metadata); that feed is the small side by the n:1 contract.
    live_files = None
    if on[0] == lkeys[0]:
        by_b: dict[int, list[set, set]] = {}
        for i, v in enumerate((lv0, lv1)):
            for d in left.snapshot(v)["files"]:
                by_b.setdefault(d["bucket"], [set(), set()])[i].add(d["path"])
        bset = {b for b, (o, n) in by_b.items() if o != n}
        if _files(right, rv0) != _files(right, rv1):
            brows = (
                dr_vals.select(left.bucket_expr(key_col=on[0]).alias("b"))
                .distinct()
                .collect()
            )
            bset |= {r["b"] for r in brows}
        live_files = [
            f for f in left.files(left.snapshot(lv1)) if f.bucket in bset
        ]

    def _live_left() -> DataFrame:
        return left.scan(version=lv1, files=live_files)

    # changed KEY set = left-feed keys (covers left inserts/updates/
    # deletes) ∪ keys of live rows holding a changed join value (dim
    # fanout). Persisted: read as the recompute's semi-join build side
    # and again by the vanished-key anti join; bounded by the interval's
    # change volume plus the dim fanout.
    fanout_keys = _live_left().join(dr_vals, on=on, how="left_semi").select(*lkeys)
    changed = dl_keys.union(fanout_keys).distinct().persist()
    try:
        affected = _live_left().join(changed, on=lkeys, how="left_semi")
        recomputed = affected.join(
            right.scan(version=rv1), on=on, how=how
        ).select(*lkeys, *project())
        data_cols = [c for c in recomputed.columns if c not in lkeys]

        gone = changed.join(recomputed.select(*lkeys), on=lkeys, how="left_anti")
        out_types = {f.name: f.dataType for f in recomputed.schema.fields}
        deletes = gone.select(
            *lkeys,
            *[F.lit(None).cast(out_types[c]).alias(c) for c in data_cols],
        ).withColumn(_OP, F.lit("D"))

        batch = (
            recomputed.withColumn(_OP, F.lit("U"))
            .unionByName(deletes, allowMissingColumns=False)
            .withColumn(_JLSN, F.lit(lv1 + rv1).cast("long"))
        )
        stats = merge_into(
            derived,
            batch,
            lsn_col=_JLSN,
            op_col=_OP,
            delete_op="D",
            batch_id=batch_id
            or f"joinview-{left.path}-{lv0}.{rv0}-{lv1}.{rv1}",
            target_rows_per_file=target_rows_per_file,
        )
    finally:
        changed.unpersist()
        dr_vals.unpersist()
    return RefreshJoinStats(
        changed_keys=stats.updated + stats.inserted + stats.deleted,
        upserted_rows=stats.updated + stats.inserted,
        deleted_rows=stats.deleted,
        from_versions=from_versions,
        to_versions=to_versions,
        merge=stats,
    )
