"""GDPR erase cascade: remove every trace of a key list from a base
table AND its derived index sidecars, then optionally expire the
snapshots that could still time-travel to the erased data.

The engine maintains three kinds of incremental index tables (secondary
postings, MinHash-LSH bands, IVF ANN postings). Erasing a user from the
base table alone is NOT erasure: the secondary index stores the indexed
column VALUES keyed by the user's rows, the LSH index stores
content-derived band hashes per doc, and the ANN index stores quantized
embeddings per vec id — all personal data under a deletion request. The
reference has no indexes and handles removal by wholesale table replace
(reference: src/datasources/codab.py:42-48 ``if_exists="replace"``);
this module is the surgical, file-granular form that composes with the
index family.

Three layers, matching how lakehouse engines implement "right to be
forgotten":

1. :func:`erase_rows` — physical removal of EVERY row version (live,
   superseded, tombstoned) whose ``col`` is in the doomed set, from any
   lake table. File-granular: only files that might hold a doomed value
   are rewritten verbatim-minus-doomed (raw scan, no LWW fold, manifest
   base/delta flags preserved); absence is proven per file by bucket
   hash + key range + manifest key bloom when ``col`` is the bucket
   key, else by per-file column stats when ``col`` is a tracked stat
   column. Unprovable files are rewritten — sound, never silent.
2. :func:`erase_cascade` — orchestrates 1 across the base and each
   registered sidecar in one call, each under its own atomic commit.
3. snapshot expiry — after the rewrites, prior snapshots still resolve
   the erased rows (time travel is the lake's whole point, and GDPR's
   enemy); ``expire_keep_last`` runs ``expire_snapshots`` on every
   touched table so expired versions and their replaced files are
   physically deleted.

Scale shape at 10^10 rows: erasing K users rewrites O(K) files in the
base (bloom-pruned), O(K) files in each sidecar whose doc column is a
tracked stat column (the index creators declare it), and the commit is
one optimistic-concurrency swap per table. Nothing scans O(table)
except an index created WITHOUT stats on its doc column — which is
rewritten in full, honestly.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from dataclasses import dataclass, field

from pyspark.sql import functions as F

from ..sources.lake import DataFile, LakeTable
from .dml import DmlStats, _reject_partial_update, _rewrite_verbatim


def _files_maybe_containing(
    table: LakeTable, col: str, vals: list, snapshot: dict
) -> list[DataFile]:
    """Files that COULD hold a row with ``col`` in ``vals`` — sound
    pruning only (a dropped file provably contains none)."""
    if col == table.merge_keys[0]:
        return table.prune_for_keys(vals, snapshot=snapshot)
    tracked = col in snapshot.get("stat_cols", [])
    # manifest stats live in _stat_scalar basis (timestamps as epoch
    # micros) — normalize the probe values the same way
    nvals = [table._bound_scalar(v) for v in vals]
    out = []
    for f in table.files(snapshot):
        if tracked and f.col_stats and col in f.col_stats:
            mn, mx = f.col_stats[col]
            if not any(mn <= v <= mx for v in nvals):
                continue  # proven absent
        out.append(f)
    return out


def erase_rows(
    table: LakeTable,
    col: str,
    vals: Sequence,
    target_rows_per_file: int = 2_000_000,
) -> DmlStats | None:
    """Physically remove EVERY row version where ``col`` ∈ ``vals``.

    Unlike ``delete_matching`` (the live-state DELETE), this is the
    erasure primitive: it strips superseded versions and tombstones too,
    works on ANY column (not just the bucket key), and reports matched =
    raw row versions removed. The rewrite is verbatim-minus-doomed per
    file (raw scan, ``resolve=False``), so resolution state and the
    base/delta manifest flags carry through unchanged — identical
    discipline to the pointwise GDPR path in ``operators/dml.py``."""
    _reject_partial_update(table, "erase_rows")
    schema = table.schema()
    if col not in schema.fieldNames():
        raise ValueError(f"column {col!r} not in table schema")
    vals = [v for v in vals if v is not None]
    if not vals:
        return None
    # type-family guard: a string probe against a numeric column (or
    # vice versa) can never match — isin() would silently erase nothing
    # while the caller believes the GDPR request succeeded. Fail loudly;
    # the caller must map ids into the sidecar's key space first.
    dt = schema[col].dataType.simpleString()
    integral = dt in ("bigint", "int", "smallint", "tinyint")
    if integral and not all(isinstance(v, int) and not isinstance(v, bool) for v in vals):
        raise TypeError(
            f"column {col!r} is {dt} but the erase values include "
            f"non-integers — map the ids into this table's key space"
        )
    if dt == "string" and not all(isinstance(v, str) for v in vals):
        raise TypeError(
            f"column {col!r} is string but the erase values include "
            f"non-strings — map the ids into this table's key space"
        )
    cur = table.current()
    victims = _files_maybe_containing(table, col, vals, cur)
    if not victims:
        return None

    # one bounded count over just the victim files: if nothing actually
    # matches (bloom false positive, already-erased rerun), return None
    # with no rewrite and no commit — the cascade is re-runnable
    doomed = (
        table.scan(files=victims, include_internal=True, resolve=False)
        .where(F.col(col).isin(list(vals)))
        .count()
    )
    if doomed == 0:
        return None

    keep = ~F.coalesce(F.col(col).isin(list(vals)), F.lit(False))
    return _rewrite_verbatim(
        table, victims, keep, "erase",
        summary_extra={
            "erase_col": col,
            "rows_erased": doomed,
            "files_inspected": len(victims),
        },
        target_rows_per_file=target_rows_per_file,
        expected_removed=doomed,
    )


@dataclass(frozen=True)
class EraseReport:
    """What one cascade did, per table."""

    base: DmlStats | None
    sidecars: dict = field(default_factory=dict)  # label -> DmlStats | None
    expired: dict | None = None  # label -> expire_snapshots report

    def to_json(self) -> dict:
        def _d(s):
            return None if s is None else {
                "files_rewritten": s.files_removed,
                "rows_erased": s.rows_matched,
                "version": s.snapshot_version,
            }

        return {
            "base": _d(self.base),
            "sidecars": {k: _d(v) for k, v in self.sidecars.items()},
            "expired": self.expired,
        }


def erase_cascade(
    base: LakeTable,
    vals: Sequence,
    sidecars: Mapping[str, tuple] = (),
    expire_keep_last: int | None = None,
    orphan_grace_sec: float = 0.0,
    target_rows_per_file: int = 2_000_000,
) -> EraseReport:
    """Erase ``vals`` (first-merge-key values) from ``base`` and every
    sidecar, then optionally expire history on all touched tables.

    ``sidecars`` maps a label to ``(table, col)`` — erase the same
    ``vals`` from ``table`` where ``col`` matches — or
    ``(table, col, mapped_vals)`` when the sidecar keys rows by a
    different id space (e.g. the LSH index's long ``doc_id`` for a
    string conversation key).

    ``expire_keep_last``: when set, run
    ``expire_snapshots(keep_last=...)`` on base and every sidecar AFTER
    the rewrites, physically deleting the replaced files — without
    this, time travel (and any change-feed consumer within retention)
    can still read the erased rows; with it, consumers behind the
    horizon get a loud ``FeedLagError`` instead of resurrected data.
    Each table's erase is its own atomic commit: the cascade is not
    transactional across tables, but each step is idempotent (re-running
    the cascade converges — an already-erased table reports None)."""
    base_stats = erase_rows(
        base, base.merge_keys[0], vals, target_rows_per_file=target_rows_per_file
    )
    side_stats: dict[str, DmlStats | None] = {}
    tables: dict[str, LakeTable] = {"base": base}
    for label, spec in dict(sidecars).items():
        t, col, *rest = spec
        svals = rest[0] if rest else vals
        side_stats[label] = erase_rows(
            t, col, svals, target_rows_per_file=target_rows_per_file
        )
        tables[label] = t
    expired = None
    if expire_keep_last is not None:
        expired = {
            label: t.expire_snapshots(
                keep_last=expire_keep_last, orphan_grace_sec=orphan_grace_sec
            )
            for label, t in tables.items()
        }
    return EraseReport(base=base_stats, sidecars=side_stats, expired=expired)
