"""Row-level DML: predicate DELETE and UPDATE over lake tables.

The Iceberg ``DELETE FROM ... WHERE`` / ``UPDATE ... SET`` analog (the
reference's closest shape is the wholesale rebuild of derived tables —
codab.py:42-48 ``if_exists="replace"`` — which can't express "remove
these rows"; this is the surgical form a GDPR erasure or correction run
needs).

Two physical strategies, same logical semantics (Iceberg's
copy-on-write vs merge-on-read table modes):

- **Copy-on-write** (``delete_where`` / ``update_where`` /
  ``delete_matching``): one planning pass finds the buckets that hold
  matching live rows (the collect is bounded by ``n_buckets``, never
  row count), only those buckets' files are rewritten with the
  predicate applied, and the commit swaps the file lists atomically
  with optimistic concurrency. Untouched buckets — at 10^10 rows,
  almost all of them — carry over by metadata reference only. Read
  cost afterwards: zero (files stay resolved).
- **Merge-on-read** (``delete_where_mor`` / ``update_where_mor``):
  write cost proportional to MATCHED ROWS, not to the touched buckets'
  total rows — corrections are appended as delta rows carrying the
  original row's LSN plus a bumped ``_dml_seq`` (Iceberg
  sequence-number analog); scan-time LWW resolves ``(lsn, seq)`` so
  the correction wins over the stored original AND over any exact
  redelivery of the pre-correction event, while a genuinely newer CDC
  event (higher LSN) still beats the correction. Compaction folds the
  deltas and physically erases corrected-away rows. This is the path
  for a broad-predicate correction over a 10^10-row table, where COW
  would rewrite nearly every bucket.

Tombstone rows ride through rewrites unchanged so out-of-order CDC
ordering guards survive; COW DELETE removes live rows physically (the
erasure semantic), MOR DELETE removes them physically at compaction.
Either way a later change event for the same key re-inserts the key as
a fresh row, which is standard CDC behavior.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, Observation
from pyspark.sql import functions as F

from ..sources.lake import DML_SEQ_COL, TOMBSTONE_COL, LakeTable
from .merge import _check_write_consistency
from .skew import plan_bucket_splits, with_salted_split


@dataclass(frozen=True)
class DmlStats:
    buckets_rewritten: int
    files_removed: int
    files_added: int
    rows_matched: int
    snapshot_version: int


def _reject_partial_update(table: LakeTable, op: str) -> None:
    """DML on partial-update tables is not supported yet: corrections
    would need PER-FIELD dml_seq ordering (the row-level ``_dml_seq``
    that makes LWW DML redelivery-proof has no per-field analog here
    yet), and MOR tombstones have no defined fold against per-field
    LSNs. Fail loudly rather than corrupt the fold."""
    if table.current().get("merge_engine", "lww") != "lww":
        raise NotImplementedError(
            f"{op} is not supported on merge_engine='partial-update' "
            "tables; use the default LWW engine for retraction/DML "
            "workloads"
        )


def _alive() -> Column:
    return ~F.coalesce(F.col(TOMBSTONE_COL), F.lit(False))


def _pruned_files(table: LakeTable, condition) -> list | None:
    """File list for the planning/census scan, stat-pruned when the
    predicate was given as SQL text (Column objects are opaque — no
    robust way to read their tree pre-analysis, so they scan all files).
    Pruning is metadata-only and sound on both COW and MOR snapshots
    (LakeTable.prune_for_predicate documents the granularity rules)."""
    if not isinstance(condition, str):
        return None
    return table.prune_for_predicate(condition)


def _plan(
    table: LakeTable, cond: Column, files: list | None = None
) -> tuple[dict[int, int], int]:
    """({bucket holding live matches: match count}, live match count) —
    one Spark job, ≤ n_buckets rows to the driver. ``files`` narrows the
    census to a stat-pruned file set (predicate-implied; see
    _pruned_files) so a selective predicate on a stats column reads only
    the files that can hold matches, not the whole table."""
    rows = (
        table.scan(files=files)
        .where(cond)
        .groupBy(table.bucket_expr().alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return {r["b"]: r["n"] for r in rows}, sum(r["n"] for r in rows)


def _rewrite(
    table: LakeTable,
    buckets: set[int],
    matched: int,
    transform,
    operation: str,
    target_rows_per_file: int,
) -> DmlStats:
    cur = table.current()
    victims = [f for f in table.files(cur) if f.bucket in buckets]
    df = table.scan(files=victims, include_internal=True)
    out = transform(df).withColumn("b", table.bucket_expr())
    obs = Observation()
    out = out.observe(obs, F.count(F.lit(1)).alias("rows"))
    per_bucket: dict[int, int] = {}
    for f in victims:
        per_bucket[f.bucket] = per_bucket.get(f.bucket, 0) + f.rows
    splits = plan_bucket_splits(list(per_bucket.items()), target_rows_per_file)
    to_write = with_salted_split(out, "b", splits, salt_cols=table.merge_keys)
    new_files = table.write_data_files(
        to_write, table.schema(cur), cur["schema_version"], sort_by=table.merge_keys,
        mark_base=True,
    )
    _check_write_consistency(int(obs.get["rows"]), new_files)

    # rewritten buckets come out resolved; the table stays
    # requires_resolve only if some untouched bucket still holds deltas
    by_bucket: dict[int, int] = {}
    for f in table.files(cur):
        by_bucket[f.bucket] = by_bucket.get(f.bucket, 0) + 1
    leftover_multi = any(n >= 2 for b, n in by_bucket.items() if b not in buckets)
    snap = table.commit_retrying(
        {f.path for f in victims},
        new_files,
        operation=operation,
        requires_resolve=cur.get("requires_resolve", False) and leftover_multi,
        validation="rewrite",
        expected_parent_version=cur["version"],
        summary_extra={"buckets_rewritten": len(buckets), "rows_matched": matched},
    )
    return DmlStats(
        buckets_rewritten=len(buckets),
        files_removed=len(victims),
        files_added=len(new_files),
        rows_matched=matched,
        snapshot_version=snap["version"],
    )


def delete_where(
    table: LakeTable,
    condition: Column | str,
    target_rows_per_file: int = 2_000_000,
) -> DmlStats | None:
    """Physically remove every live row matching ``condition``.

    Returns None (no commit) when nothing matches. Tombstone rows are
    preserved verbatim so CDC ordering guards survive the rewrite."""
    _reject_partial_update(table, "delete_where")
    cond = F.expr(condition) if isinstance(condition, str) else condition
    buckets, matched = _plan(table, cond, files=_pruned_files(table, condition))
    if not buckets:
        return None

    def transform(df):
        doomed = _alive() & F.coalesce(cond, F.lit(False))
        return df.where(~doomed)

    return _rewrite(table, buckets, matched, transform, "delete-where", target_rows_per_file)


def delete_matching(
    table: LakeTable,
    keys_df,
    key_col: str | None = None,
    target_rows_per_file: int = 2_000_000,
    max_pointwise_keys: int = 1024,
) -> DmlStats | None:
    """DELETE by key set (the ``DELETE WHERE key IN (SELECT …)`` form —
    the realistic GDPR shape: erase a LIST of conversation/user ids).

    ``keys_df`` is a one-column DataFrame of first-merge-key values.
    Small key sets (≤ ``max_pointwise_keys`` after distinct) take the
    FILE-granular path: the doomed files come from
    ``prune_for_keys`` (bucket + min/max range + manifest key bloom),
    so at 10^10 rows erasing K conversations rewrites the O(K) files
    that can actually hold them — not K whole buckets (the bloom is
    what beats range pruning when same-bucket delta files all span the
    keyspace). The rewrite is VERBATIM-minus-doomed-rows per file (raw
    scan, no LWW fold), so resolution state is untouched and no key
    closure is needed; base/delta manifest flags are preserved.

    Larger key sets fall back to the bucket-granular path: touched
    buckets come from hashing the key set itself (distinct over
    ≤ n_buckets values — never a table scan), the rewrite is a LEFT ANTI
    join of just those buckets' resolved rows against the key set, and
    every other bucket carries over by metadata reference. The key set
    may be arbitrarily large — it stays distributed throughout (AQE
    broadcasts it when small). Unlike delete_where, matching TOMBSTONES
    are erased too (both paths): GDPR erasure removes every trace of
    the key, accepting that a still-in-flight older event for it would
    re-insert (standard CDC semantics, same as the live-row case)."""
    _reject_partial_update(table, "delete_matching")
    # key_col names the column IN keys_df; joins always run under the
    # table's first merge-key name
    key0 = table.merge_keys[0]
    src_col = key_col or key0
    keys = keys_df.select(F.col(src_col).alias(key0)).distinct()
    head = keys.limit(max_pointwise_keys + 1).collect()
    if not head:
        return None
    if len(head) <= max_pointwise_keys:
        vals = [r[key0] for r in head if r[key0] is not None]
        if not vals:
            return None
        return _delete_matching_pointwise(table, vals, target_rows_per_file)
    bucket_rows = (
        keys.select(table.bucket_expr(key_col=key0).alias("b")).distinct().collect()
    )
    buckets = {r["b"] for r in bucket_rows}
    if not buckets:
        return None
    victims_exist = any(f.bucket in buckets for f in table.files())
    if not victims_exist:
        return None
    # exact live-match count, restricted to the touched buckets' files
    cur = table.current()
    vfiles = [f for f in table.files(cur) if f.bucket in buckets]
    matched = (
        table.scan(files=vfiles)
        .join(keys, on=key0, how="left_semi")
        .count()
    )

    def transform(df):
        doomed = df.join(keys, on=key0, how="left_anti")
        return doomed

    return _rewrite(table, buckets, matched, transform, "delete-matching", target_rows_per_file)


def _rewrite_verbatim(
    table: LakeTable,
    victims: list,
    keep: Column,
    operation: str,
    summary_extra: dict,
    target_rows_per_file: int,
    expected_removed: int | None = None,
) -> DmlStats:
    """Rewrite ``victims`` verbatim-minus-rows-failing-``keep``: raw
    scan (``resolve=False``, no LWW fold — a key's version chain may
    extend outside the subset), base and delta groups written separately
    so each rewritten file keeps its manifest flag, one atomic commit.
    Shared engine of the pointwise GDPR delete and ``erase_rows``.
    ``expected_removed``: raise if the rewrite didn't drop exactly this
    many rows (the erase-consistency invariant)."""
    cur = table.current()
    new_files = []
    total_in = sum(f.rows for f in victims)
    total_out = 0
    for mark_base in (True, False):
        group = [f for f in victims if f.base == mark_base]
        if not group:
            continue
        df = table.scan(files=group, include_internal=True, resolve=False)
        out = df.where(keep).withColumn("b", table.bucket_expr())
        obs = Observation()
        out = out.observe(obs, F.count(F.lit(1)).alias("rows"))
        per_bucket: dict[int, int] = {}
        for f in group:
            per_bucket[f.bucket] = per_bucket.get(f.bucket, 0) + f.rows
        splits = plan_bucket_splits(list(per_bucket.items()), target_rows_per_file)
        to_write = with_salted_split(out, "b", splits, salt_cols=table.merge_keys)
        written = table.write_data_files(
            to_write, table.schema(cur), cur["schema_version"],
            sort_by=table.merge_keys, mark_base=mark_base,
        )
        _check_write_consistency(int(obs.get["rows"]), written)
        new_files.extend(written)
        total_out += sum(f.rows for f in written)

    removed = total_in - total_out
    if expected_removed is not None and removed != expected_removed:
        raise RuntimeError(
            f"{operation} consistency: expected to remove "
            f"{expected_removed} rows but the rewrite dropped {removed} "
            f"({total_in} in, {total_out} out)"
        )
    snap = table.commit_retrying(
        {f.path for f in victims},
        new_files,
        operation=operation,
        validation="rewrite",
        expected_parent_version=cur["version"],
        summary_extra=summary_extra,
    )
    return DmlStats(
        buckets_rewritten=len({f.bucket for f in victims}),
        files_removed=len(victims),
        files_added=len(new_files),
        rows_matched=removed,
        snapshot_version=snap["version"],
    )


def _delete_matching_pointwise(
    table: LakeTable, vals: list, target_rows_per_file: int
) -> DmlStats | None:
    """File-granular GDPR erase for a bounded key list.

    ``prune_for_keys`` is SOUND (a file it drops cannot hold any doomed
    key — bucket hash, min/max range, and the manifest key bloom all
    prove absence), so every version of every doomed key lives in the
    kept files; rewriting those verbatim-minus-doomed erases the keys
    completely. The rewrite is strictly per-row (raw scan,
    ``resolve=False``): no partial LWW fold of other keys whose version
    chains extend outside the file subset, so ``requires_resolve`` and
    the base/delta manifest flags carry through unchanged and no
    key-closure expansion is needed — the exact reason this path can
    touch O(keys) files where the resolving bucket path must take whole
    buckets."""
    import dataclasses

    key0 = table.merge_keys[0]
    victims = table.prune_for_keys(vals)
    if not victims:
        return None
    # exact live-match count: resolved lookup over the same pruned set
    # (sound per prune_for_keys; non-doomed keys are filtered out)
    matched = table.lookup(vals).count()
    keep = ~F.coalesce(F.col(key0).isin(vals), F.lit(False))
    stats = _rewrite_verbatim(
        table, victims, keep, "delete-matching",
        summary_extra={
            "buckets_rewritten": len({f.bucket for f in victims}),
            "rows_matched": matched,
            "pointwise_files": len(victims),
        },
        target_rows_per_file=target_rows_per_file,
    )
    # DmlStats.rows_matched reports LIVE matches (delete semantics),
    # not raw row versions removed
    return dataclasses.replace(stats, rows_matched=matched)


def update_where(
    table: LakeTable,
    condition: Column | str,
    assignments: dict[str, Column],
    target_rows_per_file: int = 2_000_000,
) -> DmlStats | None:
    """Set ``assignments`` on every live row matching ``condition``.

    Assignment expressions see the pre-update row. Row LSNs are kept, so
    CDC ordering semantics are unchanged (an in-flight change event with
    a higher LSN still wins over the updated value — UPDATE is a
    point-in-time correction, not a new change event). The change feed
    still reports these rows (scan_changes compares payloads null-safely
    when LSNs tie), so incremental rollups pick corrections up. Updated
    rows get a bumped ``_dml_seq`` (Iceberg sequence-number analog), so
    an exact REDELIVERY of the pre-update event — same LSN, seq 0 —
    deterministically LOSES to the correction in every later merge."""
    _reject_partial_update(table, "update_where")
    cond = F.expr(condition) if isinstance(condition, str) else condition
    bad = set(assignments) & set(table.merge_keys)
    if bad:
        raise ValueError(f"cannot UPDATE merge-key columns {sorted(bad)}")
    buckets, _matched = _plan(table, cond, files=_pruned_files(table, condition))
    if not buckets:
        return None
    full = dict(assignments)
    full[DML_SEQ_COL] = F.coalesce(F.col(DML_SEQ_COL), F.lit(0)) + F.lit(1)

    def transform(df):
        hit = _alive() & F.coalesce(cond, F.lit(False))
        cols = []
        for c in df.columns:
            if c in full:
                cols.append(F.when(hit, full[c]).otherwise(F.col(c)).alias(c))
            else:
                cols.append(F.col(c))
        return df.select(*cols)

    return _rewrite(table, buckets, _matched, transform, "update-where", target_rows_per_file)


def _append_corrections(
    table: LakeTable,
    deltas,
    per_bucket: dict[int, int],
    matched: int,
    operation: str,
    target_rows_per_file: int,
) -> DmlStats:
    """Write correction rows as delta files and commit merge-on-read.

    ``deltas`` must carry the table schema + ``_lsn`` (the corrected
    row's ORIGINAL LSN), ``_tombstone``, and a bumped ``_dml_seq``.
    Write cost is O(matched rows); no existing file is touched."""
    cur = table.current()
    out = deltas.withColumn("b", table.bucket_expr())
    obs = Observation()
    out = out.observe(obs, F.count(F.lit(1)).alias("rows"))
    splits = plan_bucket_splits(list(per_bucket.items()), target_rows_per_file)
    to_write = with_salted_split(out, "b", splits, salt_cols=table.merge_keys)
    new_files = table.write_data_files(
        to_write, table.schema(cur), cur["schema_version"], sort_by=table.merge_keys
    )
    _check_write_consistency(int(obs.get["rows"]), new_files)
    snap = table.commit_retrying(
        set(),
        new_files,
        operation=operation,
        requires_resolve=True,  # deltas overlap stored rows by key
        validation="append",
        expected_parent_version=cur["version"],
        summary_extra={"buckets_touched": len(per_bucket), "rows_matched": matched},
    )
    return DmlStats(
        buckets_rewritten=0,
        files_removed=0,
        files_added=len(new_files),
        rows_matched=matched,
        snapshot_version=snap["version"],
    )


def delete_where_mor(
    table: LakeTable,
    condition: Column | str,
    target_rows_per_file: int = 2_000_000,
) -> DmlStats | None:
    """Merge-on-read DELETE: append one tombstone per matching live row
    instead of rewriting the buckets that hold them.

    The tombstone carries the victim's LSN and a bumped ``_dml_seq``,
    so scan-time LWW resolves the key to 'deleted' — over the stored
    row AND over any exact redelivery — while a genuinely newer CDC
    event (higher LSN) still re-inserts the key. Physical erasure
    happens when compaction folds the deltas (pass an LSN watermark to
    drop the tombstones themselves). Use when the predicate matches few
    rows spread over many buckets; COW ``delete_where`` rewrites every
    touched bucket, this writes only the matches."""
    _reject_partial_update(table, "delete_where_mor")
    cond = F.expr(condition) if isinstance(condition, str) else condition
    pruned = _pruned_files(table, condition)
    per_bucket, matched = _plan(table, cond, files=pruned)
    if not per_bucket:
        return None
    hits = (
        table.scan(include_internal=True, files=pruned)
        .where(~F.coalesce(F.col(TOMBSTONE_COL), F.lit(False)))
        .where(F.coalesce(cond, F.lit(False)))
    )
    deltas = hits.withColumn(TOMBSTONE_COL, F.lit(True)).withColumn(
        DML_SEQ_COL, F.coalesce(F.col(DML_SEQ_COL), F.lit(0)) + F.lit(1)
    )
    return _append_corrections(
        table, deltas, per_bucket, matched, "delete-where-mor", target_rows_per_file
    )


def update_where_mor(
    table: LakeTable,
    condition: Column | str,
    assignments: dict[str, Column],
    target_rows_per_file: int = 2_000_000,
) -> DmlStats | None:
    """Merge-on-read UPDATE: append one post-image row per matching live
    row (original LSN, bumped ``_dml_seq``) instead of rewriting the
    buckets. Same ordering semantics as ``update_where``; write cost is
    O(matched rows). Fold with ``operators.compact.compact``."""
    _reject_partial_update(table, "update_where_mor")
    cond = F.expr(condition) if isinstance(condition, str) else condition
    bad = set(assignments) & set(table.merge_keys)
    if bad:
        raise ValueError(f"cannot UPDATE merge-key columns {sorted(bad)}")
    pruned = _pruned_files(table, condition)
    per_bucket, matched = _plan(table, cond, files=pruned)
    if not per_bucket:
        return None
    hits = (
        table.scan(include_internal=True, files=pruned)
        .where(~F.coalesce(F.col(TOMBSTONE_COL), F.lit(False)))
        .where(F.coalesce(cond, F.lit(False)))
    )
    full = dict(assignments)
    full[DML_SEQ_COL] = F.coalesce(F.col(DML_SEQ_COL), F.lit(0)) + F.lit(1)
    deltas = hits.select(
        *[
            (full[c] if c in full else F.col(c)).alias(c)
            for c in hits.columns
        ]
    )
    return _append_corrections(
        table, deltas, per_bucket, matched, "update-where-mor", target_rows_per_file
    )
