"""Row-level DML: predicate DELETE and UPDATE over lake tables.

The Iceberg ``DELETE FROM ... WHERE`` / ``UPDATE ... SET`` analog (the
reference's closest shape is the wholesale rebuild of derived tables —
codab.py:42-48 ``if_exists="replace"`` — which can't express "remove
these rows"; this is the surgical form a GDPR erasure or correction run
needs).

Copy-on-write at BUCKET granularity: one planning pass finds the buckets
that actually hold matching live rows (and the match count — the collect
is bounded by ``n_buckets``, never row count), only those buckets' files
are rewritten with the predicate applied, and the commit swaps the file
lists atomically with optimistic concurrency. Untouched buckets — at
10^10 rows, almost all of them — carry over by metadata reference only.
Tombstone rows ride through rewrites unchanged so out-of-order CDC
ordering guards survive; DELETE removes live rows physically (the
erasure semantic), so a later change event for the same key re-inserts
it as a fresh row, which is standard CDC behavior.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, Observation
from pyspark.sql import functions as F

from ..sources.lake import TOMBSTONE_COL, LakeTable
from .merge import _check_write_consistency
from .skew import plan_bucket_splits, with_salted_split


@dataclass(frozen=True)
class DmlStats:
    buckets_rewritten: int
    files_removed: int
    files_added: int
    rows_matched: int
    snapshot_version: int


def _alive() -> Column:
    return ~F.coalesce(F.col(TOMBSTONE_COL), F.lit(False))


def _plan(table: LakeTable, cond: Column) -> tuple[set[int], int]:
    """(buckets holding live matches, live match count) — one Spark job,
    ≤ n_buckets rows to the driver."""
    rows = (
        table.scan()
        .where(cond)
        .groupBy(table.bucket_expr().alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return {r["b"] for r in rows}, sum(r["n"] for r in rows)


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
        to_write, table.schema(cur), cur["schema_version"], sort_by=table.merge_keys
    )
    _check_write_consistency(int(obs.get["rows"]), new_files)

    # rewritten buckets come out resolved; the table stays
    # requires_resolve only if some untouched bucket still holds deltas
    by_bucket: dict[int, int] = {}
    for f in table.files(cur):
        by_bucket[f.bucket] = by_bucket.get(f.bucket, 0) + 1
    leftover_multi = any(n >= 2 for b, n in by_bucket.items() if b not in buckets)
    snap = table.commit(
        {f.path for f in victims},
        new_files,
        operation=operation,
        requires_resolve=cur.get("requires_resolve", False) and leftover_multi,
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
    cond = F.expr(condition) if isinstance(condition, str) else condition
    buckets, matched = _plan(table, cond)
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
) -> DmlStats | None:
    """DELETE by key set (the ``DELETE WHERE key IN (SELECT …)`` form —
    the realistic GDPR shape: erase a LIST of conversation/user ids).

    ``keys_df`` is a one-column DataFrame of first-merge-key values.
    Touched buckets come from hashing the key set itself (distinct over
    ≤ n_buckets values — never a table scan), the rewrite is a LEFT ANTI
    join of just those buckets' resolved rows against the key set, and
    every other bucket carries over by metadata reference. The key set
    may be arbitrarily large — it stays distributed throughout (AQE
    broadcasts it when small). Unlike delete_where, matching TOMBSTONES
    are erased too: GDPR erasure removes every trace of the key,
    accepting that a still-in-flight older event for it would re-insert
    (standard CDC semantics, same as the live-row case)."""
    # key_col names the column IN keys_df; joins always run under the
    # table's first merge-key name
    key0 = table.merge_keys[0]
    src_col = key_col or key0
    keys = keys_df.select(F.col(src_col).alias(key0)).distinct()
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
    when LSNs tie), so incremental rollups pick corrections up. Known
    hazard, shared with every system mixing out-of-band DML into a
    replayed log: an exact REDELIVERY of the pre-update event ties on
    LSN with a different payload and the resolve may pick either — run
    corrections after the log's redelivery horizon."""
    cond = F.expr(condition) if isinstance(condition, str) else condition
    bad = set(assignments) & set(table.merge_keys)
    if bad:
        raise ValueError(f"cannot UPDATE merge-key columns {sorted(bad)}")
    buckets, _matched = _plan(table, cond)
    if not buckets:
        return None

    def transform(df):
        hit = _alive() & F.coalesce(cond, F.lit(False))
        cols = []
        for c in df.columns:
            if c in assignments:
                cols.append(F.when(hit, assignments[c]).otherwise(F.col(c)).alias(c))
            else:
                cols.append(F.col(c))
        return df.select(*cols)

    return _rewrite(table, buckets, _matched, transform, "update-where", target_rows_per_file)
