"""Data-quality expectations + the AUDIT step of write-audit-publish
(Iceberg WAP / Delta constraints / Great-Expectations-lite analog).

The engine already has the W and the P: ingest ``--branch`` stages
commits on a branch, ``publish_branch`` fast-forwards main atomically.
This module is the A — declarative expectations evaluated over the
staged state, and a ``publish_checked`` that refuses the pointer swap
while any expectation is violated, so main NEVER exposes unaudited
rows. Refusal is loud and carries per-expectation violation counts;
nothing is dropped or repaired silently.

Expectations (each a tiny spec, evaluated together):

- ``not_null(col)`` — no live row may hold NULL in ``col``;
- ``in_range(col, lo, hi)`` — every non-null value within bounds
  (inclusive); violations count rows outside OR null-if ``required``;
- ``matches(col, regex)`` — every non-null value rlike the pattern;
- ``satisfies(name, predicate)`` — arbitrary boolean Column contract
  (violation = predicate false or null for a live row);
- ``unique_key()`` — live state holds each merge key once. The lake's
  LWW resolve GUARANTEES this by construction, so its audit is a
  metadata check (``count_rows`` vs distinct), kept for the
  completeness of the report rather than out of suspicion.

Evaluation cost: every row-level expectation folds into ONE aggregate
pass over the audited scan — a conditional-sum per expectation inside a
single ``agg`` (map-side partials, one exchange of one row per
partition). ``unique_key`` adds one distinct-count inside the same agg.
At 100 TB the audit costs one scan, independent of how many
expectations are declared.

Reference parity: the reference's only gate is a polling loop that
checks file presence before processing (reference:
src/datasources/floodscan.py:70-87) — data contracts do not exist
there; this module is the engine-native version of the manual "sanity
check the frame before to_sql" cells in its exploration notebooks.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..sources.lake import LakeTable


@dataclass(frozen=True)
class Expectation:
    name: str
    # violation predicate over a live row: TRUE -> the row violates
    violation: Column


def not_null(col: str) -> Expectation:
    return Expectation(f"not_null({col})", F.col(col).isNull())


def in_range(col: str, lo, hi, required: bool = False) -> Expectation:
    v = ~F.col(col).between(F.lit(lo), F.lit(hi))
    if required:
        v = v | F.col(col).isNull()
    else:
        v = v & F.col(col).isNotNull()
    return Expectation(f"in_range({col},{lo},{hi})", v)


def matches(col: str, pattern: str) -> Expectation:
    return Expectation(
        f"matches({col})",
        F.col(col).isNotNull() & ~F.col(col).rlike(pattern),
    )


def satisfies(name: str, predicate: Column) -> Expectation:
    """Arbitrary contract: a live row violates unless ``predicate`` is
    TRUE (false OR null both violate — SQL CHECK semantics are the
    opposite, so this is the strict reading a data contract wants)."""
    return Expectation(name, ~F.coalesce(predicate, F.lit(False)))


UNIQUE_KEY = "unique_key"


def audit_df(
    df,
    expectations: list[Expectation],
    keys: list[str] | tuple | None = None,
) -> dict[str, int]:
    """Evaluate all expectations over a DataFrame in one aggregate
    pass; returns {expectation name: violation count} (zero entries
    included — the report proves what was checked). ``keys`` adds a
    ``unique_key`` entry counting surplus rows beyond distinct keys."""
    aggs = [
        F.sum(F.when(e.violation, 1).otherwise(0)).cast("long").alias(e.name)
        for e in expectations
    ]
    if keys:
        aggs.append(F.count(F.lit(1)).cast("long").alias("__rows"))
        aggs.append(
            F.count_distinct(*[F.col(k) for k in keys])
            .cast("long").alias("__keys")
        )
    if not aggs:
        return {}
    row = df.agg(*aggs).collect()[0]
    out = {e.name: int(row[e.name] or 0) for e in expectations}
    if keys:
        out[UNIQUE_KEY] = int((row["__rows"] or 0) - (row["__keys"] or 0))
    return out


def audit(
    table: LakeTable,
    expectations: list[Expectation],
    unique_key: bool = True,
) -> dict[str, int]:
    """Evaluate all expectations over the table's LIVE state (one
    aggregate pass over the resolved scan)."""
    return audit_df(
        table.scan(),
        expectations,
        keys=table.merge_keys if unique_key else None,
    )


class AuditError(RuntimeError):
    """Publish refused: the staged state violates expectations. Carries
    the full violation report on ``.violations``."""

    def __init__(self, branch: str, violations: dict[str, int]):
        self.violations = violations
        bad = {k: v for k, v in violations.items() if v}
        super().__init__(
            f"refusing to publish branch {branch!r}: "
            f"{sum(bad.values())} violation(s) across {len(bad)} "
            f"expectation(s): {bad}"
        )


def publish_checked(
    table: LakeTable,
    branch: str,
    expectations: list[Expectation],
    drop: bool = True,
) -> dict:
    """Write-audit-publish: audit the branch head; fast-forward main
    only if EVERY expectation holds. On violations raises ``AuditError``
    (the branch stays for repair — fix with DML on the branch and call
    again). Returns ``{"published": snapshot, "audit": report}``."""
    staged = table.on_branch(branch)
    report = audit(staged, expectations)
    if any(report.values()):
        raise AuditError(branch, report)
    snap = table.publish_branch(branch, drop=drop)
    return {"published": snap, "audit": report}
