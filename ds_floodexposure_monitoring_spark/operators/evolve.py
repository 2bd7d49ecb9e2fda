"""Schema evolution: add-column / type-widen (Iceberg UpdateSchema analog).

The reference's only "evolution" is drop-and-recreate
(reference: src/datasources/codab.py:47, pipelines/update_exposure_quantile.py:102)
vs append (src/datasources/floodscan.py:289). This module does real
evolution instead: a batch whose schema is a *compatible widening* of
the table schema (new nullable columns appended, integer/float types
widened) evolves the table schema before the merge; anything narrowing
or conflicting is rejected loudly.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Widening lattices: a type may be promoted to anything later in its chain.
_INT_CHAIN = [T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType()]
_FLOAT_CHAIN = [T.FloatType(), T.DoubleType()]


def _chain_pos(dt: T.DataType) -> tuple[str, int] | None:
    for name, chain in (("int", _INT_CHAIN), ("float", _FLOAT_CHAIN)):
        for i, t in enumerate(chain):
            if dt == t:
                return name, i
    return None


def can_widen(src: T.DataType, dst: T.DataType) -> bool:
    """True if src can be losslessly promoted to dst."""
    if src == dst:
        return True
    a, b = _chain_pos(src), _chain_pos(dst)
    if a is None or b is None:
        return False
    # int -> float/double promotion is also lossless enough for Iceberg
    # semantics only for int->double; keep it strict: same chain only,
    # plus int->double (Iceberg allows int/long -> none; we stay strict).
    return a[0] == b[0] and a[1] < b[1]


@dataclass
class SchemaEvolution:
    """Result of diffing a batch schema against the table schema."""

    schema: T.StructType
    added_columns: list[str] = field(default_factory=list)
    widened_columns: list[tuple[str, str, str]] = field(default_factory=list)  # (col, from, to)

    @property
    def changed(self) -> bool:
        return bool(self.added_columns or self.widened_columns)


def evolve_schema(table_schema: T.StructType, batch_schema: T.StructType) -> SchemaEvolution:
    """Compute the evolved table schema admitting ``batch_schema``.

    Rules: batch columns missing from the table are appended as nullable;
    batch columns whose type strictly widens the table's are widened in
    place; a batch column narrower than the table's is fine (cast up on
    align); incompatible types raise.
    """
    table_fields = {f.name: f for f in table_schema.fields}
    out_fields: list[T.StructField] = []
    added: list[str] = []
    widened: list[tuple[str, str, str]] = []

    batch_fields = {f.name: f for f in batch_schema.fields}
    for f in table_schema.fields:
        bf = batch_fields.get(f.name)
        if bf is None or bf.dataType == f.dataType:
            out_fields.append(f)
        elif can_widen(f.dataType, bf.dataType):
            out_fields.append(T.StructField(f.name, bf.dataType, f.nullable))
            widened.append((f.name, f.dataType.simpleString(), bf.dataType.simpleString()))
        elif can_widen(bf.dataType, f.dataType):
            out_fields.append(f)  # batch is narrower; align() casts it up
        else:
            raise ValueError(
                f"incompatible schema change on column {f.name!r}: "
                f"table={f.dataType.simpleString()} batch={bf.dataType.simpleString()}"
            )
    for bf in batch_schema.fields:
        if bf.name not in table_fields:
            out_fields.append(T.StructField(bf.name, bf.dataType, True))
            added.append(bf.name)
    return SchemaEvolution(T.StructType(out_fields), added, widened)


def align_to_schema(df: DataFrame, schema: T.StructType, keep_extra: list[str] | None = None) -> DataFrame:
    """Project ``df`` onto ``schema``: missing columns become typed nulls,
    narrower columns are cast up, column order normalized. ``keep_extra``
    columns (e.g. the LSN) ride along unchanged at the end.
    """
    have = {f.name: f for f in df.schema.fields}
    cols = []
    for f in schema.fields:
        if f.name in have:
            src = have[f.name]
            cols.append(
                F.col(f.name).cast(f.dataType).alias(f.name)
                if src.dataType != f.dataType
                else F.col(f.name)
            )
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    for extra in keep_extra or []:
        cols.append(F.col(extra))
    return df.select(*cols)
