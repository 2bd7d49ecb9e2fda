"""Vector math over ``array<float>`` embedding columns.

Two families:

- ``cos_sim`` — float cosine via ``zip_with`` + ``aggregate`` (JVM-side,
  no UDF). The production similarity path.
- ``q_dot`` / ``q_norm2`` — *quantized* integer dot products
  (components scaled by 10^4 and rounded to BIGINT). Integer sums are
  associative, so Spark and any ANSI engine produce bit-identical
  results regardless of summation order — this is what the
  oracle-checked KNN contract query uses. Quantization error at 1e-4 on
  unit-scale embeddings is far below ranking noise.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

Q_SCALE = 10_000


def quantize(v: Column) -> Column:
    """array<float> -> array<bigint>, component-wise round(x * 1e4)."""
    return F.transform(v, lambda x: F.round(x.cast("double") * Q_SCALE, 0).cast("long"))


def _sum_long(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0).cast("long"), lambda acc, x: acc + x)


def q_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors."""
    return _sum_long(F.zip_with(a, b, lambda x, y: x * y))


def q_norm2(a: Column) -> Column:
    """Exact integer squared norm of a quantized vector."""
    return _sum_long(F.transform(a, lambda x: x * x))


def q_cosine(a_q: Column, b_q: Column, a_n2: Column, b_n2: Column) -> Column:
    """Cosine from precomputed quantized dot/norms (double, deterministic
    given identical integer inputs)."""
    return q_dot(a_q, b_q).cast("double") / F.sqrt(a_n2.cast("double") * b_n2.cast("double"))


def cos_sim(a: Column, b: Column) -> Column:
    """Float cosine similarity — production path (no quantization)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.transform(b, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return dot / (na * nb)
