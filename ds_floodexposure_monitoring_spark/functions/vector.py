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


def bounded_collect(df, max_rows: int) -> list:
    """Driver-side collect with a hard constant bound.

    Every similarity query that broadcasts a candidate matrix must pull
    it through this guard: the collected side (codebook, query set) has
    to be O(1) in the corpus size, or the plan silently degrades into a
    driver-memory bottleneck at scale. Raises instead of truncating so
    an unbounded candidate expression fails loudly in tests."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"candidate side exceeds the constant bound ({max_rows} rows): "
            "the collected set must not grow with the corpus"
        )
    return rows


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


def block_cosines(
    df,
    id_col: str,
    vec_col: str,
    cand_ids,
    cand_matrix,
    per_id_topk: int | None = None,
    per_cid_topk: int | None = None,
    exclude_self: bool = False,
):
    """Arrow block-matmul scores: every row of ``df`` (quantized vector)
    against a broadcast candidate matrix, one integer BLAS call per Arrow
    batch. Exact int64 dot products keep downstream rankings
    bit-identical to an ANSI oracle computing the same quantized cosine.

    Emission control (the crucial part — emitting the raw id x cid cross
    product through Arrow costs more than the matmul saves):

    - ``per_id_topk=m``: per row, only its m best candidates, ranked
      ``rn`` 1..m with ties broken (cos desc, cid asc). EXACT, because a
      row sees the full candidate set inside one batch. Output
      ``(id, cid, cos, rn)``.
    - ``per_cid_topk=k``: per candidate column, only the k best rows of
      EACH batch (ties (cos desc, id asc)) — a PARTIAL top-k; the caller
      must re-rank the survivors with a window to merge batches. Output
      ``(id, cid, cos)``.
    - neither: full ``(id, cid, cos)`` cross product.

    The candidate side must be bounded (a codebook, a query set, an LSH
    block); the corpus side streams through ``mapInPandas`` and never
    shuffles.
    """
    import numpy as np
    import pandas as pd

    order = np.argsort(np.asarray(cand_ids, dtype=np.int64))  # cid-asc for stable ties
    ids = np.asarray(cand_ids, dtype=np.int64)[order]
    M = np.asarray(cand_matrix, dtype=np.int64)[order]
    n2 = (M * M).sum(axis=1)
    bc = df.sparkSession.sparkContext.broadcast((ids, M, n2))

    def block(batches):
        c_ids, c_m, c_n2 = bc.value
        n_c = len(c_ids)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = np.stack(pdf[vec_col].values).astype(np.int64)
            a_ids = pdf[id_col].to_numpy(dtype=np.int64)
            dots = A @ c_m.T
            a_n2 = (A * A).sum(axis=1)
            cos = dots / np.sqrt(a_n2[:, None].astype(np.float64) * c_n2[None, :])
            if exclude_self:
                cos = np.where(a_ids[:, None] == c_ids[None, :], -np.inf, cos)
            if per_id_topk is not None:
                m = min(per_id_topk, n_c)
                # stable sort on -cos over cid-ascending columns = ties to lower cid
                top = np.argsort(-cos, axis=1, kind="stable")[:, :m]
                rows = np.repeat(np.arange(len(a_ids)), m)
                cols = top.ravel()
                keep = np.isfinite(cos[rows, cols])
                yield pd.DataFrame(
                    {
                        "id": a_ids[rows][keep],
                        "cid": c_ids[cols][keep],
                        "cos": cos[rows, cols][keep],
                        "rn": np.tile(np.arange(1, m + 1), len(a_ids))[keep],
                    }
                )
            elif per_cid_topk is not None:
                k = min(per_cid_topk, len(a_ids))
                # rows arrive id-sorted within a batch only by chance; sort
                # explicitly so stable argsort breaks ties by lower id
                row_order = np.argsort(a_ids, kind="stable")
                cos_s = cos[row_order]
                ids_s = a_ids[row_order]
                top = np.argsort(-cos_s, axis=0, kind="stable")[:k, :]
                cols = np.tile(np.arange(n_c), k)
                rows = top.ravel()
                keep = np.isfinite(cos_s[rows, cols])
                yield pd.DataFrame(
                    {
                        "id": ids_s[rows][keep],
                        "cid": c_ids[cols][keep],
                        "cos": cos_s[rows, cols][keep],
                    }
                )
            else:
                rows = np.repeat(np.arange(len(a_ids)), n_c)
                cols = np.tile(np.arange(n_c), len(a_ids))
                keep = np.isfinite(cos[rows, cols])
                yield pd.DataFrame(
                    {
                        "id": a_ids[rows][keep],
                        "cid": c_ids[cols][keep],
                        "cos": cos[rows, cols][keep],
                    }
                )

    schema = "id long, cid long, cos double" + (
        ", rn int" if per_id_topk is not None else ""
    )
    return df.select(id_col, vec_col).mapInPandas(block, schema)


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
