"""Online approximate-nearest-neighbour search: an IVF (inverted-file)
index MAINTAINED INCREMENTALLY as a lake table, probed per CDC batch.

This is the embedding-space twin of ``operators/neardup_index.py``
(lexical MinHash-LSH at ingest): the batch ANN job
(plans/contract_docs.py ``ann_ivf``) recomputes its codebook and
re-assigns the WHOLE corpus every run — at 10^10 vectors that is the
recompute-everything pattern the reference's changed-region-only
incremental design exists to avoid (reference:
src/datasources/floodscan.py:196-213 recomputes only changed
(iso3, date) slices). This module lifts that incrementality to
semantic (embedding-space) search and dedup:

- the index IS a lake table of IVF assignments
  ``(cid, vec_id, v, n2)`` keyed on ``(cid, vec_id)`` and hash-bucketed
  on ``cid`` — each centroid's posting list is co-located by
  construction, and the whole compaction / clustering / expiry /
  time-travel toolkit applies unchanged;
- the codebook (centroids) is VERSIONED IN TABLE METADATA — a
  ``centroids/v{N}.json`` blob under the table's meta dir with an
  atomically-swapped HEAD pointer, the snapshot-log pattern applied to
  the model state that makes assignments meaningful;
- ``index_append`` assigns ONE BATCH against the broadcast codebook
  (one Arrow block-matmul per batch partition, ``per_id_topk=1``) and
  merge-appends the postings — O(batch x K) work, never O(corpus);
  LSN := vec_id makes redelivery idempotent (same rows LWW onto
  themselves);
- ``probe_index`` answers a bounded query batch at
  O(queries x K + candidates) cost: rank centroids per query
  (broadcast codebook), equi-join the ``nprobe`` best cluster ids
  against the posting lists (bucket-co-located scan side), exact
  quantized cosine on candidates only, window top-k;
- ``should_retrain`` + ``retrain`` close the drift loop: assignment
  quality (fraction of a batch whose best-centroid cosine falls below
  a floor) decides when the codebook is stale; retrain re-scores the
  STORED vectors against the new codebook and atomically replaces the
  postings — O(corpus), but paid only on drift, not per run.

Scale shape at 10^10 vectors: per batch the work is
O(batch x K + candidates); the codebook is a constant ``K`` rows
broadcast through the ``bounded_collect`` guard; probing never
broadcasts or collects anything O(corpus). Quantized int64 dot
products (functions/vector.py) keep every ranking bit-identical to an
ANSI oracle computing the same arithmetic.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import vector as VEC
from ..sources.lake import LakeTable, _atomic_write
from .compact import merge_append

MAX_CODEBOOK = 4096  # hard bound on the broadcast side


def index_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("cid", T.LongType(), False),
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("v", T.ArrayType(T.LongType()), False),
            T.StructField("n2", T.LongType(), False),
        ]
    )


# ------------------------------------------------------------- codebook blobs
def _centroid_dir(index: LakeTable) -> str:
    return os.path.join(index._meta_dir, "centroids")


def centroids_version(index: LakeTable) -> int:
    head = os.path.join(_centroid_dir(index), "HEAD")
    if not os.path.exists(head):
        return 0
    with open(head) as f:
        return int(f.read().strip())


def write_centroids(index: LakeTable, rows: list[tuple[int, list[int]]]) -> int:
    """Persist a new codebook version ``[(cid, quantized_vec), ...]``
    and atomically swap the HEAD pointer — the same
    write-blob-then-CAS-the-pointer discipline the snapshot log uses,
    so a reader never sees a torn codebook and old versions remain
    addressable (time travel for the model state)."""
    if len(rows) > MAX_CODEBOOK:
        raise ValueError(
            f"codebook exceeds the constant bound ({MAX_CODEBOOK} rows): "
            "the broadcast side must not grow with the corpus"
        )
    d = _centroid_dir(index)
    os.makedirs(d, exist_ok=True)
    v = centroids_version(index) + 1
    payload = {"version": v, "centroids": [[int(c), list(map(int, vec))] for c, vec in rows]}
    _atomic_write(os.path.join(d, f"v{v}.json"), json.dumps(payload))
    _atomic_write(os.path.join(d, "HEAD"), str(v))
    return v


def read_centroids(
    index: LakeTable, version: int | None = None
) -> list[tuple[int, list[int]]]:
    v = centroids_version(index) if version is None else version
    if v == 0:
        raise FileNotFoundError("index has no codebook; write_centroids first")
    with open(os.path.join(_centroid_dir(index), f"v{v}.json")) as f:
        payload = json.load(f)
    return [(int(c), list(map(int, vec))) for c, vec in payload["centroids"]]


def create_ann_index(
    spark,
    path: str,
    centroids: list[tuple[int, list[int]]],
    n_buckets: int = 8,
) -> LakeTable:
    """New empty IVF index with codebook v1. Merge keys
    ``(cid, vec_id)`` make re-assignment idempotent; bucketing hashes
    the FIRST merge key, so every centroid's posting list lands in one
    bucket — the probe equi-join reads only the probed clusters'
    buckets."""
    t = LakeTable.create(
        spark,
        path,
        index_schema(),
        merge_keys=("cid", "vec_id"),
        n_buckets=n_buckets,
        # vec_id file stats: GDPR erase (operators/erase.py) prunes the
        # posting files by doomed vector instead of rewriting the index
        stat_cols=("vec_id",),
    )
    write_centroids(t, centroids)
    return t


# --------------------------------------------------------------- assignment
def _assign(batch: DataFrame, centroids: list[tuple[int, list[int]]]) -> DataFrame:
    """``(vec_id, cid, cos)`` nearest-centroid assignment for one batch
    of ``(vec_id, v)`` quantized vectors — one Arrow block-matmul per
    partition against the broadcast codebook, emitting exactly one row
    per vector (ties cos desc, cid asc — same rule as ``ann_ivf``)."""
    ranked = VEC.block_cosines(
        batch,
        "vec_id",
        "v",
        [c for c, _ in centroids],
        [vec for _, vec in centroids],
        per_id_topk=1,
    )
    return ranked.select(F.col("id").alias("vec_id"), "cid", "cos")


def index_append(
    index: LakeTable,
    batch: DataFrame,
    batch_id: str | None = None,
):
    """Assign one batch of ``(vec_id, v)`` (quantized ``array<long>``)
    against the CURRENT codebook and merge-append the postings.
    LSN := vec_id — deterministic, so a redelivered batch merges to the
    identical state (and callers sharing the CDC ledger can skip via
    ``index.committed_batch_ids()``)."""
    cents = read_centroids(index)
    rows = (
        _assign(batch, cents)
        .drop("cos")
        .join(batch, "vec_id")
        .select(
            "cid",
            "vec_id",
            "v",
            VEC.q_norm2(F.col("v")).alias("n2"),
            F.col("vec_id").alias("lsn"),
        )
    )
    return merge_append(index, rows, batch_id=batch_id)


# ------------------------------------------------------------------- probing
def probe_index(
    index: LakeTable,
    queries: DataFrame,
    nprobe: int,
    k: int,
) -> DataFrame:
    """Top-``k`` indexed neighbours for each row of a BOUNDED query
    batch ``(qid, qv)`` (quantized): rank centroids per query against
    the broadcast codebook (``per_id_topk=nprobe``), hash-join the
    probed cluster ids into the posting lists (the scan side is
    bucketed on ``cid`` — only probed clusters' buckets are touched on
    a clustered table), exact quantized cosine on candidates only,
    window top-k. Work is O(queries x K + candidates), never
    O(corpus). Self-matches (an already-indexed query) are excluded."""
    cents = read_centroids(index)
    probes = VEC.block_cosines(
        queries.select(F.col("qid").alias("vec_id"), F.col("qv").alias("v")),
        "vec_id",
        "v",
        [c for c, _ in cents],
        [vec for _, vec in cents],
        per_id_topk=nprobe,
    ).select(F.col("id").alias("qid"), "cid")
    q = queries.select("qid", "qv", VEC.q_norm2(F.col("qv")).alias("qn2"))
    cand = (
        F.broadcast(probes.join(q, "qid"))
        .join(index.scan(), "cid")
        .where(F.col("vec_id") != F.col("qid"))
    )
    cos = VEC.q_cosine(F.col("qv"), F.col("v"), F.col("qn2"), F.col("n2"))
    from pyspark.sql.window import Window

    wq = Window.partitionBy("qid").orderBy(F.desc(cos), F.asc("vec_id"))
    return (
        cand.withColumn("rnk", F.row_number().over(wq).cast("long"))
        .where(F.col("rnk") <= k)
        .select("qid", F.col("vec_id").alias("nid"), "rnk")
    )


# ---------------------------------------------------------------- drift loop
def assignment_quality(batch: DataFrame, centroids) -> tuple[float, int]:
    """(mean best-centroid cosine, n) for a batch — one pass, two
    scalars to the driver."""
    row = (
        _assign(batch, centroids)
        .agg(F.avg("cos").alias("m"), F.count(F.lit(1)).alias("n"))
        .collect()[0]
    )
    return (float(row["m"]) if row["m"] is not None else 0.0, int(row["n"]))


def should_retrain(
    index: LakeTable,
    batch: DataFrame,
    min_cos: float = 0.5,
    max_below_frac: float = 0.5,
) -> bool:
    """Drift test: True when more than ``max_below_frac`` of the batch
    assigns to its best centroid below ``min_cos`` — new data the
    current codebook does not cover. Two driver scalars; O(batch)."""
    cents = read_centroids(index)
    row = (
        _assign(batch, cents)
        .agg(
            F.avg((F.col("cos") < min_cos).cast("double")).alias("frac"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    return row["n"] > 0 and float(row["frac"]) > max_below_frac


def retrain(
    index: LakeTable,
    centroids: list[tuple[int, list[int]]],
    batch_id: str | None = None,
) -> dict:
    """Swap in a new codebook and atomically re-assign the STORED
    vectors against it (the postings carry ``v``, so no source
    re-read): one block-matmul pass over the index, one ``replace``
    commit. O(corpus) — paid only when ``should_retrain`` fires, not
    per run. Readers of the previous snapshot keep the old assignments
    AND the old codebook version (both are versioned)."""
    stored = index.scan().select("vec_id", "v").distinct()
    rows = (
        _assign(stored, centroids)
        .drop("cos")
        .join(stored, "vec_id")
        .select(
            "cid",
            "vec_id",
            "v",
            VEC.q_norm2(F.col("v")).alias("n2"),
            F.col("vec_id").alias("lsn"),
        )
    )
    stats = index.replace(rows, batch_id=batch_id)
    write_centroids(index, centroids)
    return stats
