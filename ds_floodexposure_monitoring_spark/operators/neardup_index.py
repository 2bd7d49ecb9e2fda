"""Online near-duplicate detection at ingest: a MinHash-LSH band index
MAINTAINED INCREMENTALLY as a lake table, probed per CDC batch.

Corpus-wide near-dup jobs (plans/contract_docs.py minhash_lsh_pairs)
re-shingle and re-band the WHOLE corpus every run — at 10^10 documents
that is exactly the recompute-everything pattern the reference's
changed-region-only incremental design exists to avoid (reference:
src/datasources/floodscan.py:196-213 recomputes only changed
(iso3, date) slices). This module lifts that incrementality to
deduplication:

- ``index_append`` adds one batch's LSH band rows
  ``(band_key, doc_id)`` to a lake table keyed on those two columns —
  O(batch x bands) rows per batch, never O(corpus);
- ``probe_index`` checks a new batch against everything indexed so far:
  band rows for the batch join the index on ``band_key`` (a hash
  equi-join whose index side is a bucketed lake scan — the band key is
  the table's first merge key, so candidate index files are co-located
  by construction), then candidates are verified with EXACT Jaccard
  over the two sides' shingle sets — O(candidates), and every returned
  pair is true regardless of LSH luck.

Scale shape at 10^10 docs: per batch the work is
O(batch x bands + candidates); the index table compacts/clusters like
any other lake table (it IS one), and probing never broadcasts or
collects anything O(corpus). The hash family is injected so the
oracle-exact md5-mirror family (plans) and the 3x-faster xxhash64
production family ride the identical plan."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.lake import LakeTable
from .compact import merge_append

N_MINHASH = 32
LSH_BAND_ROWS = 2


def minhash_band_rows(
    docs_ws: DataFrame,
    hash_fn: Callable[[int], F.Column],
    n_minhash: int = N_MINHASH,
    band_rows: int = LSH_BAND_ROWS,
) -> DataFrame:
    """``(doc_id, band_key)`` LSH band rows from ``(doc_id, ws)``
    shingle-set rows. ``hash_fn(i)`` is the i-th hash of column ``w``;
    the signature is one map-side-combined agg over the exploded
    shingles. The band key concatenates band id + the band's minhash
    tuple — exact equality, no re-hash, one string column the index
    table can bucket, range-stat, and bloom on."""
    toks = docs_ws.select("doc_id", F.explode("ws").alias("w"))
    mh = toks.groupBy("doc_id").agg(
        *[F.min(hash_fn(i)).alias(f"h{i}") for i in range(n_minhash)]
    )
    return mh.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        F.lit(str(bi)),
                        *[
                            F.col(f"h{bi * band_rows + r}").cast("string")
                            for r in range(band_rows)
                        ],
                    )
                    for bi in range(n_minhash // band_rows)
                ]
            )
        ).alias("band_key"),
    )


def index_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("band_key", T.StringType(), False),
            T.StructField("doc_id", T.LongType(), False),
        ]
    )


def create_index(
    spark, path: str, n_buckets: int = 8, key_bloom_bits: int = 0
) -> LakeTable:
    """The index IS a lake table: merge keys (band_key, doc_id) make
    re-indexing idempotent (same rows LWW onto themselves), bucketing on
    band_key co-locates each band bucket's rows, and the whole
    compaction / clustering / expiry toolkit applies unchanged."""
    return LakeTable.create(
        spark,
        path,
        index_schema(),
        merge_keys=("band_key", "doc_id"),
        n_buckets=n_buckets,
        key_bloom_bits=key_bloom_bits,
        # doc_id file stats: GDPR erase (operators/erase.py) prunes the
        # band files by doomed doc instead of rewriting the whole index
        stat_cols=("doc_id",),
    )


def index_append(
    index: LakeTable,
    batch_ws: DataFrame,
    hash_fn: Callable[[int], F.Column],
    batch_id: str | None = None,
):
    """Add one batch's band rows. LSN := doc_id — deterministic, so a
    redelivered batch merges to the identical state (exactly-once rides
    the same batch_id ledger as every other ingest)."""
    rows = minhash_band_rows(batch_ws, hash_fn).withColumn(
        "lsn", F.col("doc_id")
    )
    return merge_append(index, rows, batch_id=batch_id)


def probe_index(
    index: LakeTable,
    batch_ws: DataFrame,
    corpus_ws: DataFrame,
    hash_fn: Callable[[int], F.Column],
    jaccard_t: float,
) -> DataFrame:
    """Near-dup pairs (indexed doc, new doc): LSH candidates from one
    band_key equi-join, then exact Jaccard verification on candidates
    only — sound unconditionally (``corpus_ws`` supplies the indexed
    side's shingle sets for verification; it is joined by doc_id on
    candidates, never broadcast). Self-matches are excluded so a batch
    that was already indexed probes clean."""
    rows = minhash_band_rows(batch_ws, hash_fn)
    idx = index.scan().select("band_key", F.col("doc_id").alias("doc_a"))
    cand = (
        rows.join(idx, "band_key")
        .where(F.col("doc_a") != F.col("doc_id"))
        .select("doc_a", F.col("doc_id").alias("doc_b"))
        .distinct()
    )
    sa = corpus_ws.select(F.col("doc_id").alias("doc_a"), F.col("ws").alias("wsa"))
    sb = batch_ws.select(F.col("doc_id").alias("doc_b"), F.col("ws").alias("wsb"))
    v = cand.join(sa, "doc_a").join(sb, "doc_b")
    inter = F.size(F.array_intersect("wsa", "wsb"))
    uni = F.size("wsa") + F.size("wsb") - inter
    jac = inter.cast("double") / uni
    return v.where(jac >= jaccard_t).select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    )
