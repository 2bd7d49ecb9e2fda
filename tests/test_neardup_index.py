"""Online near-dup index (operators/neardup_index.py): incremental
maintenance + probe semantics. The oracle-exactness of the md5-half
family is covered by the registry sweep (online_neardup_ingest in
test_contract_oracle.py); here we pin the operator's own contracts:
idempotent re-index, incremental growth, soundness of every returned
pair, and self-probe cleanliness."""

import os

import pytest
from pyspark.sql import functions as F

from ds_floodexposure_monitoring_spark.operators.neardup_index import (
    create_index,
    index_append,
    minhash_band_rows,
    probe_index,
)

T = 0.55


def _hash(i):
    digest = F.md5(F.encode(F.concat(F.col("w"), F.lit(f"|{i // 2}")), "UTF-8"))
    return F.substring(digest, 1 if i % 2 == 0 else 17, 15)


def _docs(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    words = F.split(F.col("text"), " ")
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(words) - 3),
            lambda i: F.concat_ws(
                " ", F.element_at(words, i + 1), F.element_at(words, i + 2),
                F.element_at(words, i + 3),
            ),
        )
    )
    return df.select("doc_id", sh.alias("ws"))


BASE = "the quick brown fox jumps over the lazy dog while rain falls on the old stone bridge near town"
NEAR = "the quick brown fox jumps over the lazy dog while rain falls on the old stone bridge near city"
FAR = "completely different words about spark shuffle partitions and arrow batches in executor memory pools"


def test_probe_finds_neardup_and_only_neardup(spark, tmpdir_path):
    idx = create_index(spark, os.path.join(tmpdir_path, "i1"), n_buckets=4)
    corpus = _docs(spark, [(1, BASE), (2, FAR)])
    index_append(idx, corpus, _hash, batch_id="b1")
    batch = _docs(spark, [(10, NEAR), (11, "unrelated text with zero overlap whatsoever in any shingle here at all")])
    got = probe_index(idx, batch, corpus, _hash, T).collect()
    assert {(r.doc_a, r.doc_b) for r in got} == {(1, 10)}
    assert all(r.jaccard >= T for r in got)


def test_incremental_append_grows_probe_results(spark, tmpdir_path):
    idx = create_index(spark, os.path.join(tmpdir_path, "i2"), n_buckets=4)
    c1 = _docs(spark, [(1, BASE)])
    index_append(idx, c1, _hash, batch_id="b1")
    batch = _docs(spark, [(10, NEAR)])
    assert probe_index(idx, batch, c1, _hash, T).count() == 1

    # second indexed batch: another near-dup of the probe doc
    c2 = _docs(spark, [(2, NEAR.replace("city", "village"))])
    index_append(idx, c2, _hash, batch_id="b2")
    corpus = c1.unionByName(c2)
    pairs = {(r.doc_a, r.doc_b) for r in probe_index(idx, batch, corpus, _hash, T).collect()}
    assert pairs == {(1, 10), (2, 10)}


def test_reindex_is_idempotent(spark, tmpdir_path):
    idx = create_index(spark, os.path.join(tmpdir_path, "i3"), n_buckets=4)
    corpus = _docs(spark, [(1, BASE), (2, FAR)])
    index_append(idx, corpus, _hash, batch_id="b1")
    rows_once = sorted((r.band_key, r.doc_id) for r in idx.scan().collect())
    # redelivery under a NEW batch id: LWW onto identical keys — state unchanged
    index_append(idx, corpus, _hash, batch_id="b1-redelivery")
    rows_twice = sorted((r.band_key, r.doc_id) for r in idx.scan().collect())
    assert rows_once == rows_twice
    # band rows per doc = number of bands, all distinct keys
    n_bands = minhash_band_rows(corpus, _hash).groupBy("doc_id").count().collect()
    assert all(r["count"] == 16 for r in n_bands)


def test_probing_indexed_docs_excludes_self(spark, tmpdir_path):
    idx = create_index(spark, os.path.join(tmpdir_path, "i4"), n_buckets=4)
    corpus = _docs(spark, [(1, BASE), (2, FAR)])
    index_append(idx, corpus, _hash, batch_id="b1")
    # probing with the already-indexed batch: no self pairs
    got = probe_index(idx, corpus, corpus, _hash, T).collect()
    assert {(r.doc_a, r.doc_b) for r in got} == set()
