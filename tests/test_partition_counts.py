"""Manifest-backed per-partition counts (LakeTable.partition_row_counts)
and their use as the curation samplers' stratum census."""

import pytest
from pyspark.sql import functions as F

from ds_floodexposure_monitoring_spark.plans import contract_docs as cd
from ds_floodexposure_monitoring_spark.sources.lake import LakeTable

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_partition_row_counts_match_scan(spark, tmpdir_path):
    docs = _docs(spark)
    t = LakeTable.create(
        spark, f"{tmpdir_path}/t", docs.schema,
        merge_keys=("doc_id",), n_buckets=4, partition_by="lang",
    )
    t.replace(docs, batch_id="seed")
    got = t.partition_row_counts()
    want = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert got == want


def test_partition_row_counts_unprovable_cases(spark, tmpdir_path):
    docs = _docs(spark)
    # unpartitioned: no part values in the manifest
    t = LakeTable.create(
        spark, f"{tmpdir_path}/u", docs.schema, merge_keys=("doc_id",), n_buckets=4,
    )
    t.replace(docs, batch_id="seed")
    assert t.partition_row_counts() is None

    # unresolved MOR deltas: physical rows double-count superseded keys
    from ds_floodexposure_monitoring_spark.operators.compact import merge_append

    p = LakeTable.create(
        spark, f"{tmpdir_path}/p", docs.schema,
        merge_keys=("doc_id",), n_buckets=4, partition_by="lang",
    )
    p.replace(docs, batch_id="seed")
    merge_append(
        p,
        docs.limit(10).withColumn("lsn", F.lit(99).cast("long")),
        batch_id="delta",
    )
    assert p.current().get("requires_resolve", False)
    assert p.partition_row_counts() is None


def test_sampler_census_rides_manifests_not_a_scan(spark, monkeypatch):
    # force the scan-side census to blow up: the lake-backed sampler
    # must never call it (that IS the "one fewer full scan" claim)
    def boom(_):
        raise AssertionError("stratum census scanned the corpus")

    monkeypatch.setattr(cd, "_stratum_sizes", boom)
    got = sorted(
        tuple(r) for r in cd.REGISTRY["stratified_sample_lake"].fn(spark, SF).collect()
    )
    monkeypatch.undo()
    want = sorted(
        tuple(r) for r in cd.REGISTRY["stratified_sample"].fn(spark, SF).collect()
    )
    assert got == want


def test_sampler_falls_back_when_counts_unprovable(spark, monkeypatch):
    monkeypatch.setattr(LakeTable, "partition_row_counts", lambda self, version=None: None)
    got = sorted(
        tuple(r) for r in cd.REGISTRY["stratified_sample_lake"].fn(spark, SF).collect()
    )
    want = sorted(
        tuple(r) for r in cd.REGISTRY["stratified_sample"].fn(spark, SF).collect()
    )
    assert got == want


def test_clone_carries_partition_counts(spark, tmpdir_path):
    docs = _docs(spark)
    t = LakeTable.create(
        spark, f"{tmpdir_path}/t", docs.schema,
        merge_keys=("doc_id",), n_buckets=4, partition_by="lang",
    )
    t.replace(docs, batch_id="seed")
    c = t.clone(f"{tmpdir_path}/c")
    assert c.partition_row_counts() == t.partition_row_counts()
