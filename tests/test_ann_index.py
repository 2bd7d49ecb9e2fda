"""Incremental ANN (IVF-as-a-lake-table): append/probe/retrain loop.

The embedding-space twin of tests/test_neardup_index.py — verifies the
index is idempotent under redelivery, probes exactly (vs a brute-force
within-probed-clusters oracle computed in-process), versions its
codebook, and retrains atomically on drift.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ds_floodexposure_monitoring_spark.functions import vector as VEC
from ds_floodexposure_monitoring_spark.operators.ann_index import (
    centroids_version,
    create_ann_index,
    index_append,
    probe_index,
    read_centroids,
    retrain,
    should_retrain,
    write_centroids,
)

DIM = 8


def _vecs(spark, ids, seed=0, shift=0.0):
    rng = np.random.default_rng(seed)
    rows = []
    for i in ids:
        v = rng.normal(size=DIM) + shift
        q = [int(round(x * VEC.Q_SCALE)) for x in (v / np.linalg.norm(v))]
        rows.append((int(i), q))
    return spark.createDataFrame(rows, "vec_id long, v array<long>")


def _codebook(df, k):
    rows = df.orderBy("vec_id").limit(k).collect()
    return [(r["vec_id"], r["v"]) for r in rows]


def _state(idx):
    return sorted(
        (r["cid"], r["vec_id"], tuple(r["v"]), r["n2"])
        for r in idx.scan().collect()
    )


def test_append_probe_and_redelivery_idempotence(spark, tmpdir_path):
    b1 = _vecs(spark, range(0, 40), seed=1)
    b2 = _vecs(spark, range(40, 80), seed=2)
    idx = create_ann_index(spark, f"{tmpdir_path}/ann", _codebook(b1, 8))
    index_append(idx, b1, batch_id="b1")
    index_append(idx, b2, batch_id="b2")
    s1 = _state(idx)
    assert len(s1) == 80
    # redelivery (same rows, new commit) merges to the identical state
    index_append(idx, b2, batch_id="b2-redelivered")
    assert _state(idx) == s1
    # and the CDC ledger lets callers skip by batch_id entirely
    assert {"b1", "b2"} <= idx.committed_batch_ids()

    # probe exactness: brute-force within the probed clusters
    q = _vecs(spark, range(1000, 1010), seed=3)
    got = sorted(
        tuple(r)
        for r in probe_index(
            idx, q.select(F.col("vec_id").alias("qid"), F.col("v").alias("qv")),
            nprobe=2, k=3,
        ).collect()
    )
    cents = read_centroids(idx)
    cm = np.array([v for _, v in cents], dtype=np.int64)
    cids = np.array([c for c, _ in cents], dtype=np.int64)
    postings = idx.scan().collect()
    want = []
    for qr in q.collect():
        qv = np.array(qr["v"], dtype=np.int64)
        cos_c = (cm @ qv) / np.sqrt((cm * cm).sum(1) * (qv @ qv))
        order = np.lexsort((cids, -cos_c))[:2]
        probed = set(cids[order].tolist())
        cand = [
            (
                float((np.array(p["v"], dtype=np.int64) @ qv)
                      / np.sqrt(p["n2"] * (qv @ qv))),
                p["vec_id"],
            )
            for p in postings
            if p["cid"] in probed
        ]
        cand.sort(key=lambda t: (-t[0], t[1]))
        for rnk, (_, nid) in enumerate(cand[:3], start=1):
            want.append((qr["vec_id"], nid, rnk))
    assert got == sorted(want)


def test_codebook_versioning_and_drift_retrain(spark, tmpdir_path):
    base = _vecs(spark, range(0, 60), seed=10)
    idx = create_ann_index(spark, f"{tmpdir_path}/ann", _codebook(base, 6))
    assert centroids_version(idx) == 1
    index_append(idx, base, batch_id="b1")

    # in-distribution batch: no drift
    same = _vecs(spark, range(60, 90), seed=11)
    assert not should_retrain(idx, same, min_cos=-0.5, max_below_frac=0.1)

    # shifted batch: every vector points toward +shift, far from the
    # centered codebook -> drift fires
    drifted = _vecs(spark, range(90, 120), seed=12, shift=6.0)
    assert should_retrain(idx, drifted, min_cos=0.9, max_below_frac=0.2)

    index_append(idx, drifted, batch_id="b2")
    pre = {(r["vec_id"], tuple(r["v"])) for r in idx.scan().collect()}
    v_pre = idx.version

    new_cb = _codebook(base, 3) + _codebook(drifted, 3)
    retrain(idx, new_cb, batch_id="retrain-1")
    assert centroids_version(idx) == 2
    assert [c for c, _ in read_centroids(idx)] == [c for c, _ in new_cb]
    # retrain reassigns, never loses or mutates vectors
    post = {(r["vec_id"], tuple(r["v"])) for r in idx.scan().collect()}
    assert post == pre
    # every stored cid is a member of the NEW codebook
    new_cids = {c for c, _ in new_cb}
    assert {r["cid"] for r in idx.scan().collect()} <= new_cids
    # old snapshot still reads the old assignments (time travel)
    old_cids = {
        r["cid"] for r in idx.scan(version=v_pre).collect()
    }
    assert old_cids <= {c for c, _ in _codebook(base, 6)}
    # drifted batch now assigns confidently
    assert not should_retrain(idx, drifted, min_cos=0.9, max_below_frac=0.2)


def test_codebook_bound_guard(spark, tmpdir_path):
    base = _vecs(spark, range(0, 4), seed=5)
    idx = create_ann_index(spark, f"{tmpdir_path}/ann", _codebook(base, 2))
    big = [(i, [1] * DIM) for i in range(5000)]
    with pytest.raises(ValueError, match="constant bound"):
        write_centroids(idx, big)
