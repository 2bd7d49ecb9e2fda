"""Property-based change feed: for ANY op stream split across batches,
scan_changes(v_i, v_j) must equal the diff of the Python LWW model's
states at those versions — inserts, updates, deletes, and post-image
values. LSNs are unique per case so the model diff is deterministic."""

import os
import uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from ds_floodexposure_monitoring_spark.operators.merge import merge_into
from ds_floodexposure_monitoring_spark.sources.lake import LakeTable

DDL = "lsn long, k string, v string, op string"
SCHEMA = T.StructType(
    [T.StructField("k", T.StringType()), T.StructField("v", T.StringType())]
)

_case = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c", "d"]),
        st.sampled_from(["x", "y", "z"]),
        st.booleans(),
    ),
    min_size=2,
    max_size=10,
).flatmap(
    lambda kvs: st.permutations(range(len(kvs))).map(
        lambda lsns: [(lsns[i] + 1, *kv) for i, kv in enumerate(kvs)]
    )
)


def _state(ops):
    best = {}
    for lsn, k, v, dele in ops:
        if k not in best or lsn > best[k][0]:
            best[k] = (lsn, None if dele else v)
    return {k: (lsn, v) for k, (lsn, v) in best.items()}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_case, cut=st.integers(min_value=1, max_value=9))
def test_change_feed_equals_model_diff(spark, tmpdir_path, ops, cut):
    cut = min(cut, len(ops) - 1)
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, f"t{uuid.uuid4().hex[:8]}"),
        SCHEMA, merge_keys=("k",), n_buckets=2,
    )
    for i, batch in enumerate((ops[:cut], ops[cut:])):
        rows = [(lsn, k, v, "D" if dele else "U") for lsn, k, v, dele in batch]
        merge_into(t, spark.createDataFrame(rows, DDL), op_col="op", batch_id=f"b{i}")
    v1, v2 = 2, 3  # create=1, then one commit per batch

    s1, s2 = _state(ops[:cut]), _state(ops)
    expected = {}
    for k in set(s1) | set(s2):
        a = s1.get(k, (None, None))[1]
        b = s2.get(k, (None, None))[1]
        lsn1 = s1.get(k, (None, None))[0]
        lsn2 = s2.get(k, (None, None))[0]
        alive1, alive2 = a is not None, b is not None
        if not alive1 and alive2:
            expected[k] = ("insert", b)
        elif alive1 and alive2 and lsn1 != lsn2:
            expected[k] = ("update", b)
        elif alive1 and not alive2:
            expected[k] = ("delete", a)

    got = {
        r.k: (r.change_type, r.v)
        for r in t.scan_changes(v1, v2).collect()
    }
    assert got == expected, (got, expected, ops, cut)
