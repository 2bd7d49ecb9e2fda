"""Physical-plan shape regressions: the optimizations we rely on at
100 TB must be visible in the explain output — filter pushdown to the
parquet scan, column pruning, broadcast joins for dims, map-side partial
aggregation before the shuffle."""

from ds_floodexposure_monitoring_spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_pushdown_to_scan(spark):
    p = _plan(spark, "zonal_rollup")
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in p


def test_column_pruning_at_scan(spark):
    p = _plan(spark, "zonal_rollup")
    assert "l_orderkey" not in p.split("ReadSchema:")[1].split("\n")[0]
    p2 = _plan(spark, "lww_state")
    assert "props" not in p2  # projected away before the dedup struct


def test_dim_joins_broadcast(spark):
    p = _plan(spark, "hierarchy_rollup")
    assert p.count("BroadcastHashJoin") >= 6  # 3 dims x 2 grains
    assert "SortMergeJoin" not in p


def test_partial_aggregation_before_shuffle(spark):
    # partial (map-side) agg -> Exchange -> final agg
    p = _plan(spark, "zonal_rollup")
    agg_ix = p.index("HashAggregate")
    ex_ix = p.index("Exchange")
    assert agg_ix < ex_ix or p.count("HashAggregate") >= 2


def test_dedup_agg_has_partial_aggregation(spark):
    # the LWW dedup (groupBy + max_by) must partial-aggregate before the
    # shuffle — this is why it beats a window at scale
    p = _plan(spark, "lww_state")
    assert "Exchange" in p
    before_exchange = p.split("Exchange")[0]
    assert "Aggregate" in before_exchange


def test_ann_ivf_codebook_broadcast_no_corpus_shuffle_for_assignment(spark):
    # the IVF codebook rides to every corpus partition as a broadcast
    # matrix scored via one Arrow matmul per batch (MapInPandas), which
    # emits only per-row top-nprobe rows (assignment = rank 1) — never a
    # corpus-wide window sort or a raw corpus x C cross product
    p = _plan(spark, "ann_ivf")
    assert "MapInPandas" in p  # corpus x broadcast codebook block-matmul
    assert "BroadcastHashJoin" in p  # probes (tiny) joined to assignment


def test_neardup_pairs_blocked_no_join_no_driver_collect(spark):
    # blocked all-pairs self-join: the block grid shuffles on (gi, gj)
    # into grouped Arrow matmuls — no join operator at all, no broadcast
    # of an O(corpus) matrix, and (structurally) no driver-side collect
    p = _plan(spark, "embedding_neardup_cosine")
    assert "FlatMapGroupsInPandas" in p or "FlatMapGroupsIn" in p
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p


def test_transcript_assembly_grouped_arrow_single_shuffle(spark):
    # grouped applyInPandas: ONE hashpartitioning(user_id) exchange feeds
    # the Arrow group assembly — no extra sort-based shuffles
    import re

    p = _plan(spark, "transcript_assembly_arrow")
    assert "FlatMapGroupsInPandas" in p
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1


def test_transcript_assembly_pure_jvm_one_agg(spark):
    # the default transcript assembly stays entirely JVM-side: a single
    # hash/sort aggregate with map-side partials, no Python operator
    import re

    p = _plan(spark, "transcript_assembly")
    assert "FlatMapGroupsInPandas" not in p and "MapInPandas" not in p
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
    before_exchange = p.split("Exchange")[0]
    assert "Aggregate" in before_exchange  # partial agg before the shuffle


def test_runtime_filtered_join_broadcasts(spark):
    # dim-driven dynamic file pruning: the fact side never shuffles for
    # the join — the dim broadcasts; the only exchanges are the MOR
    # resolve agg and the dim's own groupBy
    import re

    p = _plan(spark, "runtime_filtered_join")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 2


def test_corpus_shuffle_one_exchange_pruned_scan(spark):
    # deterministic training-order shuffle: ONE hashpartitioning(shard)
    # exchange + an in-partition sort serves the whole permutation (no
    # global sort, no second shuffle), and the scan reads only doc_id
    import re

    p = _plan(spark, "corpus_shuffle")
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
    assert "rangepartitioning" not in p  # never a global ORDER BY
    assert "text" not in p.split("ReadSchema:")[1].split("\n")[0]


def test_rollup_grouping_sets_one_pass(spark):
    # rollup() compiles to a single Expand + aggregate over ONE scan of
    # the joined base — not three separate aggregations unioned
    p = _plan(spark, "rollup_grouping_sets")
    assert "Expand" in p
    assert p.count("BroadcastHashJoin") >= 3  # dims still broadcast


def test_sessionize_single_shuffle(spark):
    # hashpartitioning(user_id) from the window is reused by the final
    # groupBy(user_id, session_no) — Catalyst sees the partitioning
    # satisfies the clustered distribution, so ONE shuffle serves the
    # lag window, the running sum, and the session aggregation
    p = _plan(spark, "sessionize_events")
    import re

    exchange_ids = re.findall(r"\((\d+)\) Exchange", p)
    assert len(exchange_ids) == 1, exchange_ids
    args = re.findall(r"Arguments: hashpartitioning\(([^,)]+)", p)
    assert args and args[0].startswith("user_id"), args


def test_merge_paths_single_exchange(spark, tmp_path):
    """The ingest hot paths (merge_append and merge_into) must move the
    payload across the wire exactly ONCE per batch: bucket + skew-split
    are computed map-side, the one exchange is on (b, _split), and the
    LWW max_by agg + partitionBy write run in the same post-shuffle
    stage. A second Exchange in the write job means the full text
    payload is shuffled twice — the regression this test pins."""
    import re

    from pyspark.sql import types as T

    from ds_floodexposure_monitoring_spark.operators import compact as compact_mod
    from ds_floodexposure_monitoring_spark.operators import merge as merge_mod
    from ds_floodexposure_monitoring_spark.sources.lake import LakeTable

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("text", T.StringType()),
        ]
    )
    rows = [(f"c{i % 7}", i % 5, f"t{i}", i) for i in range(200)]
    batch = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, lsn long"
    )

    plans: list[str] = []
    orig = LakeTable.write_data_files

    def capture(self, df, *a, **kw):
        plans.append(
            df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        )
        return orig(self, df, *a, **kw)

    LakeTable.write_data_files = capture
    try:
        t1 = LakeTable.create(spark, str(tmp_path / "mor"), schema, n_buckets=8)
        compact_mod.merge_append(t1, batch)
        t2 = LakeTable.create(spark, str(tmp_path / "cow"), schema, n_buckets=8)
        merge_mod.merge_into(t2, batch)
        # COW second batch: existing files + batch resolve, still one
        merge_mod.merge_into(t2, batch.withColumn("lsn", batch.lsn + 1000))
        # HOT-bucket path: a splits hint >1 switches _split from the
        # constant-0 fast path to the inline-map expression — the
        # exchange/agg fusion must survive that shape too
        t3 = LakeTable.create(spark, str(tmp_path / "hot"), schema, n_buckets=8)
        compact_mod.merge_append(
            t3, batch, splits_hint={b: (3 if b == 0 else 1) for b in range(8)}
        )
    finally:
        LakeTable.write_data_files = orig

    assert len(plans) == 4
    for p in plans:
        ex = re.findall(r"\(\d+\) Exchange", p)
        # broadcast exchange for the splits dim is fine; count only
        # shuffle exchanges
        shuffles = [m for m in re.findall(r"\(\d+\) (BroadcastExchange|Exchange)", p) if m == "Exchange"]
        assert len(shuffles) == 1, p
        assert "hashpartitioning(b" in p


def test_ngram_jaccard_no_per_document_broadcast(spark):
    """No O(corpus) side may be hint-broadcast in the exact-Jaccard
    plan: a forced broadcast of a per-document frame (the old
    F.broadcast(sizes) shape) ships one row per document to every
    executor — an OOM at 10^10 docs. Set sizes ride the exploded token
    rows instead, so the logical plan must carry NO broadcast hint at
    all (a runtime AQE broadcast decided from actual sizes is fine and
    is not a hint)."""
    from ds_floodexposure_monitoring_spark.plans import REGISTRY

    df = REGISTRY["ngram_jaccard_pairs"].fn(spark, SF)
    logical = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in logical and "UnresolvedHint" not in logical


def test_pack_sequences_distributed_prefix_sum(spark):
    """The running-sum window must partition by (source, slice), never
    by the low-cardinality source alone — otherwise each source's whole
    corpus funnels through ONE sort task at 100x scale. The final agg
    adds one more exchange (chunks can span slices), so: exactly two
    shuffles, and the window's is on the high-cardinality composite."""
    import re

    p = _plan(spark, "pack_sequences")
    shuffles = [
        m
        for m in re.findall(r"\(\d+\) (BroadcastExchange|Exchange)", p)
        if m == "Exchange"
    ]
    assert len(shuffles) == 2, p
    assert re.search(r"hashpartitioning\(source#\d+, slice#\d+", p), p
    # the per-source window key must NOT appear alone
    assert not re.search(r"hashpartitioning\(source#\d+, \d+\)", p), p


def test_pack_sequences_exact_vs_single_partition_reference(spark):
    """The distributed prefix sum equals the naive one-window-per-source
    reference on a corpus with many slices per source."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from ds_floodexposure_monitoring_spark.plans.contract_docs import (
        _pack_sequences_plan,
    )

    d = spark.range(3000).select(
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("source"),
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", F.array_repeat(F.lit("w"), (F.pmod(F.col("id") * 37, 40) + 1).cast("int"))
        ).alias("text"),
    )
    got = sorted(tuple(r) for r in _pack_sequences_plan(d, 100, num_slices=16).collect())
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ref = (
        d.select("source", "doc_id", F.size(F.split("text", " ")).alias("n_tok"))
        .withColumn(
            "chunk_id",
            ((F.sum("n_tok").over(w) - F.col("n_tok")) / F.lit(100)).cast("long"),
        )
        .groupBy("source", "chunk_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )
    want = sorted(tuple(r) for r in ref.collect())
    assert got == want and len(got) > 50


def test_contamination_broadcasts_benchmark_side_only(spark):
    # the benchmark shingle set is bounded by the benchmark, so its
    # broadcast is the correct production plan; the corpus token side
    # must NOT be broadcast (it reaches the join via shuffle/stream)
    p = _plan(spark, "contamination_flags")
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p


def test_stratified_sample_is_deterministic(spark):
    a = {tuple(r) for r in REGISTRY["stratified_sample"].fn(spark, SF).collect()}
    b = {tuple(r) for r in REGISTRY["stratified_sample"].fn(spark, SF).collect()}
    assert a == b and len(a) > 0


def _stratified_reference(d, k):
    """Naive full-window stratified top-K for comparison."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from ds_floodexposure_monitoring_spark.plans.contract_docs import _hhex

    w = Window.partitionBy("lang").orderBy(
        _hhex(F.col("doc_id").cast("string"), "samp"), "doc_id"
    )
    return (
        d.select("lang", "doc_id", "n_chars", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def _synth_docs(spark, n=4000, langs=4):
    import pyspark.sql.functions as F

    return spark.range(n).select(
        F.concat(F.lit("L"), (F.col("id") % langs).cast("string")).alias("lang"),
        F.col("id").alias("doc_id"),
        (F.col("id") * 7 % 500).alias("n_chars"),
    )


def test_stratified_sample_prefilter_bounds_window_exchange(spark):
    """The window's exchange input must be the hash-cutoff survivors
    (~safety*K per stratum), not the whole corpus: the plan carries a
    substring(rk)-vs-cutoff Filter below the Window, and the survivor
    set it admits is a small fraction of the corpus."""
    import pyspark.sql.functions as F

    from ds_floodexposure_monitoring_spark.plans.contract_docs import (
        _hhex,
        _stratified_sample_plan,
    )

    d = _synth_docs(spark)
    k, safety = 5, 2
    out = _stratified_sample_plan(d, k, safety=safety)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Window" in plan and "substring" in plan, plan
    # survivors really are bounded: rebuild the same filter and count
    want = sorted(tuple(r) for r in _stratified_reference(d, k).collect())
    got = sorted(tuple(r) for r in out.collect())
    assert got == want and len(got) == 4 * k
    # each 1000-row stratum keeps ~2*safety*k of its uniform hashes
    cut = f"{min(0xffffffff, int(0xffffffff * safety * k / 1000) + 1):08x}"
    survivors = d.where(
        F.substring(_hhex(F.col("doc_id").cast("string"), "samp"), 1, 8) <= cut
    ).count()
    assert survivors < 4000 * 0.2, survivors


def test_stratified_sample_shortfall_fallback_stays_exact(spark):
    """safety=0 under-fills every stratum, forcing the full-window
    fallback path — results must still equal the reference."""
    from ds_floodexposure_monitoring_spark.plans.contract_docs import (
        _stratified_sample_plan,
    )

    d = _synth_docs(spark, n=800, langs=2)
    got = sorted(tuple(r) for r in _stratified_sample_plan(d, 7, safety=0).collect())
    want = sorted(tuple(r) for r in _stratified_reference(d, 7).collect())
    assert got == want and len(got) == 14


def test_repetition_filter_zero_shuffle(spark):
    # per-doc statistic computed entirely in the array domain
    # (array_sort + aggregate fold): one scan, no Exchange, no Python
    p = _plan(spark, "repetition_filter")
    assert "Exchange" not in p
    assert "MapInPandas" not in p and "ArrowEvalPython" not in p
    assert "BatchEvalPython" not in p  # no row-at-a-time Python ever


def test_ngram_topk_partial_topk_no_global_sort(spark):
    # top-k must ride TakeOrderedAndProject (per-partition partial
    # top-k, 20 rows to the driver), never a full Sort of the gram
    # counts; the count agg partial-aggregates before its exchange
    p = _plan(spark, "ngram_topk")
    assert "TakeOrderedAndProject" in p
    assert p.count("HashAggregate") >= 2  # partial + final


def test_ngram_topk_sketch_bounded_candidates_broadcast_recount(spark):
    # pass 1 (Misra-Gries partials) must run directly over the scan —
    # no Exchange may feed the MapInPandas (the summary is
    # per-partition by design, shuffling first would defeat it); the
    # exact re-count must filter through a BROADCAST join (the
    # candidate set is the bounded side), and top-k must stay
    # TakeOrderedAndProject
    p = _plan(spark, "ngram_topk_sketch")
    tree = p.split("\n\n")[0].splitlines()
    (mi,) = [i for i, l in enumerate(tree) if "MapInPandas" in l]
    indent = tree[mi].index("MapInPandas")
    subtree = []
    for line in tree[mi + 1:]:
        stripped = line.replace("+-", "  ").replace(":-", "  ")
        depth = len(stripped) - len(stripped.lstrip())
        if depth <= indent:
            break
        subtree.append(line)
    assert subtree, "MapInPandas has no children in the plan tree"
    assert not any("Exchange" in l for l in subtree)
    assert "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p

    # the sketch answer IS the exact answer at this scale
    exact = sorted(
        tuple(r) for r in REGISTRY["ngram_topk"].fn(spark, SF).collect()
    )
    sketch = sorted(
        tuple(r) for r in REGISTRY["ngram_topk_sketch"].fn(spark, SF).collect()
    )
    assert sketch == exact


def test_mg_fold_capacity_bound_and_heavy_hitter_guarantee():
    # force evictions: capacity 8 over a stream with 200 distinct
    # singletons + one item at frequency 120; the summary must never
    # exceed the cap and the heavy hitter must survive (freq 120 >
    # n/cap = 320/8) — the exact guarantee ngram_topk_sketch rests on
    from ds_floodexposure_monitoring_spark.plans.contract_docs import _mg_fold

    stream = [f"g{i}" for i in range(200)] + ["hot"] * 120
    import random

    for seed in (0, 1, 2):
        random.Random(seed).shuffle(stream)
        counts = {}
        for i in range(0, len(stream), 37):  # arbitrary batch cuts
            _mg_fold(stream[i:i + 37], counts, 8)
            assert len(counts) <= 8
        assert "hot" in counts
