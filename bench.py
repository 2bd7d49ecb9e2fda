"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1), plus a CDC-ingest replay of a generated
transcript change log through the full engine (changelog →
micro-batches → MERGE → snapshots).

Methodology (BENCH/BASELINE.md): this host's 32 vCPUs are backed by far
fewer physical cores with 6-23% hypervisor steal bursts — unpinned
local[32] measures contention, not the engine (identical runs swing
23s↔414s). So the bench defaults to **local[8] pinned to cores 0-7**
(sched_setaffinity before the JVM starts, so every JVM/GC/shuffle
thread inherits it) and runs **best-of-3 alternating trials** per query
and for the CDC replay, which rides out steal epochs. Set
$SPARK_GRAFT_CPUS to override the width (still pinned when it fits the
box).

Prints ONE JSON line:
{"metric": "...", "value": <total sec>, "unit": "sec",
 "queries": {name: sec, ...}, "sf": ..., "cdc_events_per_sec": ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "flagship_daily_health",
    "lww_state",
    "cdc_merge_full",
    "incremental_rollup_refresh",
    "schema_evolution_merge",
    "dml_mor_correction",
    "zonal_rollup",
    "hierarchy_rollup",
    "rolling_mean_range",
    "rolling_mean_rows",
    "rank_return_period",
    "topk_per_group",
    "quantile_buckets",
    "asof_click_attribution",
    "sessionize_events",
    "grid_multiply",
    "anti_join_new_keys",
    "embedding_knn",
    "ann_ivf",
    "embedding_neardup_cosine",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "minhash_lsh_pairs_xxh",
    "neardup_clusters",
    "partition_pruned_scan",
    "clustered_range_scan",
    "zorder_multirange_scan",
    "online_neardup_ingest",
    "online_ann_ingest",
    "lake_partial_update_merge",
    "clone_divergence",
    "runtime_filtered_join",
    "metadata_minmax",
    "jdbc_scan",
    "pii_scrub",
    "repetition_filter",
    "ngram_topk",
    "ngram_topk_sketch",
    "partial_update_state",
    "stratified_sample",
    "stratified_sample_lake",
    "domain_mix_sample",
    "pack_sequences",
    "corpus_shuffle",
    "contamination_flags",
    "transcript_assembly",
    "token_count",
    "doc_fingerprint",
    "quality_score",
    "multimodal_decode",
    "debezium_decode_lww",
    "maxwell_decode_state",
    "secondary_index_lookup",
    "metadata_sum",
    "partition_sums_metadata",
    "incremental_join_refresh",
    "gdpr_erase_cascade",
    "read_optimized_scan",
    "table_maintenance",
    "multi_table_txn",
    "pyds_scan",
    "pyds_pushdown_lookup",
    "streaming_pyds_change_feed",
    "streaming_lake_replication",
]

# sf0.1 -> 16M events: the same production-size-batch regime as
# bench/scaling.py (3 batches of ~8M). At 1M events (the old setting)
# the ~1.3s/batch fixed cost (plan, commit, checkpoint, footer stats)
# dominates and the replay reads ~200k ev/s — a fixed-cost artifact,
# not the engine's sustained rate; at 8M-event batches the same code
# sustains ~600k ev/s pinned local[8] (BENCH/BASELINE.md).
CDC_EVENTS_PER_SF = 160_000_000
TRIALS = 3  # best-of-K alternating trials (noisy-host methodology;
            # raised from 2 in r3 — same-day epoch variance reached 2.2x,
            # so one extra pass materially tightens the best-of estimate)

# Epoch-proofing (round 5): a degraded host epoch mid-bench must never
# masquerade as an engine regression in the recorded artifact
# (BENCH_r04's 121.9s middle replay trial). Every replay trial carries
# its own /proc/stat steal fraction (hypervisor contention DURING the
# window) and a pre-trial engine-free CPU probe (catches frequency /
# bandwidth degradation that steal misses — observed on this host at
# <1% steal). A trial is CLEAN iff steal <= CLEAN_STEAL_PCT and its
# probe reads >= CLEAN_PROBE_FRAC of the best probe seen this run; the
# replay keeps adding trials (up to MAX_CDC_TRIALS) until at least one
# clean trial exists, and the headline best-of is taken over clean
# trials when any exist. All trials, probes, and steal readings are
# embedded in the emitted JSON so the record is self-attributing.
CLEAN_STEAL_PCT = 1.5
CLEAN_PROBE_FRAC = 0.85
MAX_CDC_TRIALS = 6
PROBE_SECONDS = 3.0


def _cpu_sample(ncores: int) -> dict[int, tuple[int, int]]:
    """Per-core (steal_jiffies, total_jiffies) for the pinned cores —
    an independent hardware counter of hypervisor contention during a
    timed window (field 8 of /proc/stat is steal)."""
    out: dict[int, tuple[int, int]] = {}
    try:
        with open("/proc/stat") as fh:
            for line in fh:
                p = line.split()
                if p[0].startswith("cpu") and p[0] != "cpu":
                    idx = int(p[0][3:])
                    if idx < ncores:
                        vals = list(map(int, p[1:]))
                        out[idx] = (vals[7], sum(vals))
    except OSError:
        pass
    return out


def _steal_pct(s0: dict, s1: dict) -> float:
    steal = sum(s1[i][0] - s0[i][0] for i in s0 if i in s1)
    total = sum(s1[i][1] - s0[i][1] for i in s0 if i in s1)
    return 100.0 * steal / total if total else 0.0


def _probe_rate_per_core(cpus: int, seconds: float = PROBE_SECONDS) -> float:
    """Engine-free per-core integer-hash rate (bench/host_probe.py's cpu
    worker) on the pinned cores — the epoch fingerprint. Returns 0.0 if
    the probe can't run (never blocks the bench)."""
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench"))
        from host_probe import _cpu_worker, run_width

        return run_width(_cpu_worker, cpus, seconds) / cpus
    except Exception as e:  # probe is advisory
        print(f"[bench] host probe unavailable: {e}", file=sys.stderr)
        return 0.0


def _pin_cpus(cpus: int) -> bool:
    """Pin this process (and the JVM it will fork) to exactly ``cpus``
    cores so auxiliary threads cannot overflow the width. Returns True
    if pinned."""
    try:
        avail = sorted(os.sched_getaffinity(0))
    except AttributeError:  # non-Linux
        return False
    if len(avail) < cpus:
        return False
    os.sched_setaffinity(0, set(avail[:cpus]))
    return True


def run_cdc_ingest(spark, sf_label: float, cpus: int) -> dict:
    from ds_floodexposure_monitoring_spark.datagen import ChangeLogSpec, generate_changelog
    from ds_floodexposure_monitoring_spark.datagen.transcripts import transcript_schema
    from ds_floodexposure_monitoring_spark.sources.lake import LakeTable
    from ds_floodexposure_monitoring_spark.streaming.runner import CDCPipeline

    n_events = max(int(CDC_EVENTS_PER_SF * sf_label), 50_000)
    root = tempfile.mkdtemp(prefix="benchcdc-")
    # Same scan-width regime as bench/scaling.py: enough changelog files
    # that a half-input batch fans out to >= cores scan tasks, and 16 MB
    # scan partitions so the 128 MB default doesn't pack the whole batch
    # into 1-2 tasks at bench scale (production batches are 100x larger
    # where the default already yields thousands of tasks). The conf is
    # runtime-settable; restore after so the headline queries keep the
    # production default.
    prev_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
    try:
        spec = ChangeLogSpec(
            n_events=n_events,
            n_convs=max(n_events // 50, 100),
            n_shards=max(cpus // 4, 2),
            dup_rate=0.05,
            delete_rate=0.02,
            ooo_window=1_000,
            schema_change_at=None,
            events_per_file=max(n_events // 64, 10_000),
            seed=42,
        )
        generate_changelog(spark, spec, f"{root}/log")

        def make_pipe(suffix: str, batch_events: int) -> CDCPipeline:
            table = LakeTable.create(
                spark, f"{root}/table{suffix}", transcript_schema(), n_buckets=64
            )
            return CDCPipeline(
                spark,
                f"{root}/log",
                table,
                f"{root}/ckpt{suffix}",
                metrics_dir=None,
                max_events_per_batch=batch_events,
                target_rows_per_file=2_000_000,
                mode="mor",  # write-optimized ingest path (bench/scaling.py)
                compact_every=2,
                compact_min_files=4,
            )

        # JIT warm-up with FULL-SIZE batches through every code path
        # (small warm batches leave hot loops under-JITed and the first
        # timed batch pays ~2x — measured in bench/scaling.py), then
        # best-of-TRIALS timed replays with production-regime
        # (half-input) batches
        make_pipe("-warm", max(n_events // 2, 100_000)).run_until_caught_up(max_batches=2)
        trials: list[dict] = []
        probe_ref = 0.0  # best engine-free rate seen = this run's epoch ceiling
        t = 0
        while True:
            pipe = make_pipe(f"-t{t}", max(n_events // 2, 100_000))
            table = pipe.table
            probe = _probe_rate_per_core(cpus)
            probe_ref = max(probe_ref, probe)
            s0 = _cpu_sample(cpus)
            t0 = time.monotonic()
            results = pipe.run_until_caught_up()
            wall = time.monotonic() - t0
            s1 = _cpu_sample(cpus)
            total_events = sum(r.batch.n_events for r in results)
            trials.append({
                "sec": wall,
                "events": total_events,
                "events_per_sec": total_events / wall,
                "batches": len(results),
                "final_rows": table.total_rows(),
                "steal_pct": round(_steal_pct(s0, s1), 2),
                "probe_m_per_core": round(probe / 1e6, 2),
            })
            print(f"[bench] cdc replay trial {t}: {wall:.1f}s "
                  f"({trials[-1]['events_per_sec']:,.0f} ev/s, "
                  f"steal {trials[-1]['steal_pct']}%, "
                  f"probe {trials[-1]['probe_m_per_core']}M/s/core)",
                  file=sys.stderr)
            t += 1
            clean = [
                r for r in trials
                if r["steal_pct"] <= CLEAN_STEAL_PCT
                and (probe_ref == 0.0
                     or r["probe_m_per_core"] * 1e6 >= CLEAN_PROBE_FRAC * probe_ref)
            ]
            if t >= TRIALS and (clean or t >= MAX_CDC_TRIALS):
                break
        best = min(clean or trials, key=lambda r: r["sec"])
        best = dict(best)
        best["trial_secs"] = [round(r["sec"], 3) for r in trials]
        best["trial_steal_pct"] = [r["steal_pct"] for r in trials]
        best["trial_probe_m"] = [r["probe_m_per_core"] for r in trials]
        best["clean_trials"] = len(clean)
        best["best_is_clean"] = bool(clean)
        return best
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev_mpb)
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # local[8] pinned by default: the repo's own scaling analysis
    # (BENCH/BASELINE.md) shows unpinned local[32] measures hypervisor
    # steal, not the engine (597k ev/s pinned local[8] vs 100k ev/s
    # unpinned local[32] on the same replay).
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    pinned = _pin_cpus(cpus)
    sf_label = float(sf_dir.rstrip("/").split("sf")[-1])

    from ds_floodexposure_monitoring_spark.session import get_spark

    import __spark_entry__ as entrymod

    # launch-epoch fingerprint BEFORE the JVM exists: engine-free per-core
    # rate on the pinned cores. Recorded in the artifact so a degraded
    # launch epoch is visible in the record itself.
    launch_probe = _probe_rate_per_core(cpus)
    print(f"[bench] launch probe: {launch_probe / 1e6:.2f}M/s/core",
          file=sys.stderr)

    spark = get_spark(app_name="bench", master=f"local[{cpus}]")
    qs = entrymod.queries()

    # one JVM/codegen warm-up run (not timed), then best-of-TRIALS
    # alternating passes (full pass per trial, so steal epochs hit
    # queries fairly rather than clustering on whichever ran last)
    qs["zonal_rollup"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    pass_steal: list[float] = []
    for trial in range(TRIALS):
        s0 = _cpu_sample(cpus)
        for name in HEADLINE:
            fn = qs[name]
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            sec = round(time.monotonic() - t0, 3)
            if name not in timings or sec < timings[name]:
                timings[name] = sec
            print(f"[bench] t{trial} {name}: {sec}s", file=sys.stderr)
        pass_steal.append(round(_steal_pct(s0, _cpu_sample(cpus)), 2))

    cdc = run_cdc_ingest(spark, sf_label, cpus)
    timings["cdc_ingest_replay"] = round(cdc["sec"], 3)

    out = {
        "metric": "headline query wall-time + CDC change-apply replay at sf",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_label,
        "cdc_events_per_sec": round(cdc["events_per_sec"], 1),
        "cdc_events": cdc["events"],
        "cdc_batches": cdc["batches"],
        "cdc_trial_secs": cdc["trial_secs"],
        "cdc_trial_steal_pct": cdc["trial_steal_pct"],
        "cdc_trial_probe_m_per_core": cdc["trial_probe_m"],
        "cdc_clean_trials": cdc["clean_trials"],
        "cdc_best_is_clean": cdc["best_is_clean"],
        "headline_pass_steal_pct": pass_steal,
        "launch_probe_m_per_core": round(launch_probe / 1e6, 2),
        "clean_rule": (
            f"trial clean iff steal<={CLEAN_STEAL_PCT}% and probe>="
            f"{CLEAN_PROBE_FRAC}x best probe this run; replay retries to "
            f"{MAX_CDC_TRIALS} trials until one is clean; best-of over "
            "clean trials when any exist"
        ),
        "cpus": cpus,
        "pinned": pinned,
        "trials": TRIALS,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
