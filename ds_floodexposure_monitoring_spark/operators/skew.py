"""Hot-key detection and salted skew splitting for the bucket-write path.

north_rule: change events are salted-hash-partitioned on conv_id with
explicit skew splitting for hot conversations. AQE's skew-join splitting
covers joins but not the final bucket-partitioned write, where one hot
conversation (hence one hot bucket) would serialize into a single task
and a single giant file. Here:

1. a cheap per-bucket census (``groupBy(bucket).count()`` — one narrow
   agg over a batch already in memory) finds row counts;
2. each bucket gets ``ceil(rows / target_rows_per_file)`` splits;
3. ``_split = pmod(xxhash64(key..., salt), n_splits)`` spreads the
   bucket over that many write tasks/files.

The census result is tiny (≤ n_buckets rows) and is broadcast-joined
back — never collected into a per-row Python closure.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def plan_bucket_splits(
    bucket_counts: list[tuple[int, int]], target_rows_per_file: int
) -> dict[int, int]:
    """bucket -> number of output splits (≥1), sized so files stay near
    ``target_rows_per_file``."""
    out: dict[int, int] = {}
    for bucket, rows in bucket_counts:
        out[bucket] = max(1, -(-rows // target_rows_per_file))
    return out


def with_salted_split(
    df: DataFrame,
    bucket_col: str,
    splits: dict[int, int],
    salt_cols: Sequence[str] = ("conv_id", "turn_idx"),
    seed: int = 2654435761,
) -> DataFrame:
    """Add ``_split`` ∈ [0, splits[bucket]) via salted hash of the full
    merge key; cold buckets (splits==1) get a constant 0.

    The salt input always appends a ``'split'`` literal (and uses a seed
    constant distinct from ``LakeTable.BUCKET_SEED``): for a
    single-column merge key, an identical hash input would make the
    split hash a pure function of the bucket hash, so ``_split`` would
    be constant per bucket whenever n_splits divides n_buckets —
    silently disabling hot-bucket splitting.

    Fast paths (both hit constantly on the steady-state ingest loop, so
    they remove a per-batch broadcast JOB from the driver's critical
    path — measured as part of the ~0.8 s/batch fixed cost that caps
    wide-width scaling at bench batch sizes):

    - every bucket has 1 split (no hot buckets): ``_split`` is the
      literal 0 — no lookup of any kind;
    - few distinct split counts (the usual skew profile: a handful of
      hot buckets, everything else cold): the bucket→splits lookup
      inlines as a literal MAP expression evaluated map-side — no
      broadcast, no join operator, no extra job. The broadcast join
      remains only for a pathological many-distinct-hot-buckets profile
      at very large n_buckets.
    """
    spark = df.sparkSession
    values = set(int(n) for n in splits.values())
    if values <= {1}:
        return df.withColumn("_split", F.lit(0).cast("int"))
    salt = F.xxhash64(*[F.col(c) for c in salt_cols], F.lit(seed), F.lit("split"))
    hot = {int(b): int(n) for b, n in splits.items() if int(n) > 1}
    if len(hot) <= 256:
        pairs: list = []
        for b, n in hot.items():
            pairs += [F.lit(b), F.lit(n)]
        n_splits = F.coalesce(
            # lit(int) is LongType; align the key side explicitly
            F.element_at(F.create_map(*pairs), F.col(bucket_col).cast("long")),
            F.lit(1),
        )
        return df.withColumn("_split", F.pmod(salt, n_splits).cast("int"))
    splits_df = F.broadcast(
        spark.createDataFrame(
            [(int(b), int(n)) for b, n in splits.items()], f"{bucket_col} int, _n_splits int"
        )
    )
    df = df.join(splits_df, on=bucket_col, how="left").na.fill({"_n_splits": 1})
    return df.withColumn("_split", F.pmod(salt, F.col("_n_splits")).cast("int")).drop("_n_splits")


def write_exchange_partitions(df: DataFrame, splits: dict[int, int]) -> int:
    """Shuffle-partition count for the one-exchange write path.

    The write exchange hashes G = sum(splits) (bucket, split) groups into
    the session's default shuffle-partition count (~2x cores). Two
    failure modes at that count, both measured on the scaling bench:

    - G > partitions: several whole groups pile into one reduce task,
      whose rows then exceed the sort-agg's in-memory budget at narrow
      widths → spill (local[2] replay measured 198K -> 270K ev/s from
      raising the count alone);
    - G ~ partitions: balls-into-bins collisions leave tail tasks with
      2-4 groups while others sit empty — invisible at narrow widths
      (many waves smooth it), a direct wall tax at wide widths where the
      reduce stage is one or two waves deep.

    A partition can always be left empty cheaply-ISH — but on this
    write path every partition (empty included) is a mapInArrow task
    with a Python-worker roundtrip, so gratuitous over-partitioning has
    a real floor cost (measured: the 16.8M-event replay lost ~25% when
    64 groups ran at 128 partitions). So over-partition 4x ONLY when
    the reduce stage would be shallow (groups < 4x cores, where a
    collision tail is exposed directly in the stage wall); with >= 4
    waves per core the tail averages out and the exchange runs at
    exactly the group count. Floored by the session default either way.
    On a real cluster the write-task count follows the table layout
    (Iceberg's write distribution), growing with n_buckets, so
    production sits in the many-waves branch.
    """
    spark = df.sparkSession
    base = int(spark.conf.get("spark.sql.shuffle.partitions"))
    cores = spark.sparkContext.defaultParallelism
    groups = sum(splits.values()) or 1
    if groups >= 4 * cores:
        return max(groups, base)
    return max(4 * groups, base)
