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
    silently disabling hot-bucket splitting."""
    spark = df.sparkSession
    splits_df = F.broadcast(
        spark.createDataFrame(
            [(int(b), int(n)) for b, n in splits.items()], f"{bucket_col} int, _n_splits int"
        )
    )
    df = df.join(splits_df, on=bucket_col, how="left").na.fill({"_n_splits": 1})
    salt = F.xxhash64(*[F.col(c) for c in salt_cols], F.lit(seed), F.lit("split"))
    return df.withColumn("_split", F.pmod(salt, F.col("_n_splits")).cast("int")).drop("_n_splits")
