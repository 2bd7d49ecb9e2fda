"""Lake sink for Structured Streaming: ``foreachBatch`` → MERGE.

``lake_sink(table)`` returns a ``foreachBatch`` function that applies
each micro-batch to a :class:`~..sources.lake.LakeTable` through
:func:`~..operators.compact.merge_append` — the same one-shuffle,
skew-split, bucket-fanout write path the CDC pipeline uses, NOT a
reimplementation (a Python-side stream writer would have to rehash
merge keys row-wise outside the JVM; ``foreachBatch`` keeps the bucket
hash, the batch LWW fold, and the skew split as JVM expressions).

Composed with the ``lake_cdc`` streaming source (sources/pyds.py) this
gives full lake-to-lake pipelines in plain Spark API::

    register_lake_sources(spark)
    (spark.readStream.format("lake_cdc")
        .option("path", src_table.path)
        .option("startingVersion", str(v0)).load()
        .writeStream.foreachBatch(lake_sink(replica))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start())

Exactly-once composition, end to end:

- the SOURCE's offsets are snapshot versions; a replayed epoch re-reads
  the identical snapshot diff (deterministic — scan_changes semantics);
- the SINK stamps ``batch_id = f"{tag}-{epoch_id}"`` on every commit;
  :meth:`LakeTable.commit`'s duplicate-batch detection turns a replayed
  epoch into a no-op that returns the original snapshot. Restart from
  any checkpoint therefore converges to the same table state.

Delete propagation: change-feed rows carry ``change_type``; rows whose
value equals ``delete_op`` become tombstones in the MERGE (the delete
row carries the pre-image payload, which the tombstone ignores). The
replica's live state after draining equals the source's live state —
pinned exactly by tests/test_streaming_sink.py and the
``streaming_lake_replication`` registry oracle.

Reference analog: the daily exposure pipelines re-derive downstream
blobs from upstream state wholesale (src/pipelines/update_exposure.py);
this is the incremental replacement — downstream tables follow the
change feed, moving only changed keys per epoch.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from ..operators.compact import merge_append
from ..sources.lake import LakeTable


def lake_sink(
    table: LakeTable,
    lsn_col: str = "change_lsn",
    op_col: str | None = "change_type",
    delete_op: str = "delete",
    tag: str = "stream",
    target_rows_per_file: int = 2_000_000,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` function applying micro-batches as idempotent
    MERGEs into ``table``. Defaults match the ``lake_cdc`` change-feed
    column names; set ``op_col=None`` for insert/update-only streams.
    ``tag`` namespaces the batch-id so several queries can feed one
    table without colliding epoch numbers (use a stable per-query tag —
    it is the exactly-once identity across restarts)."""

    def apply(batch_df: DataFrame, epoch_id: int) -> None:
        bid = f"{tag}-{epoch_id}"
        # replayed epoch (crash between sink commit and checkpoint
        # advance): already in this branch's ancestry — skip without
        # re-running the merge job. The commit-time CAS batch-id check
        # still backstops the concurrent-duplicate race this driver-side
        # read can miss.
        if bid in table.committed_batch_ids():
            return
        merge_append(
            table,
            batch_df,
            lsn_col=lsn_col,
            op_col=op_col,
            delete_op=delete_op,
            batch_id=bid,
            target_rows_per_file=target_rows_per_file,
        )

    return apply
