"""Incremental change-data-capture — the batch ``ops.cdc.snapshot_diff``
as a Structured Streaming maintenance loop: a latest-state store kept
current per micro-batch, with every batch's insert/update/delete change
set appended to a changes log.

Topology (``foreachBatch``, the "the table is the state" discipline shared
with ``streaming.runner.run_upsert_stream`` and ``streaming.curation``):

- per batch: reduce the batch to latest-per-key (``sink.upsert`` order),
  diff it against the CURRENT store with ``snapshot_diff`` restricted to
  the batch's keys (a batch only ever inserts/updates — deletes come from
  an explicit tombstone convention, not absence, since absence from a
  micro-batch means "no news", not "gone"),
- append the change set (with batch_id) to the changes log,
- merge the batch into the store via last-writer-wins upsert.

No executor-held state: a restart replays the unfinished micro-batch from
the checkpoint; both writes are idempotent per batch (the changes log
carries batch_id, the store merge is LWW), so the recovery contract is
the same as the upsert sink's. At scale both the store and the batch
bucket on the key, making the diff and the merge co-partitioned.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from fxspark.ops.cdc import snapshot_diff
from fxspark.ops.latest import dedup_latest


def cdc_stream(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    key: str,
    order_by: list[str],
    compare: list[str],
    store_path: str,
    changes_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """File-stream of JSON event drops → maintained latest-state store at
    ``store_path`` + append-only change log at ``changes_path``.

    The change log rows are ``(key, change_type, old_<c>, new_<c>,
    batch_id)`` — exactly ``ops.cdc.snapshot_diff`` output per batch, so a
    downstream consumer can either read the store (current state) or fold
    the log (full history); the two are equal by construction, which the
    restart-recovery test pins.
    """
    stream = spark.readStream.schema(schema).json(source_dir)

    def batch(batch_df: DataFrame, batch_id: int) -> None:
        latest = dedup_latest(batch_df, [key], order_by)
        new_state = latest.select(key, *compare)
        if os.path.exists(store_path):
            store = spark.read.parquet(store_path)
            old_state = store.join(
                new_state.select(key), key, "left_semi"
            )
            changes = snapshot_diff(old_state, new_state, key, compare)
            # LWW merge: batch rows replace store rows for the batch's keys
            merged = store.join(
                new_state.select(key), key, "left_anti"
            ).unionByName(new_state)
        else:
            changes = snapshot_diff(
                new_state.limit(0), new_state, key, compare
            )
            merged = new_state
        (
            changes.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append").parquet(changes_path)
        )
        # materialize before overwriting the directory the plan reads
        merged.localCheckpoint().write.mode("overwrite").parquet(store_path)

    writer = stream.writeStream.foreachBatch(batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
