"""Incremental corpus curation — the batch `ops.pipeline.curate_corpus`
ladder as a Structured Streaming ingestion (documents arrive continuously,
curated training chunks append to the store).

Topology (`foreachBatch`, the lakehouse-ingest shape also used by
`streaming.runner.run_upsert_stream`):

- quality gate + decontamination are STATELESS per-row stages — they run
  inside the micro-batch plan untouched.
- exact dedup needs cross-batch memory: "have I accepted this fingerprint
  before?" The state is the store's fingerprint column itself (the same
  "the table is the state" discipline as the upsert sink) — each batch
  anti-joins its candidates against the accepted fingerprints, then
  window-dedups WITHIN the batch. No executor-held state, so executor loss
  costs one micro-batch retry and a restart resumes from the checkpoint.
- chunking is map-side and runs last, so the store holds training chunks.

First-accepted-wins across batches (arrival order), smallest-id-wins within
a batch — documented, deterministic given the batch sequence.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from fxspark.ops.pipeline import curate_corpus
from fxspark.ops.text import fingerprint

CHUNK_SCHEMA = (
    "doc_id long, chunk_idx int, n_tokens int, chunk_text string, fp string"
)


def curate_stream(
    spark: SparkSession,
    docs_dir: str,
    bench: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    **curate_kwargs,
) -> StreamingQuery:
    """File-stream of JSON document drops (``doc_id long, text string``) →
    curated chunk store at ``store_path``."""
    schema = "doc_id long, text string"
    stream = spark.readStream.schema(schema).json(docs_dir)

    def batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.withColumn("fp", fingerprint(F.col("text")))
        if os.path.exists(store_path):
            seen = spark.read.parquet(store_path).select("fp").distinct()
            batch_df = batch_df.join(seen, "fp", "anti")
        chunks = curate_corpus(batch_df, bench, **curate_kwargs)
        out = chunks.join(
            batch_df.select("doc_id", "fp"), "doc_id"
        ).select("doc_id", "chunk_idx", "n_tokens", "chunk_text", "fp")
        out.write.mode("append").parquet(store_path)

    writer = stream.writeStream.foreachBatch(batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
