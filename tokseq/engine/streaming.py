"""Structured Streaming ingestion: encode token corpora as they land.

The reference is a batch library (SURVEY §2.5: no streaming), but a
training-data pipeline ingests continuously; this wires the same
encode kernel into a file-source stream via ``foreachBatch``:

    new parquet files -> micro-batch DataFrame -> plan_chunks ->
    encode_chunks -> append to encoded/ + manifest/chunks/

Exactly-once story: foreachBatch is at-least-once under retries; chunk
ids are deterministic and payloads idempotent, so readers dedup on
(doc_id, chunk_idx) exactly as the batch resume path does
(pipeline.EncodeJob.decode). The streaming checkpoint tracks which
FILES were consumed; the manifest stays the source of truth for which
CHUNKS exist.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .chunk import DEFAULT_CHUNK_WIDTH, plan_chunks, repartition_chunks
from .encode import encode_chunks
from .manifest import chunk_manifest
from .resume import DEFAULT_BUCKETS, with_bucket

TOKSEQ_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"


def stream_encode(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    chunk_width: int = DEFAULT_CHUNK_WIDTH,
    n_buckets: int = DEFAULT_BUCKETS,
    enable_fsst: bool = True,
    available_now: bool = True,
    num_partitions: int | None = None,
):
    """Start (and, with available_now, drain) a streaming encode.

    Returns the StreamingQuery. ``available_now=True`` processes all
    currently-visible files then stops — the batch-ingest-as-stream
    mode; with False it keeps running on a micro-batch trigger."""
    parts = num_partitions or spark.sparkContext.defaultParallelism
    encoded_path = os.path.join(out_dir, "encoded")
    manifest_path = os.path.join(out_dir, "manifest", "chunks")
    checkpoint = os.path.join(out_dir, "_checkpoint")

    stream = (
        spark.readStream.schema(TOKSEQ_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )

    def process(batch_df, batch_id: int) -> None:
        chunks = repartition_chunks(plan_chunks(batch_df, chunk_width), parts)
        enc = with_bucket(
            encode_chunks(chunks, enable_fsst, chunk_width), n_buckets
        )
        enc = enc.repartition(parts, "bucket").sortWithinPartitions("bucket")
        enc.persist()
        try:
            enc.write.mode("append").parquet(encoded_path)
            chunk_manifest(enc).write.mode("append").parquet(manifest_path)
        finally:
            enc.unpersist()

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
