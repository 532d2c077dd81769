"""Checkpoint resume: pending = planned chunks − already-encoded chunks.

The chunk manifest is the source of truth. Resume is a left-anti join
on (doc_id, chunk_idx) — Spark's `exceptAll` analog on keys (SURVEY
§2.5 set-ops row). Determinism of chunking (same input + same
chunk_width → same keys) makes re-encoding idempotent.

At 10^12-sequence scale the anti-join is itself a big shuffle, so the
manifest also carries a `bucket` column (pmod of xxhash64(doc_id)):
a resume first prunes whole buckets whose chunk counts match the
plan (cheap aggregate compare — partition-pruning analog), then
anti-joins only within incomplete buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 256


def with_bucket(df: DataFrame, n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_buckets)).cast("int")
    )


def pending_chunks(
    planned: DataFrame, manifest: DataFrame | None, n_buckets: int = DEFAULT_BUCKETS
) -> DataFrame:
    """planned: chunked docs (with or without bucket); manifest: chunk
    manifest of completed work (may be None/empty)."""
    if "bucket" not in planned.columns:
        planned = with_bucket(planned, n_buckets)
    if manifest is None:
        return planned
    done = manifest.select("doc_id", "chunk_idx")

    # bucket-level pruning: buckets where done-count == planned-count
    planned_cnt = planned.groupBy("bucket").count().withColumnRenamed("count", "planned_n")
    done_cnt = (
        manifest.groupBy("bucket").count().withColumnRenamed("count", "done_n")
    )
    complete = (
        planned_cnt.join(done_cnt, "bucket")
        .filter(F.col("planned_n") == F.col("done_n"))
        .select("bucket")
    )
    incomplete = planned.join(F.broadcast(complete), "bucket", "left_anti")
    return incomplete.join(done, ["doc_id", "chunk_idx"], "left_anti")
