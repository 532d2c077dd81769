"""SparkSession builder with the engine's pinned configs.

Local mode is the test/bench harness; on a real cluster the same
configs apply (only master/executor sizing changes, supplied by
spark-submit). AQE is on so the post-encode coalesce and skew-join
handling are runtime-adaptive.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# chunk rows carry up to chunk_width int32 values (~16 KB at 4096);
# 1024 rows/batch keeps Arrow batches ~16-64 MB in the Python worker.
ARROW_BATCH_ROWS = 1024


def get_spark(
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    app_name: str = "tokseq",
) -> SparkSession:
    b = SparkSession.builder.appName(app_name)
    if cores is not None:
        b = b.master(f"local[{cores}]")
        if shuffle_partitions is None:
            shuffle_partitions = max(cores, 8)
    if shuffle_partitions is not None:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return (
        b.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS))
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
