"""Roundtrip verification: decoded docs must equal the originals
bit-identically (the master invariant, mirroring the reference's
pack/unpack roundtrip tests, /root/reference/src/test.rs:10-55).

Implemented as a join on doc_id + whole-array equality — all JVM-side
(Spark array<int> equality is element-wise), no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def roundtrip_report(original: DataFrame, reassembled: DataFrame) -> DataFrame:
    """Returns one row per doc with a `match` flag; aggregate it with
    `.filter(~match).count()` for the gate."""
    left = original.select("doc_id", F.col("tokens").alias("tokens_in"))
    right = reassembled.select("doc_id", F.col("tokens").alias("tokens_out"))
    joined = left.join(right, "doc_id", "full_outer")
    # empty docs decode to empty arrays; coalesce so null != missing
    return joined.select(
        "doc_id",
        (
            F.col("tokens_in").isNotNull()
            & F.col("tokens_out").isNotNull()
            & (F.coalesce(F.col("tokens_in"), F.array()) == F.coalesce(F.col("tokens_out"), F.array()))
        ).alias("match"),
        F.size(F.coalesce(F.col("tokens_in"), F.array())).alias("n_in"),
        F.size(F.coalesce(F.col("tokens_out"), F.array())).alias("n_out"),
    )


def count_mismatches(original: DataFrame, reassembled: DataFrame) -> int:
    return roundtrip_report(original, reassembled).filter(~F.col("match")).count()
