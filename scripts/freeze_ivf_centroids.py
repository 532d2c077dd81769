#!/usr/bin/env python
"""Regenerate the frozen IVF codebook embedded in tokseq/queries.py
(_IVF_FROZEN / _IVF_FROZEN_HALF and the centroid literals inside
ORACLE_IVF_ASSIGN / ORACLE_IVF_TOPK_FROZEN).

The codebook is the SAME deterministic Lloyd training the live
``embedding_ivf_topk`` query runs (K=8, 5 iterations, hash-random
256-vector sample), executed once on the sf0.01 embeddings and rounded
to 6 decimals. Freezing it turns the IVF SERVING path (cell assignment,
probed top-k) into plain relational algebra over constants, so the
driver's DuckDB hash check covers it; only the training loop remains
rows-only.

Usage: python scripts/freeze_ivf_centroids.py [sf_dir]  # prints literals
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import numpy as np
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from tokseq.queries import _ivf_centroids

    cent = np.round(_ivf_centroids(spark, sf_dir), 6)
    spark.stop()

    print("_IVF_FROZEN = [")
    for row in cent:
        print("    [" + ", ".join(repr(float(x)) for x in row) + "],")
    print("]")
    halves = [float((c * c).sum() / 2.0) for c in cent]
    print(f"\n_IVF_FROZEN_HALF = {halves!r}")
    print("\n-- SQL VALUES rows (cell, c, h):")
    for j, (c, h) in enumerate(zip(cent, halves)):
        lit = "[" + ", ".join(repr(float(x)) for x in c) + "]::DOUBLE[]"
        print(f"  ({j}, {lit}, {h!r}),")


if __name__ == "__main__":
    main()
