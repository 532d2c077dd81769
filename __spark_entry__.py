"""Driver contract for the spark-graft builder (PySpark target).

entry(): flagship — tokenize sf0.001 documents deterministically, run
the full encode→decode→verify engine, return the per-source summary.
queries()/oracle_sql(): operator analogs from SURVEY.md §2 with DuckDB
oracles (see tokseq/queries.py), plus rows-only engine queries.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from tokseq.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["engine_roundtrip"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
