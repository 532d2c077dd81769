"""Pipeline edge cases: empty input table, negative (out-of-domain)
tokens, and an all-empty-docs table."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tokseq.engine.chunk import plan_chunks, repartition_chunks
from tokseq.engine.encode import encode_chunks


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "tokens", "n_tok", "source"])
    )


def test_empty_table(spark):
    df = _df(spark, [("d0", [1, 2], 2, "s")]).filter(F.col("n_tok") > 99)
    enc = encode_chunks(repartition_chunks(plan_chunks(df, 512), 2))
    assert enc.count() == 0


def test_all_empty_docs(spark):
    rows = [(f"d{i}", [], 0, "s") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>, n_tok int, source string")
    enc = encode_chunks(repartition_chunks(plan_chunks(df, 512), 2))
    out = enc.collect()
    assert len(out) == 10
    assert all(r["n_values"] == 0 and r["out_bytes"] == 0 for r in out)


def test_negative_tokens_rejected(spark):
    rows = [("bad", [3, -1, 5], 3, "s")]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>, n_tok int, source string")
    enc = encode_chunks(repartition_chunks(plan_chunks(df, 512), 2))
    with pytest.raises(Exception, match="negative token|PythonException"):
        enc.collect()
