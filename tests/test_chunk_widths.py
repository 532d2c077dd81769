"""FIXTURES.md F5: roundtrip holds across chunk widths {64, 256, 1000,
4096}, and engine output decodes identically with FSST on or off
(codec-independence at the engine level)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tokseq.engine.chunk import plan_chunks, repartition_chunks
from tokseq.engine.decode import decode_chunks, reassemble_docs
from tokseq.engine.encode import encode_chunks
from tokseq.engine.verify import count_mismatches


@pytest.fixture(scope="module")
def small_corpus(spark):
    from tokseq.datagen import generate_corpus

    return spark.createDataFrame(
        generate_corpus(scale=0.05, chunk_width=1000).to_pandas()
    ).cache()


@pytest.mark.parametrize("w", [64, 256, 1000, 4096])
def test_roundtrip_any_chunk_width(spark, small_corpus, w):
    enc = encode_chunks(
        repartition_chunks(plan_chunks(small_corpus, w), 4), chunk_width=w
    )
    back = reassemble_docs(decode_chunks(enc))
    assert count_mismatches(small_corpus.select("doc_id", "tokens"), back) == 0


def test_fsst_toggle_decodes_identical(spark, small_corpus):
    outs = []
    for fsst in (True, False):
        enc = encode_chunks(
            repartition_chunks(plan_chunks(small_corpus, 512), 4),
            enable_fsst=fsst, chunk_width=512,
        )
        back = reassemble_docs(decode_chunks(enc))
        assert count_mismatches(small_corpus.select("doc_id", "tokens"), back) == 0
        outs.append(
            enc.agg(F.sum("out_bytes").alias("o"), F.count("*").alias("c")).collect()[0]
        )
    # same chunk counts either way; fsst-off can only be >= in size
    assert outs[0]["c"] == outs[1]["c"]
    assert outs[0]["o"] <= outs[1]["o"]
