"""Document → fixed-width chunk explosion, declaratively (pure Catalyst).

One doc of n tokens becomes ceil(n/W) rows (min 1, so empty docs
survive the roundtrip) keyed by (doc_id, chunk_idx). This is the
engine analog of the reference splitting one sequence into 8
SIMD-lane chunks (/root/reference/src/lib.rs:38-41,
src/packed_seq.rs:692-718) — except our "lanes" are cluster-wide
partitions, so a single 10^8-token document spreads over many
executors instead of pinning one (SURVEY §7.2 skew).

Chunking happens BEFORE the shuffle; the subsequent repartition hashes
(doc_id, chunk_idx), which is exactly the salted repartition the north
rule asks for: the chunk_idx term is the salt that breaks up giant
docs, and the hash spreads hot sources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_CHUNK_WIDTH = 4096


def chunk_docs(df: DataFrame, chunk_width: int = DEFAULT_CHUNK_WIDTH) -> DataFrame:
    """(doc_id, tokens, n_tok, source) -> (doc_id, source, chunk_idx, chunk_tokens).

    All JVM-side (sequence/transform/slice/posexplode); no Python.
    """
    w = int(chunk_width)
    n_chunks = F.greatest(F.ceil(F.col("n_tok") / F.lit(w)).cast("int"), F.lit(1))
    slices = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(F.col("tokens"), i * w + 1, w),
    )
    return df.select(
        "doc_id",
        "source",
        F.posexplode(slices).alias("chunk_idx", "chunk_tokens"),
    )


def repartition_chunks(chunks: DataFrame, num_partitions: int) -> DataFrame:
    """Salted shuffle: hash(doc_id, chunk_idx) spreads long docs; also
    mixes sources so low-cardinality hot sources can't skew."""
    return chunks.repartition(num_partitions, "doc_id", "chunk_idx")
