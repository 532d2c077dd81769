"""tokseq — a PySpark-native per-column lightweight-compression engine.

Built from scratch with the capabilities of rust-seq/packed-seq
(`/root/reference`), re-expressed Spark-first: token arrays are exploded
into fixed-width column chunks, each chunk is encoded by the
minimal-size codec among {bitpack, frame-of-reference, RLE,
dictionary, patched-FoR (sparse exceptions), two-bucket split,
FSST-style byte-gram symbol table},
and the encoded table carries a manifest enabling checkpoint resume.

The reference's SIMD-lane parallelism maps to Arrow record batches
processed by vectorized numpy kernels inside ``mapInArrow``; its
multi-sequence buffers map to Spark partitions of chunk rows.

Layout:
    tokseq.codecs    pure-numpy encode/decode kernels (no Spark import)
    tokseq.stats     vectorized per-chunk statistics (segmented reduceat)
    tokseq.selector  per-chunk codec auto-selection by estimated size
    tokseq.datagen   deterministic synthetic corpus (seeded)
    tokseq.engine    Spark pipeline: chunk -> encode -> manifest -> resume
                     (+ engine.agg: compressed-domain aggregate pushdown)
    tokseq.bpe       distributed iterative BPE vocabulary learning
    tokseq.multimodal / tokseq.validity / tokseq.seqops
                     media binary columns, validity bitmaps, sequence ops
"""

__version__ = "0.1.0"
