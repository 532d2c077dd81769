"""The decode operator: encoded rows → token chunks → reassembled docs.

Decode mirrors the reference's streaming unpack
(``par_iter_bp`` + ``collect``, /root/reference/src/packed_seq.rs:684-750,
src/padded_it.rs:90-136): each chunk's payload is expanded back to its
token array inside ``mapInArrow``; per-doc reassembly is the Spark-side
``collect`` — an array_sort over (chunk_idx, tokens) structs so chunk
order is restored regardless of shuffle order.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codecs import get_codec, unpack_bits_le

DECODED_SCHEMA = "doc_id string, chunk_idx int, chunk_tokens array<int>"
DECODED_MASK_SCHEMA = DECODED_SCHEMA + ", mask binary"

_DECODED_PA_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("chunk_idx", pa.int32()),
        ("chunk_tokens", pa.list_(pa.int32())),
    ]
)
_DECODED_MASK_PA_SCHEMA = _DECODED_PA_SCHEMA.append(pa.field("mask", pa.binary()))


def decode_batch_kernel(
    payloads: list[bytes],
    codecs: list[str],
    widths: np.ndarray,
    mins: np.ndarray,
    ns: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode a batch of chunks -> (flat int32 values, int64 offsets).

    bitpack/for chunks whose length is a multiple of 8 are BYTE-ALIGNED
    (n*w ≡ 0 mod 8), so all same-width chunks concatenate into one
    continuous bit stream and decode in a single unpack call — the
    per-chunk Python/numpy call overhead (which dominates on
    4096-token chunks) is paid once per (codec, width) group instead
    of once per chunk. Header-carrying codecs decode per chunk."""
    n_chunks = len(payloads)
    ns = np.asarray(ns, dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(ns))).astype(np.int64)
    flat = np.empty(int(offsets[-1]), np.int32)
    codec_arr = np.asarray(codecs)
    done = np.zeros(n_chunks, dtype=bool)
    groupable = (ns % 8 == 0) & (ns > 0)
    for name in ("bitpack", "for"):
        cand = np.flatnonzero((codec_arr == name) & groupable)
        if len(cand) == 0:
            continue
        wsel = np.asarray(widths)[cand]
        for w in np.unique(wsel):
            if w in (8, 16, 32, 64):
                continue  # memcpy-class per-chunk paths beat the join+scatter
            idx = cand[wsel == w]
            buf = b"".join(payloads[i] for i in idx)
            vals = unpack_bits_le(buf, int(w), int(ns[idx].sum())).astype(np.int64)
            if name == "for":
                vals += np.repeat(np.asarray(mins)[idx], ns[idx])
            pos = 0
            for i in idx:
                k = int(ns[i])
                flat[offsets[i] : offsets[i] + k] = vals[pos : pos + k]
                pos += k
            done[idx] = True
    # dict: its dominant cost is the n-value index stream — also
    # byte-aligned for n%8==0 — so batch the index unpacks by index
    # width; the (small) per-chunk dictionary decode + gather remain
    dcand = np.flatnonzero((codec_arr == "dict") & groupable)
    if len(dcand):
        from ..codecs import packed_size
        from ..codecs.simple import DictCodec

        hdrs = [DictCodec._HDR.unpack_from(payloads[i], 0) for i in dcand]
        wi_arr = np.array([h[2] for h in hdrs])
        hsz = DictCodec._HDR.size
        for w in np.unique(wi_arr):
            if w in (0, 8, 16, 32):
                continue  # constant chunks / memcpy-class index widths
            grp = np.flatnonzero(wi_arr == w)
            sections = []
            for j in grp:
                i = dcand[j]
                card, wd, _ = hdrs[j]
                off = hsz + packed_size(card, wd)
                sections.append(payloads[i][off : off + packed_size(int(ns[i]), int(w))])
            allidx = unpack_bits_le(
                b"".join(sections), int(w), int(ns[dcand[grp]].sum())
            ).astype(np.int64)
            pos = 0
            for j in grp:
                i = dcand[j]
                card, wd, _ = hdrs[j]
                k = int(ns[i])
                uniq = unpack_bits_le(
                    payloads[i][hsz : hsz + packed_size(card, wd)], wd, card
                ).astype(np.int64) + int(mins[i])
                flat[offsets[i] : offsets[i] + k] = uniq[allidx[pos : pos + k]]
                pos += k
            done[dcand[grp]] = True

    for i in range(n_chunks):
        if done[i]:
            continue
        codec = get_codec(codecs[i])
        flat[offsets[i] : offsets[i + 1]] = codec.decode(
            payloads[i], int(ns[i]), int(widths[i]), int(mins[i])
        )
    return flat, offsets


def _decode_map(
    batches: Iterator[pa.RecordBatch], with_mask: bool = False
) -> Iterator[pa.RecordBatch]:
    for batch in batches:
        if batch.num_rows == 0:
            continue
        payloads = batch.column("payload").to_pylist()
        codecs = batch.column("codec").to_pylist()
        widths = batch.column("bit_width").to_numpy(zero_copy_only=False)
        mins = batch.column("min_val").to_numpy(zero_copy_only=False)
        ns = batch.column("n_values").to_numpy(zero_copy_only=False)
        flat, offsets = decode_batch_kernel(payloads, codecs, widths, mins, ns)
        tokens = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(flat, pa.int32())
        )
        arrays = [
            batch.column("doc_id"),
            batch.column("chunk_idx").cast(pa.int32()),
            tokens,
        ]
        if with_mask:
            arrays.append(batch.column("mask"))
        yield pa.RecordBatch.from_arrays(
            arrays,
            schema=_DECODED_MASK_PA_SCHEMA if with_mask else _DECODED_PA_SCHEMA,
        )


def decode_chunks(encoded_df: DataFrame, with_mask: bool = False) -> DataFrame:
    """Encoded DataFrame -> (doc_id, chunk_idx, chunk_tokens[, mask]).

    ``with_mask=True`` carries the per-chunk validity bitmap (the
    PackedNSeq pairing) through unchanged; decode it per chunk with
    ``tokseq.validity.unpack_mask(mask, len(chunk_tokens))`` (null =
    all positions valid)."""
    cols = ["doc_id", "chunk_idx", "codec", "bit_width", "n_values", "min_val", "payload"]
    if with_mask:
        cols.append("mask")
    return encoded_df.select(*cols).mapInArrow(
        lambda it: _decode_map(it, with_mask),
        DECODED_MASK_SCHEMA if with_mask else DECODED_SCHEMA,
    )


def reassemble_docs(decoded_df: DataFrame) -> DataFrame:
    """(doc_id, chunk_idx, chunk_tokens) -> (doc_id, tokens).

    array_sort over structs orders by chunk_idx (first struct field),
    so reassembly is shuffle-order-independent.

    NOTE (scale): reassembly materializes one row per document, so a
    10^8-token doc becomes a ~400MB row on one executor. That is the
    cost of asking for whole documents; consumers that can stream
    should read (doc_id, chunk_idx, chunk_tokens) from decode_chunks
    directly and keep chunk granularity."""
    return decoded_df.groupBy("doc_id").agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk_tokens"))),
                lambda s: s.getField("chunk_tokens"),
            )
        ).alias("tokens")
    )
