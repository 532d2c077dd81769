"""The encode operator: chunk rows → encoded rows, via ``mapInArrow``.

Per Arrow batch (the engine's SIMD lane group, SURVEY §1.4):
  1. flatten the list<int32> column to (values, offsets) — columnar,
     zero per-row Python;
  2. segmented stats + vectorized codec selection (stats.py/selector.py);
  3. encode each chunk with its selected codec (numpy kernels);
     try-encode FSST on flagged candidates; fall back to bitpack if a
     heuristic codec ever exceeds the reference floor — making the
     north-rule size bound unconditional;
  4. emit (keys, codec, bit_width, n_values, min_val, payload, sizes).

The Python loop here is per-CHUNK (>= thousands of values each, all
work inside numpy) — the same granularity at which Parquet encodes
pages; per-token work is always whole-array.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

from ..codecs import get_codec, packed_size
from ..selector import CODEC_NAMES, select
from ..stats import compute_chunk_stats

ENCODED_SCHEMA = (
    "doc_id string, chunk_idx int, source string, codec string, "
    "bit_width int, n_values long, min_val long, payload binary, "
    "in_bytes long, out_bytes long, floor_bytes long, part_id int"
)

_ENCODED_PA_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("chunk_idx", pa.int32()),
        ("source", pa.string()),
        ("codec", pa.string()),
        ("bit_width", pa.int32()),
        ("n_values", pa.int64()),
        ("min_val", pa.int64()),
        ("payload", pa.binary()),
        ("in_bytes", pa.int64()),
        ("out_bytes", pa.int64()),
        ("floor_bytes", pa.int64()),
        ("part_id", pa.int32()),
    ]
)


def list_column_to_numpy(arr: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """Arrow list<int*> column -> (flat int64 values, int64 offsets).

    Robust to chunked and sliced arrays (``flatten()`` respects the
    slice; offsets are rebuilt from per-row lengths)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    values = arr.flatten().to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    lens = arr.value_lengths().to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(lens)))
    return values, offsets


def encode_batch_kernel(
    values: np.ndarray, offsets: np.ndarray, enable_fsst: bool = True
):
    """Encode a batch of chunks. Returns dict of per-chunk output arrays."""
    st = compute_chunk_stats(values, offsets)
    if len(st.vmin) and st.vmin.min() < 0:
        bad = int(np.argmin(st.vmin))
        raise ValueError(
            f"negative token value in chunk {bad} (min={st.vmin[bad]}); "
            "token domain is [0, 2^31)"
        )
    sel = select(st, enable_fsst=enable_fsst)
    names = sel.names()
    nseg = st.n_chunks

    payloads: list[bytes] = []
    out_codec: list[str] = []
    out_width = np.zeros(nseg, dtype=np.int32)
    out_min = np.zeros(nseg, dtype=np.int64)
    fsst = get_codec("fsst")
    bitpack = get_codec("bitpack")
    for i in range(nseg):
        v = values[offsets[i] : offsets[i + 1]]
        name = names[i]
        codec = get_codec(name)
        if name == "pfor":
            enc = codec.encode(v, base_width=int(sel.pfor_width[i]))
        else:
            enc = codec.encode(v)
        if len(enc.payload) > sel.floor_bytes[i]:
            # estimate was wrong (only possible for heuristic codecs):
            # fall back to the floor-exact bitpack
            name, enc = "bitpack", bitpack.encode(v)
        if sel.fsst_candidate[i]:
            fenc = fsst.encode(v)
            if len(fenc.payload) < len(enc.payload):
                name, enc = "fsst", fenc
        payloads.append(enc.payload)
        out_codec.append(name)
        out_width[i] = enc.bit_width
        out_min[i] = enc.min_val

    return {
        "codec": out_codec,
        "bit_width": out_width,
        "n_values": st.n,
        "min_val": out_min,
        "payload": payloads,
        "in_bytes": st.n * 4,
        "out_bytes": np.array([len(p) for p in payloads], dtype=np.int64),
        "floor_bytes": sel.floor_bytes.astype(np.int64),
    }


def _encode_map(batches: Iterator[pa.RecordBatch], enable_fsst: bool) -> Iterator[pa.RecordBatch]:
    from pyspark import TaskContext

    ctx = TaskContext.get()
    part_id = ctx.partitionId() if ctx is not None else -1
    for batch in batches:
        if batch.num_rows == 0:
            continue
        values, offsets = list_column_to_numpy(batch.column("chunk_tokens"))
        out = encode_batch_kernel(values, offsets, enable_fsst)
        n = batch.num_rows
        yield pa.RecordBatch.from_arrays(
            [
                batch.column("doc_id"),
                batch.column("chunk_idx").cast(pa.int32()),
                batch.column("source"),
                pa.array(out["codec"], pa.string()),
                pa.array(out["bit_width"], pa.int32()),
                pa.array(out["n_values"], pa.int64()),
                pa.array(out["min_val"], pa.int64()),
                pa.array(out["payload"], pa.binary()),
                pa.array(out["in_bytes"], pa.int64()),
                pa.array(out["out_bytes"], pa.int64()),
                pa.array(out["floor_bytes"], pa.int64()),
                pa.array(np.full(n, part_id, dtype=np.int32), pa.int32()),
            ],
            schema=_ENCODED_PA_SCHEMA,
        )


def encode_chunks(chunks_df, enable_fsst: bool = True):
    """(doc_id, source, chunk_idx, chunk_tokens) -> encoded DataFrame."""
    return chunks_df.mapInArrow(
        lambda it: _encode_map(it, enable_fsst), ENCODED_SCHEMA
    )
