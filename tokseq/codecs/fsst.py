"""FSST-style byte-gram symbol-table codec.

A faithful-but-vectorizable variant of FSST (Boncz/Neumann/Leis,
VLDB'20 "FSST: Fast Random Access String Compression") specialized to
token streams, per SURVEY §7.2: tokens are viewed as little-endian
bytes (1/2/4/8 bytes per token after frame-of-reference shift), a
symbol table of frequent byte-grams is learned by iterative
vectorized byte-pair rounds (each learned symbol expands to 2..2^R
source bytes), and the stream is emitted as 1-byte codes with an
escape byte for literals that collide with assigned code values.

Everything — pair counting, greedy non-overlapping replacement,
escape resolution, expansion — is whole-array numpy. The greedy
left-to-right pair selection uses the alternating-run trick: within a
maximal run of consecutive candidate positions, every other position
starting at the run head is selected (identical to sequential greedy).

Reference parity: this plays the role the reference's byte-level
packing tricks play for DNA — exploiting distributional redundancy the
plain bitpack floor can't see. It is only ever *chosen* by the
selector when its actual encoded size beats every other codec, so the
north-rule size bound (<= bitpack floor) is preserved.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import Codec, Encoded, as_int64, register

_ESC = 255
_MAX_SYMBOLS = 254
_MIN_PAIR_COUNT = 8
_ROUNDS = 2
_HDR = struct.Struct("<BB")  # byte_width, n_symbols
_ID_EXP_BASE = {b: bytes([b]) for b in range(256)}


def _byte_width(max_delta: int) -> int:
    if max_delta < 1 << 8:
        return 1
    if max_delta < 1 << 16:
        return 2
    if max_delta < 1 << 32:
        return 4
    return 8


def _to_bytes(deltas: np.ndarray, bw: int) -> np.ndarray:
    """LE byte view, shape (n*bw,) uint8."""
    return deltas.astype(f"<u{bw}").view(np.uint8)


def _from_bytes(raw: np.ndarray, bw: int) -> np.ndarray:
    return raw.view(f"<u{bw}").astype(np.int64)


def _greedy_select(cand: np.ndarray) -> np.ndarray:
    """Greedy leftmost non-overlapping selection over candidate pair
    positions: within each run of consecutive True, pick every other
    position starting at the run head."""
    n = len(cand)
    if n == 0:
        return cand
    pos = np.arange(n)
    head = cand.copy()
    head[1:] &= ~cand[:-1]
    start = np.where(head, pos, -1)
    start = np.maximum.accumulate(start)
    return cand & (((pos - start) & 1) == 0)


def _learn_and_replace(stream: np.ndarray, budget: int):
    """One BPE round. Returns (new_stream, pairs) where pairs is an
    (k, 2) array of the symbol ids each new id expands to."""
    m = len(stream)
    if m < 2 or budget <= 0:
        return stream, np.zeros((0, 2), dtype=np.int64)
    alpha = int(stream.max()) + 1
    pair_ids = stream[:-1].astype(np.int32) * np.int32(alpha) + stream[1:]
    # sort-based counting: streams are chunk-sized (cache-resident), so
    # unique+counts beats bincount/LUT over the alpha^2 pair space
    # (those alloc+memset megabytes per chunk and thrash the cache)
    uniq, counts = np.unique(pair_ids, return_counts=True)
    good = counts >= _MIN_PAIR_COUNT
    if not good.any():
        return stream, np.zeros((0, 2), dtype=np.int64)
    guniq = uniq[good]
    gcounts = counts[good]
    order = np.argsort(gcounts, kind="stable")[::-1][:budget]
    top = guniq[order]  # pair ids, count-descending
    top_sorted = np.sort(top)
    # rank: position in top_sorted -> count-descending new id
    rank = np.empty(len(top), dtype=np.int32)
    rank[np.searchsorted(top_sorted, top)] = np.arange(len(top), dtype=np.int32)
    idx = np.searchsorted(top_sorted, pair_ids).clip(max=len(top_sorted) - 1)
    cand = top_sorted[idx] == pair_ids
    mapped = np.where(cand, rank[idx], -1)
    sel = _greedy_select(cand)
    if not sel.any():
        return stream, np.zeros((0, 2), dtype=np.int64)
    # next free symbol id must be global across rounds — caller rebases
    out = stream.astype(np.int32, copy=True)
    out[:-1][sel] = mapped[sel] + alpha  # temp ids alpha..alpha+k-1
    keep = np.ones(m, dtype=bool)
    keep[1:][sel] = False
    pairs = np.stack([top // alpha, top % alpha], axis=1)
    return out[keep], pairs


class FsstCodec(Codec):
    """payload layout:
        <u1 bw, u1 L>
        L * <u1 code_value, u1 exp_len>
        concatenated expansion bytes
        code stream (escaped literals = ESC + byte)
    min_val column holds the frame-of-reference shift; bit_width column
    holds the effective bitpack width of the chunk (for floor math).
    """

    name = "fsst"

    def encode(self, values: np.ndarray, budget_bytes: int | None = None):
        """Encode; if ``budget_bytes`` is given and a cheap upper-bound
        estimate says this chunk cannot come in under it, returns None
        (the selector then keeps its cheaper codec — wasted full
        encodes are the kernel's main cost on fsst-hostile data)."""
        v = as_int64(values)
        n = len(v)
        if n == 0:
            return Encoded(b"", 0, 0)
        lo = int(v.min())
        d = v - lo
        hi = int(d.max())
        w = max(1, hi.bit_length())
        bw = _byte_width(hi)
        stream = _to_bytes(d, bw).astype(np.int32)

        if budget_bytes is not None and len(stream) >= 512:
            pair_ids = stream[:-1] * np.int32(256) + stream[1:]
            counts = np.unique(pair_ids, return_counts=True)[1]
            k = min(_MAX_SYMBOLS, len(counts))
            top_sum = int(np.partition(counts, len(counts) - k)[-k:].sum())
            saved_ub = min(top_sum, len(stream) // 2)
            est_out = len(stream) - int(0.75 * saved_ub) + 3 * k // 4 + 4
            if est_out >= budget_bytes:
                return None

        # --- learn symbol table over up to _ROUNDS BPE rounds ---
        # expansions[i] = byte string for symbol id 256+i
        expansions: list[bytes] = []
        id_exp = dict(_ID_EXP_BASE)
        for _ in range(_ROUNDS):
            budget = _MAX_SYMBOLS - len(expansions)
            prev_alpha = int(stream.max()) + 1 if len(stream) else 256
            new_stream, pairs = _learn_and_replace(stream, budget)
            if len(pairs) == 0:
                break
            # rebase temp ids (prev_alpha + j) -> global id 256 + len(expansions) + j
            base_global = 256 + len(expansions)
            tmp = new_stream >= prev_alpha
            new_stream[tmp] = new_stream[tmp] - prev_alpha + base_global
            for j, (a, b) in enumerate(pairs):
                e = id_exp[int(a)] + id_exp[int(b)]
                id_exp[base_global + j] = e
                expansions.append(e)
            stream = new_stream

        # drop learned symbols that never appear in the final stream
        # (replaced in a later round); remap stream ids densely.
        used = np.unique(stream[stream >= 256]) if len(stream) else np.zeros(0, np.int64)
        remap = {int(s): 256 + i for i, s in enumerate(used)}
        if len(used):
            lut = np.arange(256 + len(expansions), dtype=np.int32)
            for old, new in remap.items():
                lut[old] = new
            stream = lut[stream]
        expansions = [id_exp[int(s)] for s in used]
        L = len(expansions)

        # --- choose code byte values: least frequent literal bytes ---
        lit_freq = np.bincount(stream[stream < 256], minlength=256).astype(np.int64)
        order = np.argsort(lit_freq, kind="stable")
        code_values = [int(b) for b in order if b != _ESC][:L]
        needs_escape = np.zeros(256, dtype=bool)
        needs_escape[_ESC] = True
        needs_escape[code_values] = True
        sym_code = np.array(code_values, dtype=np.uint8)

        # --- emit ---
        is_dict = stream >= 256
        lit_vals = np.where(is_dict, 0, stream)
        esc = (~is_dict) & needs_escape[lit_vals]
        lens = np.where(is_dict | ~esc, 1, 2)
        off = np.concatenate(([0], np.cumsum(lens)))
        out = np.empty(off[-1], dtype=np.uint8)
        one = lens == 1
        out[off[:-1][one]] = np.where(
            is_dict[one],
            sym_code[(stream[one] - 256).clip(min=0)] if L else 0,
            stream[one],
        ).astype(np.uint8)
        two = ~one
        out[off[:-1][two]] = _ESC
        out[off[:-1][two] + 1] = stream[two].astype(np.uint8)

        header = bytearray(_HDR.pack(bw, L))
        for c, e in zip(code_values, expansions):
            header += bytes([c, len(e)])
        for e in expansions:
            header += e
        payload = bytes(header) + out.tobytes()
        return Encoded(payload, w, lo)

    def decode(self, payload: bytes, n: int, bit_width: int, min_val: int) -> np.ndarray:
        if n == 0:
            return np.zeros(0, dtype=np.int64)
        bw, L = _HDR.unpack_from(payload, 0)
        off = _HDR.size
        codes = np.frombuffer(payload, np.uint8, count=2 * L, offset=off)
        code_vals = codes[0::2].astype(np.int64)
        exp_lens = codes[1::2].astype(np.int64)
        off += 2 * L
        exp_total = int(exp_lens.sum())
        exp_bytes = np.frombuffer(payload, np.uint8, count=exp_total, offset=off)
        off += exp_total
        stream = np.frombuffer(payload, np.uint8, offset=off)

        # table: identity region [0..255], then expansions
        tab_bytes = np.concatenate([np.arange(256, dtype=np.uint8), exp_bytes])
        tab_off = np.arange(256, dtype=np.int64)
        tab_len = np.ones(256, dtype=np.int64)
        if L:
            exp_offs = 256 + np.concatenate(([0], np.cumsum(exp_lens)[:-1]))
            tab_off = tab_off.copy()
            tab_len = tab_len.copy()
            tab_off[code_vals] = exp_offs
            tab_len[code_vals] = exp_lens

        # resolve escapes (alternating within runs of ESC-valued bytes)
        m = len(stream)
        is_escv = stream == _ESC
        real_esc = _greedy_select(is_escv.copy())
        consumed = np.zeros(m, dtype=bool)
        consumed[1:] = real_esc[:-1]
        tok_pos = np.flatnonzero(~consumed)
        sym = stream[tok_pos].astype(np.int64)
        esc_tok = real_esc[tok_pos]
        lit_after = np.zeros(len(tok_pos), dtype=np.int64)
        if esc_tok.any():
            lit_after[esc_tok] = stream[tok_pos[esc_tok] + 1]
        src_off = np.where(esc_tok, lit_after, tab_off[sym])
        src_len = np.where(esc_tok, 1, tab_len[sym])

        total = int(src_len.sum())
        out_off = np.concatenate(([0], np.cumsum(src_len)[:-1]))
        idx = (
            np.arange(total, dtype=np.int64)
            - np.repeat(out_off, src_len)
            + np.repeat(src_off, src_len)
        )
        raw = tab_bytes[idx]
        return _from_bytes(raw, bw) + min_val


FSST = register(FsstCodec())
