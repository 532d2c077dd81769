"""Bit-packing kernel: n unsigned values at w bits each, little-endian
field order within the byte stream.

Semantics replicate the reference's pack/unpack pair generalized to
arbitrary widths 1..64:
  - field i occupies bits [i*w, (i+1)*w) of the stream, LSB-first
    within each byte (reference: ``pack_kmer_lossy`` fold order,
    /root/reference/src/packed_seq.rs:217-232, and the byte layout of
    ``PackedSeqVecBase<B>``, /root/reference/src/packed_seq.rs:106-148).
  - the tail byte is zero-padded (reference scalar tail,
    /root/reference/src/packed_seq.rs:1343-1356).
  - packed size is exactly ceil(n*w/8) bytes — the "reference floor"
    (/root/reference/src/packed_seq.rs:152-168); no 48-byte padding is
    carried (``into_raw`` strips it, :1118-1121) because numpy kernels
    are bounds-safe.

Everything is whole-array numpy; no per-element Python.
"""

from __future__ import annotations

import numpy as np

__all__ = ["pack_bits_le", "unpack_bits_le", "bit_length", "packed_size"]

_POW2 = (np.uint64(1) << np.arange(64, dtype=np.uint64)).astype(np.uint64)


def bit_length(values: np.ndarray) -> np.ndarray:
    """Element-wise bit length of non-negative ints (0 -> 0).

    Fast path: frexp exponent (exact for v < 2^53); falls back to an
    exact searchsorted over powers of two for larger values.
    """
    v = np.asarray(values)
    if v.size == 0:
        return np.zeros(0, dtype=np.int64)
    mx = int(v.max()) if v.size else 0
    if mx < (1 << 24):
        # float32 mantissa holds ints < 2^24 exactly — half the
        # conversion traffic of the float64 tier (this is the hot tier:
        # token deltas are vocab-sized)
        return np.frexp(v.astype(np.float32))[1]  # int32, exact
    if mx < (1 << 53):
        return np.frexp(v.astype(np.float64))[1]  # int32, exact
    vv = v.astype(np.uint64, copy=False)
    return np.searchsorted(_POW2, vv, side="right").astype(np.int64)


def packed_size(n: int, width: int) -> int:
    """ceil(n*w/8) bytes — the reference bitpack floor."""
    return (int(n) * int(width) + 7) // 8


def pack_bits_le(values: np.ndarray, width: int) -> bytes:
    """Pack ``values`` (each in [0, 2**width)) at ``width`` bits, LE field
    order. Returns exactly ``packed_size(n, width)`` bytes.

    Bandwidth-conscious: works in uint32 whenever width <= 32 (the
    whole token domain) — the wide intermediate is the main memory
    cost of the bit-matrix expansion."""
    n = len(values)
    if n == 0 or width == 0:
        return b""
    if not 1 <= width <= 64:
        raise ValueError(f"width must be in 1..64, got {width}")
    if width == 8:
        return np.ascontiguousarray(values, dtype=np.uint8).tobytes()
    if width == 16:
        return np.ascontiguousarray(values, dtype="<u2").tobytes()
    if width == 32:
        return np.ascontiguousarray(values, dtype="<u4").tobytes()
    if width == 64:
        return np.ascontiguousarray(values, dtype="<u8").tobytes()
    if width in (1, 2, 4):
        # strided OR-combine: g=8/w values per byte, no bit matrix.
        # This is the numpy rendering of the reference's pext body
        # (/root/reference/src/packed_seq.rs:1204-1222): g lanes
        # shifted into place and OR-merged per output byte.
        g = 8 // width
        nbytes = (n + g - 1) // g
        vb = np.ascontiguousarray(values, dtype=np.uint8)
        if n % g:
            vb = np.concatenate([vb, np.zeros(g - n % g, np.uint8)])
        out = vb[0::g].copy()
        for j in range(1, g):
            out |= vb[j::g] << np.uint8(j * width)
        return out[:nbytes].tobytes()
    if n <= 192:
        # tiny segments: big-int accumulation beats the multi-pass
        # numpy kernels' fixed per-call setup (mirror of the tiny
        # unpack path below)
        big = 0
        for i, x in enumerate(np.asarray(values, dtype=np.uint64).tolist()):
            big |= x << (i * width)
        return big.to_bytes(packed_size(n, width), "little")
    if width < 32:  # all remaining widths < 32 (3,5,6,7, 9..15, 17..31)
        return _pack_double(values, width, n)
    # widths 33..64: word-lane packing. Groups of g = lcm(w,64)/w
    # values fill exactly W = lcm(w,64)/64 u64 words; with w > 32 each
    # word holds <= 2 lane starts and each word boundary is straddled
    # by <= 1 lane, so the whole group is one gather + two
    # distinct-column ORs — no segmented reduction.
    return _pack_words(np.ascontiguousarray(values, dtype=np.uint64), width, n)


def _pack_double(values, width: int, n: int) -> bytes:
    """Pair-doubling pack for widths < 32 not on a fast path: fuse
    value pairs into one 2w-bit field — the bit layout is unchanged
    (field i of the pair stream covers exactly bits [2i*w, (2i+2)*w))
    — until the width exceeds 32, then finish on the word-lane path.
    Each level is two contiguous strided ops and HALVES the element
    count (e.g. 3->6->12->24->48, 11->22->44); trailing padding bits
    are zero, so truncating to the exact floor preserves the
    zero-padded-tail format."""
    levels = 0
    w = width
    while w <= 32:
        w <<= 1
        levels += 1
    m = 1 << levels
    npad = (n + m - 1) // m * m
    vv = np.zeros(npad, dtype=np.uint64)
    vv[:n] = values
    w = width
    for _ in range(levels):
        vv = vv[0::2] | (vv[1::2] << np.uint64(w))
        w <<= 1
    return _pack_words(vv, w, len(vv))[: packed_size(n, width)]


def _group_geometry(width: int) -> tuple[int, int]:
    """(values per group, u64 words per group) with exact alignment."""
    import math

    L = math.lcm(width, 64)
    return L // width, L // 64


_LANE_GEO_CACHE: dict[int, tuple] = {}


def _lane_geometry(width: int):
    """Per-lane shift/word-index tables for one lcm(w,64) group
    (cached: recomputing the aranges per pack call costs more than the
    pack of a small chunk itself)."""
    geo = _LANE_GEO_CACHE.get(width)
    if geo is None:
        geo = _lane_geometry_build(width)
        _LANE_GEO_CACHE[width] = geo
    return geo


def _lane_geometry_build(width: int):
    g, W = _group_geometry(width)
    lanes = np.arange(g, dtype=np.int64)
    bit = lanes * width
    wi = (bit // 64).astype(np.int64)
    sh = (bit % 64).astype(np.uint64)
    spill = sh.astype(np.int64) + width - 64  # >0: lane straddles words
    # first lane of each word-index group (wi is nondecreasing)
    starts = np.flatnonzero(np.diff(wi, prepend=-1))
    return g, W, wi, sh, spill, starts


def _pack_words(v: np.ndarray, width: int, n: int) -> bytes:
    # only widths > 32 reach here (smaller widths pair-double first),
    # which guarantees: every word has a lane starting in it, <= 2
    # lanes start per word, and <= 1 lane straddles each boundary —
    # all the column index sets below are therefore distinct.
    g, W, wi, sh, spill, starts = _lane_geometry(width)
    ngroups = (n + g - 1) // g
    if n == ngroups * g and v.dtype == np.uint64 and v.flags.c_contiguous:
        m = v.reshape(ngroups, g)  # already group-aligned: no pad copy
    else:
        vp = np.zeros(ngroups * g, dtype=np.uint64)
        vp[:n] = v
        m = vp.reshape(ngroups, g)
    lo = m << sh[None, :]
    words = lo[:, starts]  # first lane of each word (fancy gather = copy)
    rest = np.ones(g, dtype=bool)
    rest[starts] = False
    if rest.any():
        words[:, wi[rest]] |= lo[:, rest]
    has = spill > 0
    if has.any():
        words[:, wi[has] + 1] |= m[:, has] >> (
            np.uint64(width) - spill[has].astype(np.uint64)
        )
    return words.tobytes()[: packed_size(n, width)]


def _unpack_words(buf: bytes, width: int, n: int) -> np.ndarray:
    g, W, wi, sh, spill, _ = _lane_geometry(width)
    ngroups = (n + g - 1) // g
    raw = np.zeros(ngroups * W * 8, dtype=np.uint8)
    raw[: packed_size(n, width)] = np.frombuffer(
        buf, np.uint8, count=packed_size(n, width)
    )
    words = raw.view("<u8").reshape(ngroups, W)
    mask = np.uint64((1 << width) - 1) if width < 64 else np.uint64(0xFFFFFFFFFFFFFFFF)
    out = words[:, wi] >> sh[None, :]
    has = spill > 0
    if has.any():
        out[:, has] |= words[:, wi[has] + 1] << (
            np.uint64(width) - spill[has].astype(np.uint64)
        )
    out &= mask
    return out.reshape(-1)[:n]


def unpack_bits_le(buf: bytes, width: int, n: int) -> np.ndarray:
    """Inverse of :func:`pack_bits_le`; returns uint64 array of length n."""
    if n == 0 or width == 0:
        return np.zeros(n, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8, count=packed_size(n, width))
    if width == 8:
        return raw.astype(np.uint64)
    if width == 16:
        return raw.view("<u2")[:n].astype(np.uint64)
    if width == 32:
        return raw.view("<u4")[:n].astype(np.uint64)
    if width == 64:
        return raw.view("<u8")[:n].astype(np.uint64)
    if width in (1, 2, 4):
        # strided inverse of the pack fast path
        g = 8 // width
        mask = np.uint8((1 << width) - 1)
        out = np.empty(len(raw) * g, dtype=np.uint8)
        for j in range(g):
            out[j::g] = (raw >> np.uint8(j * width)) & mask
        return out[:n].astype(np.uint64)
    if n <= 192:
        # tiny segments (exception lists, small dictionaries, short
        # runs): a Python big-int shift loop beats the multi-pass numpy
        # kernels, whose per-call setup costs ~50us regardless of n
        big = int.from_bytes(raw.tobytes(), "little")
        mask = (1 << width) - 1
        return np.fromiter(
            ((big >> (i * width)) & mask for i in range(n)),
            dtype=np.uint64, count=n,
        )
    if width < 32:
        return _unpack_double(buf, width, n)
    return _unpack_words(buf, width, n)


def unpack_bits_u8(buf: bytes, n: int) -> np.ndarray:
    """1-bit unpack returning uint8 0/1 directly — skips the uint64
    widening of :func:`unpack_bits_le`, which costs more than the
    extraction itself on mask-sized inputs (hot in the engine's batched
    split/split3 decode)."""
    if n == 0:
        return np.zeros(0, dtype=np.uint8)
    raw = np.frombuffer(buf, dtype=np.uint8, count=packed_size(n, 1))
    out = np.empty(len(raw) * 8, dtype=np.uint8)
    one = np.uint8(1)
    for j in range(8):
        out[j::8] = (raw >> np.uint8(j)) & one
    return out[:n]


# cache-blocked _unpack_double for HUGE calls only: the level splits
# allocate 2x-width intermediates and write them with stride-2 stores —
# DRAM-bound once the working set leaves cache. Whole-store row-group
# decodes gather millions of same-width fields into one call, where the
# unblocked splits measured 2-33x slower than looping cache-resident
# 256K-field blocks (n=34M: w=9 7.6s -> 0.23s, w=13 1.23s -> 0.23s,
# w=17 0.58s -> 0.27s). The threshold stays high because at the
# corpus-batch sizes the engine usually sees (<= ~1M fields per width
# group) the old single-shot path is equal-or-faster (measured 0.93 vs
# 1.09 s on the 2048-row-group corpus with an always-block variant).
# Both constants are multiples of 8 fields so blocks start byte-aligned.
_UNPACK_BLOCK_THRESHOLD = 1 << 21
_UNPACK_BLOCK_FIELDS = 1 << 18


def _unpack_double(buf: bytes, width: int, n: int) -> np.ndarray:
    """Inverse of _pack_double: unpack at the doubled width, then split
    each fused field back into its lane pair, level by level.
    Cache-blocked for huge n (see _UNPACK_BLOCK_THRESHOLD)."""
    if n > _UNPACK_BLOCK_THRESHOLD:
        n0 = _UNPACK_BLOCK_FIELDS  # multiple of 8: pos*width/8 exact
        out = np.empty(n, dtype=np.uint64)
        mv = memoryview(buf)
        pos = 0
        while pos < n:
            k = min(n0, n - pos)
            start = pos * width // 8
            out[pos : pos + k] = _unpack_double(
                mv[start : packed_size(pos + k, width)], width, k
            )
            pos += k
        return out
    levels = 0
    w = width
    while w <= 32:
        w <<= 1
        levels += 1
    cnt = (n + (1 << levels) - 1) >> levels
    need = packed_size(cnt, w)
    if len(buf) < need:  # pack truncated zero padding; restore it
        buf = bytes(buf) + b"\0" * (need - len(buf))
    x = _unpack_words(buf, w, cnt)
    while levels:
        levels -= 1
        w >>= 1
        out = np.empty(2 * len(x), dtype=np.uint64)
        out[0::2] = x & np.uint64((1 << w) - 1)
        out[1::2] = x >> np.uint64(w)
        x = out
    return x[:n]
