"""Codec kernel tests — replicate the reference's test strategy
(SURVEY.md §5): naive-oracle roundtrip, golden bit patterns, boundary
cases, seeded randomized fuzzing, algebraic invariants.
"""

import numpy as np
import pytest

from tokseq.codecs import all_codecs, get_codec, pack_bits_le, packed_size, unpack_bits_le
from tokseq.codecs.bitpack import bit_length

CODECS = sorted(all_codecs())


def pack_naive(values, width):
    """Scalar oracle, mirroring the reference's pack_naive
    (/root/reference/src/test.rs:10-28): bit i*w+j of the stream is
    bit j of value i; bytes are LSB-first."""
    nbits = len(values) * width
    out = bytearray((nbits + 7) // 8)
    for i, v in enumerate(values):
        for j in range(width):
            if (int(v) >> j) & 1:
                bit = i * width + j
                out[bit // 8] |= 1 << (bit % 8)
    return bytes(out)


# --- golden bit patterns (FIXTURES.md F3, mirroring src/test.rs:58-147) ---
GOLDENS = [
    ([0, 1, 3, 2], 2, bytes([0b10110100])),
    ([0, 1, 3, 2, 0, 1, 3, 2], 2, bytes([0xB4, 0xB4])),
    ([0, 1, 3], 2, bytes([0b00110100])),
    ([15, 1], 4, bytes([0x1F])),
    ([1, 0, 1, 1, 0, 0, 0, 1], 1, bytes([0b10001101])),
]


@pytest.mark.parametrize("vals,w,expected", GOLDENS)
def test_golden_bitpack(vals, w, expected):
    assert pack_bits_le(np.array(vals), w) == expected
    assert pack_naive(vals, w) == expected
    back = unpack_bits_le(expected, w, len(vals))
    assert back.tolist() == vals


@pytest.mark.parametrize("w", list(range(1, 33)) + [37, 48, 63, 64])
def test_bitpack_vs_naive_all_widths(w):
    rng = np.random.default_rng(42 + w)
    for n in [0, 1, 2, 3, 7, 8, 9, 63, 64, 65, 100]:
        hi = (1 << w) - 1
        vals = rng.integers(0, hi + 1 if hi < 2**63 else 2**63, n, dtype=np.uint64)
        packed = pack_bits_le(vals, w)
        assert len(packed) == packed_size(n, w)
        assert packed == pack_naive(vals, w)
        assert np.array_equal(unpack_bits_le(packed, w, n), vals)


def test_bit_length_exact():
    v = np.array([0, 1, 2, 3, 4, 7, 8, (1 << 31) - 1, 1 << 31, (1 << 62)])
    assert bit_length(v).tolist() == [0, 1, 2, 2, 3, 3, 4, 31, 32, 63]


# --- boundary chunks every codec must roundtrip (FIXTURES.md F2) ---
def boundary_chunks():
    rng = np.random.default_rng(42)
    chunks = [
        np.zeros(0, np.int64),                      # empty
        np.array([0], np.int64),                    # single zero
        np.array([5], np.int64),                    # single value
        np.zeros(17, np.int64),                     # all zeros
        np.full(33, 7, np.int64),                   # constant (one run)
        np.arange(5, dtype=np.int64),               # non-multiple-of-4 length
        np.arange(4096, dtype=np.int64) % 1000,     # chunk-width sized
    ]
    for w in (2, 4, 8, 16, 31):                     # max-value saturation
        chunks.append(np.full(9, (1 << w) - 1, np.int64))
    for n in range(1, 129):                         # every length 1..128
        chunks.append(rng.integers(0, 4, n).astype(np.int64))
    # narrow range with 1% exceptions
    v = 1_000_000 + rng.integers(0, 64, 2000)
    v[rng.choice(2000, 20, replace=False)] = rng.integers(0, 1 << 30, 20)
    chunks.append(v.astype(np.int64))
    return chunks


@pytest.mark.parametrize("name", CODECS)
def test_roundtrip_boundaries(name):
    codec = get_codec(name)
    for v in boundary_chunks():
        enc = codec.encode(v)
        out = codec.decode(enc.payload, len(v), enc.bit_width, enc.min_val)
        assert np.array_equal(out, v), f"{name} failed on n={len(v)}"


@pytest.mark.parametrize("name", CODECS)
def test_roundtrip_fuzz(name):
    """Graduated random sizes, mirroring src/test.rs:433-438."""
    codec = get_codec(name)
    rng = np.random.default_rng(4242)
    sizes = (
        [int(rng.integers(0, 10)) for _ in range(50)]
        + [int(rng.integers(10, 100)) for _ in range(50)]
        + [int(rng.integers(100, 1000)) for _ in range(10)]
        + [int(rng.integers(1000, 10000)) for _ in range(5)]
    )
    for n in sizes:
        regime = int(rng.integers(0, 5))
        if regime == 0:
            v = rng.integers(0, 4, n)
        elif regime == 1:
            v = rng.integers(0, 1 << 31, n)
        elif regime == 2:
            v = 10**6 + rng.integers(0, 100, n)
        elif regime == 3:
            v = np.repeat(rng.integers(0, 50, n // 8 + 1), 8)[:n]
        else:
            v = np.minimum(rng.zipf(1.3, n) - 1, 50256)
        v = v.astype(np.int64)
        enc = codec.encode(v)
        out = codec.decode(enc.payload, n, enc.bit_width, enc.min_val)
        assert np.array_equal(out, v), f"{name} regime={regime} n={n}"


def test_bitpack_payload_is_exact_floor():
    """bitpack payload == reference floor ceil(n*w/8), no padding
    (reference strips its 48-byte pad via into_raw,
    /root/reference/src/packed_seq.rs:1118-1121)."""
    rng = np.random.default_rng(7)
    codec = get_codec("bitpack")
    for n in (1, 5, 100, 4097):
        v = rng.integers(0, 1 << 13, n).astype(np.int64)
        enc = codec.encode(v)
        w = max(1, int(v.max()).bit_length())
        assert enc.bit_width == w
        assert len(enc.payload) == packed_size(n, w)


def test_codec_independence():
    """All codecs decode identical arrays from the same input —
    the analog of order-consistency between reference encodings
    (/root/reference/src/test.rs:217-253)."""
    rng = np.random.default_rng(11)
    v = np.minimum(rng.zipf(1.3, 3000) - 1, 50256).astype(np.int64)
    outs = {}
    for name in CODECS:
        codec = get_codec(name)
        enc = codec.encode(v)
        outs[name] = codec.decode(enc.payload, len(v), enc.bit_width, enc.min_val)
    for name, out in outs.items():
        assert np.array_equal(out, v), name


# --- Elias-Fano (reference PackedEfNSeqVec parity, packed_ef_n_seq.rs) ------

def test_ef_frozen_format():
    """Hand-computed golden layout: positions [2,3,5,7,11,13,24] in
    universe 30 -> l = floor(log2(30/7)) = 2; lower 2-bit stream
    [2,3,1,3,3,1,0] = de 07; upper unary bitmap has ones at
    (p>>2)+i = [0,1,3,4,6,8,12] over 7+(30>>2)+1 = 15 bits = 5b 11."""
    from tokseq.codecs.ef import ef_decode, ef_encode

    pos = np.array([2, 3, 5, 7, 11, 13, 24], np.int64)
    upper, lower, l = ef_encode(pos, 30)
    assert l == 2
    assert upper == bytes.fromhex("5b11")
    assert lower == bytes.fromhex("de07")
    assert np.array_equal(ef_decode(upper, lower, 7, 30, l), pos)


def test_ef_positions_fuzz():
    from tokseq.codecs.ef import ef_decode, ef_encode

    rng = np.random.default_rng(11)
    for _ in range(50):
        u = int(rng.integers(1, 100_000))
        n = int(rng.integers(0, min(u, 500) + 1))
        pos = np.sort(rng.choice(u, n, replace=False)).astype(np.int64)
        upper, lower, l = ef_encode(pos, u)
        assert np.array_equal(ef_decode(upper, lower, n, u, l), pos)
        if n:
            # size within the EF bound: n*(2 + l) + universe>>l + 1 bits
            assert len(upper) * 8 <= n + (u >> l) + 1 + 7
            assert len(lower) * 8 <= n * l + 7


def test_selector_prefers_pfor_ef_on_sparse_exceptions():
    """The exc1pct regime (dense narrow base + ~1% wide exceptions)
    must now select the true-EF variant: its position cost
    n_exc*(l+1) + (n>>l) + 1 undercuts pfor's delta+bitpack estimate."""
    from tokseq.selector import CODEC_NAMES, select
    from tokseq.stats import compute_chunk_stats

    rng = np.random.default_rng(5)
    v = 1_000_000 + rng.integers(0, 64, 4096)
    exc = rng.choice(4096, 40, replace=False)
    v[exc] = rng.integers(1 << 20, 1 << 30, 40)
    offsets = np.array([0, 4096], np.int64)
    st = compute_chunk_stats(v.astype(np.int64), offsets)
    sel = select(st, enable_fsst=False)
    assert sel.names()[0] == "pfor_ef"
    # and the actual encode at the selected width beats the pfor payload
    from tokseq.codecs import get_codec
    ef_payload = get_codec("pfor_ef").encode(v, base_width=int(sel.pfor_ef_width[0]))
    pf_payload = get_codec("pfor").encode(v)
    assert len(ef_payload.payload) <= len(pf_payload.payload)
    back = get_codec("pfor_ef").decode(
        ef_payload.payload, 4096, ef_payload.bit_width, ef_payload.min_val
    )
    assert np.array_equal(back, v)
