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
