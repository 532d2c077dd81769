"""Selector quality: on a wide spread of regimes, the chunk-level
choice must (a) never exceed the bitpack floor, and (b) match the true
argmin over all codecs' ACTUAL encoded sizes in the vast majority of
chunks (estimates for pfor are upper bounds, fsst is gated — small
deviations allowed, gross misselection is a bug)."""

import numpy as np

from tokseq.codecs import all_codecs, get_codec
from tokseq.engine.encode import encode_batch_kernel


def _regimes(rng, n):
    yield rng.integers(0, 4, n)                               # 2-bit
    yield rng.integers(0, 1 << 16, n)                         # 16-bit
    yield 10**6 + rng.integers(0, 500, n)                     # narrow
    yield np.repeat(rng.integers(0, 256, max(1, n // 24)), 24)[:n]  # runs
    yield rng.integers(0, 1000, 24)[rng.integers(0, 24, n)]   # lowcard
    v = 10**6 + rng.integers(0, 32, n)
    v[rng.choice(n, max(1, n // 100), replace=False)] = rng.integers(0, 1 << 30, max(1, n // 100))
    yield v                                                   # pfor-shaped
    u = rng.random(n)
    yield np.minimum(np.exp(u * np.log(50257)).astype(np.int64) - 1, 50256)  # zipfish


def _actual_best(v):
    best = None
    for name in sorted(all_codecs()):
        codec = get_codec(name)
        enc = codec.encode(v) if name != "fsst" else codec.encode(v)
        if enc is None:
            continue
        size = len(enc.payload)
        if best is None or size < best[1]:
            best = (name, size)
    return best


def test_selection_close_to_optimal():
    rng = np.random.default_rng(42)
    chunks = []
    for rep in range(4):
        for v in _regimes(rng, 4096):
            chunks.append(np.asarray(v, dtype=np.int64))
    values = np.concatenate(chunks).astype(np.int32)
    offsets = np.concatenate(([0], np.cumsum([len(c) for c in chunks]))).astype(np.int64)
    out = encode_batch_kernel(values, offsets)

    n = len(chunks)
    waste = []
    for i, v in enumerate(chunks):
        chosen_size = out["out_bytes"][i]
        assert chosen_size <= out["floor_bytes"][i]
        best_name, best_size = _actual_best(v)
        waste.append(chosen_size / best_size)
    waste = np.array(waste)
    # selector within 2% of the true optimum on >= 90% of chunks,
    # never more than 25% worse than optimal
    assert (waste <= 1.02).mean() >= 0.90, waste
    assert waste.max() <= 1.25, waste.max()
