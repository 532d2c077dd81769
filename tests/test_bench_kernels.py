"""Kernel micro-benchmarks, mirroring the reference's #[ignore]d bench
tests (/root/reference/src/test.rs:892-1116; run via `just bench`).
Skipped by default; run with:

    python -m pytest tests/test_bench_kernels.py -q --run-bench -s

Prints per-kernel single-core throughput (the reference prints Gbp/s
for its SIMD pack/unpack; our analog is Mtok/s per core for each codec
path plus the raw bitpack kernels)."""

import time

import numpy as np
import pytest


def pytest_configure(config):  # pragma: no cover
    pass


bench = pytest.mark.skipif(
    "not config.getoption('--run-bench', default=False)",
    reason="kernel bench; enable with --run-bench",
)


def _rate(fn, n_tokens, reps=3):
    best = 1e18
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return n_tokens / best / 1e6


@bench
def test_bench_pack_unpack_widths():
    from tokseq.codecs.bitpack import pack_bits_le, unpack_bits_le

    rng = np.random.default_rng(42)
    n = 4_000_000
    print()
    for w in (1, 2, 4, 8, 11, 16, 20, 31):
        v = rng.integers(0, 1 << w, n).astype(np.uint32)
        packed = pack_bits_le(v, w)
        r_pack = _rate(lambda: pack_bits_le(v, w), n)
        r_unpack = _rate(lambda: unpack_bits_le(packed, w, n), n)
        print(f"  w={w:2d}: pack {r_pack:7.1f} Mtok/s/core  unpack {r_unpack:7.1f} Mtok/s/core")


@bench
def test_bench_codec_paths():
    from tokseq.engine.encode import encode_batch_kernel
    from tokseq.engine.decode import decode_batch_kernel

    rng = np.random.default_rng(42)
    n = 4_000_000
    regimes = {
        "2bit-uniform (DNA analog)": rng.integers(0, 4, n),
        "16bit-uniform": rng.integers(0, 1 << 16, n),
        "narrow-range (FoR)": 10**6 + rng.integers(0, 500, n),
        "runs (RLE)": np.repeat(rng.integers(0, 256, n // 32 + 1), 32)[:n],
        "lowcard (dict)": rng.integers(0, 1000, 30)[rng.integers(0, 30, n)],
        "zipf-text (FSST)": np.minimum(
            np.exp(rng.random(n) * np.log(50257)).astype(np.int64) - 1, 50256
        ),
    }
    pf = 10**6 + rng.integers(0, 64, n)
    exc = rng.random(n) < 0.01
    pf[exc] = 10**6 + rng.integers(0, 1 << 29, int(exc.sum()))
    regimes["narrow + 1% wide exceptions (PFoR)"] = pf
    offs = np.arange(0, n + 1, 4096, dtype=np.int64)
    if offs[-1] != n:
        offs = np.append(offs, n)
    print()
    for name, v in regimes.items():
        v32 = np.ascontiguousarray(v, dtype=np.int32)
        out = encode_batch_kernel(v32, offs)
        r_enc = _rate(lambda: encode_batch_kernel(v32, offs), n, reps=2)
        r_dec = _rate(
            lambda: decode_batch_kernel(
                out["payload"], out["codec"], out["bit_width"],
                out["min_val"], out["n_values"],
            ),
            n, reps=2,
        )
        bpt = sum(len(p) for p in out["payload"]) / n
        print(
            f"  {name:28s}: encode {r_enc:6.1f}  decode {r_dec:6.1f} Mtok/s/core, {bpt:.3f} B/tok"
        )
