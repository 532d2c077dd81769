"""Round-4 grouped-encode paths: dict group byte-identity fuzz,
FSST shared-table + per-chunk-learn fallback routing, and the
write-workload engine roundtrip."""

import numpy as np
import pytest

from tokseq.codecs.simple import DICT
from tokseq.engine.decode import decode_batch_kernel
from tokseq.engine.encode import encode_batch_kernel


def _batch(chunks):
    vals = np.concatenate(chunks) if chunks else np.zeros(0, np.int32)
    offs = np.concatenate(([0], np.cumsum([len(c) for c in chunks]))).astype(
        np.int64
    )
    return np.ascontiguousarray(vals, dtype=np.int32), offs


def test_dict_group_payloads_byte_identical():
    """The grouped dict encode (bincount rank LUT for small ranges,
    np.unique otherwise, batched packs) must emit payloads byte-
    identical to the per-chunk DictCodec.encode — same format, same
    decoder."""
    rng = np.random.default_rng(123)
    chunks = []
    for _ in range(200):
        n = int(rng.integers(1, 5000))
        card = int(rng.integers(1, min(n, 3000) + 1))
        span = int(rng.integers(card, card * int(rng.integers(1, 1000)) + 1))
        pool = rng.choice(span, size=card, replace=False) + int(
            rng.integers(0, 2**30)
        )
        chunks.append(pool[rng.integers(0, card, n)].astype(np.int32))
    vals, offs = _batch(chunks)
    out = encode_batch_kernel(vals, offs, enable_fsst=False)
    n_dict = 0
    for i, c in enumerate(chunks):
        if out["codec"][i] != "dict":
            continue
        n_dict += 1
        ref = DICT.encode(c)
        assert out["payload"][i] == ref.payload
        assert out["bit_width"][i] == ref.bit_width
        assert out["min_val"][i] == ref.min_val
    assert n_dict > 20  # the fuzz must actually exercise the group path
    flat, _ = decode_batch_kernel(
        out["payload"], out["codec"], out["bit_width"],
        out["min_val"], out["n_values"],
    )
    assert np.array_equal(flat, vals)


def test_rle_group_payloads_byte_identical():
    """The grouped rle encode (global change pass, reduceat widths,
    padded-group packs sliced to byte padding) must emit payloads
    byte-identical to per-chunk RleCodec.encode."""
    from tokseq.codecs.simple import RLE

    rng = np.random.default_rng(31)
    chunks = []
    for t in range(200):
        n = int(rng.integers(1, 5000))
        if t % 3 == 0 and n % 8 == 0:
            n += 1  # force tail shapes too
        n_r = max(1, n // int(rng.integers(2, 40)))
        vals = rng.integers(0, 1 << int(rng.integers(1, 30)), n_r)
        lens = rng.integers(1, 2 * max(1, n // n_r) + 1, n_r)
        v = np.repeat(vals, lens)[:n]
        if len(v) < n:
            v = np.concatenate([v, np.full(n - len(v), vals[-1])])
        chunks.append(v.astype(np.int32))
    vals_, offs = _batch(chunks)
    out = encode_batch_kernel(vals_, offs, enable_fsst=False)
    n_rle = 0
    for i, c in enumerate(chunks):
        if out["codec"][i] != "rle":
            continue
        n_rle += 1
        ref = RLE.encode(c)
        assert out["payload"][i] == ref.payload
        assert out["bit_width"][i] == ref.bit_width
        assert out["min_val"][i] == ref.min_val
    assert n_rle > 50  # the fuzz must actually exercise the group path
    flat, _ = decode_batch_kernel(
        out["payload"], out["codec"], out["bit_width"],
        out["min_val"], out["n_values"],
    )
    assert np.array_equal(flat, vals_)


def _phrase_chunks(rng, n_chunks, bank_size=100):
    """Phrases-like chunks: global phrase bank, zipf popularity —
    gram-rich data where per-chunk FSST tables beat shared ones."""
    bank = [
        rng.integers(0, 1 << 16, int(rng.integers(8, 33))) for _ in range(bank_size)
    ]
    chunks = []
    for _ in range(n_chunks):
        ids = np.minimum(
            np.exp(rng.random(80) * np.log(bank_size)).astype(np.int64) - 1,
            bank_size - 1,
        )
        chunks.append(np.concatenate([bank[i] for i in ids])[:2048].astype(np.int32))
    return chunks


def test_fsst_fallback_recovers_chunk_local_wins():
    """Shared-table losers that pass the screen get a per-chunk learn;
    on gram-rich chunks this must produce MORE fsst picks (and fewer
    bytes) than shared-replace alone, and still roundtrip exactly."""
    rng = np.random.default_rng(7)
    chunks = _phrase_chunks(rng, 40)
    vals, offs = _batch(chunks)
    out = encode_batch_kernel(vals, offs, enable_fsst=True)
    n_fsst = sum(1 for c in out["codec"] if c == "fsst")
    assert n_fsst >= 10
    assert (np.asarray(out["out_bytes"]) <= np.asarray(out["floor_bytes"])).all()
    flat, _ = decode_batch_kernel(
        out["payload"], out["codec"], out["bit_width"],
        out["min_val"], out["n_values"],
    )
    assert np.array_equal(flat, vals)


def test_workload_write_roundtrips_and_respects_floor():
    rng = np.random.default_rng(11)
    chunks = [
        np.minimum(
            np.exp(rng.random(4096) * np.log(50257)).astype(np.int64) - 1, 50256
        ).astype(np.int32)
        for _ in range(30)
    ]
    vals, offs = _batch(chunks)
    out = encode_batch_kernel(vals, offs, workload="write")
    assert (np.asarray(out["out_bytes"]) <= np.asarray(out["floor_bytes"])).all()
    flat, _ = decode_batch_kernel(
        out["payload"], out["codec"], out["bit_width"],
        out["min_val"], out["n_values"],
    )
    assert np.array_equal(flat, vals)


def test_workload_write_skips_per_chunk_learns():
    """write mode keeps only the amortized shared-table FSST replaces:
    on gram-rich chunks (where per-chunk learns are what wins) it must
    pick fsst no more often than read mode, encode to >= read-mode
    bytes, and still roundtrip exactly."""
    rng = np.random.default_rng(7)
    chunks = _phrase_chunks(rng, 40)
    vals, offs = _batch(chunks)
    out_r = encode_batch_kernel(vals, offs, enable_fsst=True, workload="read")
    out_w = encode_batch_kernel(vals, offs, enable_fsst=True, workload="write")
    n_r = sum(1 for c in out_r["codec"] if c == "fsst")
    n_w = sum(1 for c in out_w["codec"] if c == "fsst")
    assert n_w <= n_r
    assert sum(map(len, out_w["payload"])) >= sum(map(len, out_r["payload"]))
    assert (
        np.asarray(out_w["out_bytes"]) <= np.asarray(out_w["floor_bytes"])
    ).all()
    flat, _ = decode_batch_kernel(
        out_w["payload"], out_w["codec"], out_w["bit_width"],
        out_w["min_val"], out_w["n_values"],
    )
    assert np.array_equal(flat, vals)


def test_fsst_read_margin_prunes_marginal_wins(monkeypatch):
    """Read-mode fsst acceptance carries a decode-cost margin
    (selector.FSST_SPEED_MULT): vs a no-margin run on the same input it
    must only ever REMOVE fsst picks (never add), bytes weakly
    increase, floor still holds, and the output still roundtrips."""
    import tokseq.engine.encode as E

    rng = np.random.default_rng(21)
    chunks = _phrase_chunks(rng, 30) + [
        rng.integers(0, 1 << 16, 4096).astype(np.int32) for _ in range(10)
    ]
    vals, offs = _batch(chunks)
    out_m = encode_batch_kernel(vals, offs, enable_fsst=True, workload="read")
    monkeypatch.setattr(
        E, "_READ_FSST_BUDGET", {k: 1.0 for k in E._READ_FSST_BUDGET}
    )
    out_0 = encode_batch_kernel(vals, offs, enable_fsst=True, workload="read")
    fsst_m = {i for i, c in enumerate(out_m["codec"]) if c == "fsst"}
    fsst_0 = {i for i, c in enumerate(out_0["codec"]) if c == "fsst"}
    assert fsst_m <= fsst_0
    assert sum(map(len, out_m["payload"])) >= sum(map(len, out_0["payload"]))
    assert (
        np.asarray(out_m["out_bytes"]) <= np.asarray(out_m["floor_bytes"])
    ).all()
    flat, _ = decode_batch_kernel(
        out_m["payload"], out_m["codec"], out_m["bit_width"],
        out_m["min_val"], out_m["n_values"],
    )
    assert np.array_equal(flat, vals)


def test_workload_invalid_raises():
    from tokseq.engine.pipeline import EncodeJob

    with pytest.raises(ValueError, match="workload"):
        EncodeJob(None, "/tmp/x", num_partitions=4, workload="nope")
