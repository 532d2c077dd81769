"""Arrow list<int32> offset-overflow guards in the doc stitchers
(VERDICT r3 task 6): emitted batches split below the offset cap, and a
single doc past the cap fails LOUDLY before any giant allocation.

The cap is 2^31-1 tokens in production; tests shrink the module
constant so the boundary is exercised with a few hundred values (the
stitchers are plain generators — no Spark workers involved, so the
monkeypatch is visible to them)."""

import numpy as np
import pyarrow as pa
import pytest

import tokseq.engine.decode as dec


def _collect(batches):
    ids, toks = [], []
    for b in batches:
        ids.extend(b.column("doc_id").to_pylist())
        toks.extend(b.column("tokens").to_pylist())
    return ids, toks


def test_emit_splits_below_cap(monkeypatch):
    monkeypatch.setattr(dec, "_EMIT_CAP", 100)
    docs = [np.arange(60, dtype=np.int32) + i for i in range(3)]
    out = list(dec._emit_doc_batches(["a", "b", "c"], docs))
    assert len(out) == 3  # greedy: no two 60-token docs fit under 100
    for b in out:
        assert sum(len(t) for t in b.column("tokens").to_pylist()) <= 100
    ids, toks = _collect(out)
    assert ids == ["a", "b", "c"]
    for got, want in zip(toks, docs):
        assert np.array_equal(got, want)


def test_emit_raises_on_single_giant_doc(monkeypatch):
    monkeypatch.setattr(dec, "_EMIT_CAP", 100)
    with pytest.raises(ValueError, match="overflows"):
        list(dec._emit_doc_batches(["g"], [np.zeros(101, np.int32)]))


def _encoded_batch(doc_id, chunk_idx, tokens):
    """One encoded-table Arrow batch (the _decode_stitch_map input
    schema) built through the real encode kernel."""
    from tokseq.engine.encode import encode_batch_kernel

    offs = np.array([0, len(tokens)], dtype=np.int64)
    out = encode_batch_kernel(np.asarray(tokens, np.int32), offs)
    return pa.RecordBatch.from_arrays(
        [
            pa.array([doc_id], pa.string()),
            pa.array([chunk_idx], pa.int32()),
            pa.array(out["payload"], pa.binary()),
            pa.array(out["codec"], pa.string()),
            pa.array(out["bit_width"], pa.int32()),
            pa.array(out["min_val"], pa.int64()),
            pa.array(out["n_values"], pa.int64()),
        ],
        names=["doc_id", "chunk_idx", "payload", "codec",
               "bit_width", "min_val", "n_values"],
    )


def test_stitch_carry_raises_before_concat(monkeypatch):
    """A doc whose chunks ACCUMULATE past the cap across batches must
    raise while carrying — before np.concatenate would materialize the
    unrepresentable row."""
    monkeypatch.setattr(dec, "_EMIT_CAP", 100)
    batches = [_encoded_batch("giant", i, np.arange(48) % 7) for i in range(4)]
    with pytest.raises(ValueError, match="overflows"):
        list(dec._decode_stitch_map(iter(batches)))


def test_stitch_splits_output_batches(monkeypatch):
    """Several sub-cap docs inside one input batch emit as multiple
    valid output batches with identical content."""
    monkeypatch.setattr(dec, "_EMIT_CAP", 100)
    rng = np.random.default_rng(7)
    docs = {f"d{i}": rng.integers(0, 1000, 80).astype(np.int32) for i in range(4)}
    batches = [_encoded_batch(k, 0, v) for k, v in sorted(docs.items())]
    out = list(dec._decode_stitch_map(iter(batches)))
    assert len(out) >= 4  # 80 tokens/doc, cap 100 -> one doc per batch
    ids, toks = _collect(out)
    assert ids == sorted(docs)
    for i, t in zip(ids, toks):
        assert np.array_equal(np.asarray(t), docs[i])
