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


def test_stitch_carry_raises_before_concat_strict(monkeypatch):
    """In on_giant='error' mode, a doc whose chunks ACCUMULATE past the
    cap across batches must raise while carrying — before
    np.concatenate would materialize the unrepresentable row."""
    monkeypatch.setattr(dec, "_EMIT_CAP", 100)
    batches = [_encoded_batch("giant", i, np.arange(48) % 7) for i in range(4)]
    with pytest.raises(ValueError, match="overflows"):
        list(dec._decode_stitch_map(iter(batches), strict=True))


def test_stitch_giant_doc_splits_gracefully(monkeypatch):
    """Default (split) mode, VERDICT r4 task 3: one over-cap doc
    degrades to several consecutive same-doc_id segment rows — in
    chunk order, each <= cap — while neighboring docs stitch normally
    and the job stays alive."""
    monkeypatch.setattr(dec, "_EMIT_CAP", 100)
    batches = [_encoded_batch("aa-before", 0, np.arange(30))]
    batches += [_encoded_batch("giant", i, np.arange(48) % 7) for i in range(4)]
    batches += [_encoded_batch("zz-after", 0, np.arange(20) + 5)]
    ids, toks = _collect(dec._decode_stitch_map(iter(batches)))
    assert all(len(t) <= 100 for t in toks)
    # neighbors: exactly one row each, exact content
    assert ids.count("aa-before") == 1 and ids.count("zz-after") == 1
    assert np.array_equal(toks[ids.index("aa-before")], np.arange(30))
    assert np.array_equal(toks[ids.index("zz-after")], np.arange(20) + 5)
    # giant: >1 consecutive segments that concatenate to the full doc
    seg_pos = [k for k, i in enumerate(ids) if i == "giant"]
    assert len(seg_pos) > 1
    assert seg_pos == list(range(seg_pos[0], seg_pos[0] + len(seg_pos)))
    whole = np.concatenate([np.asarray(toks[k]) for k in seg_pos])
    assert np.array_equal(whole, np.concatenate([np.arange(48) % 7] * 4))


def test_stitch_single_run_over_cap_splits(monkeypatch):
    """A single decoded run larger than the cap splits inside
    _carry_add (the while loop), not just at chunk boundaries."""
    monkeypatch.setattr(dec, "_EMIT_CAP", 100)
    ids, toks = _collect(
        dec._decode_stitch_map(iter([_encoded_batch("mono", 0, np.arange(250) % 11)]))
    )
    assert ids == ["mono"] * 3 and [len(t) for t in toks] == [100, 100, 50]
    assert np.array_equal(np.concatenate([np.asarray(t) for t in toks]),
                          np.arange(250) % 11)


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
