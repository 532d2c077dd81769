"""Distributed BPE learning (tokseq/bpe.py) vs a pure-Python reference
implementation: the vectorized greedy merge kernel and the full learn
loop must match token-for-token and merge-for-merge — overlap handling
(a==b runs) and doc-boundary isolation are the classic silent-wrong
spots."""

import numpy as np
import pytest

from tokseq.bpe import apply_merges_kernel, learn_bpe, merge_pairs_kernel


def ref_merge(tokens, a, b, new_id):
    out, i = [], 0
    while i < len(tokens):
        if i + 1 < len(tokens) and tokens[i] == a and tokens[i + 1] == b:
            out.append(new_id)
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


def ref_learn(docs, n_merges, base):
    from collections import Counter

    docs = [list(d) for d in docs]
    merges = []
    for r in range(n_merges):
        c = Counter()
        for d in docs:
            for i in range(len(d) - 1):
                c[(d[i], d[i + 1])] += 1
        if not c:
            break
        (t1, t2), n = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        new_id = base + r
        merges.append({"round": r, "t1": t1, "t2": t2, "new_id": new_id, "n": n})
        docs = [ref_merge(d, t1, t2, new_id) for d in docs]
    return merges, docs


def _flat(docs):
    vals = np.concatenate([np.asarray(d, np.int32) for d in docs]) if any(
        len(d) for d in docs
    ) else np.zeros(0, np.int32)
    offs = np.concatenate(([0], np.cumsum([len(d) for d in docs]))).astype(np.int64)
    return vals, offs


def _unflat(vals, offs):
    return [vals[offs[i] : offs[i + 1]].tolist() for i in range(len(offs) - 1)]


def test_merge_kernel_overlap_semantics():
    # greedy left-to-right on runs: aaa -> [X, a], aaaa -> [X, X]
    v, o = _flat([[7, 7, 7], [7, 7, 7, 7]])
    nv, no = merge_pairs_kernel(v, o, 7, 7, 99)
    assert _unflat(nv, no) == [[99, 7], [99, 99]]


def test_merge_kernel_doc_boundary():
    # pair split across docs must NOT merge
    v, o = _flat([[1, 2, 3], [4, 1, 2]])
    nv, no = merge_pairs_kernel(v, o, 3, 4, 99)
    assert _unflat(nv, no) == [[1, 2, 3], [4, 1, 2]]
    # ...but the same pair inside a doc does
    nv, no = merge_pairs_kernel(v, o, 1, 2, 99)
    assert _unflat(nv, no) == [[99, 3], [4, 99]]


def test_merge_kernel_empty_leading_doc():
    # empty doc 0: offsets start 0,0 — must not kill the last candidate
    v, o = _flat([[], [5, 6], [5, 6]])
    nv, no = merge_pairs_kernel(v, o, 5, 6, 99)
    assert _unflat(nv, no) == [[], [99], [99]]


@pytest.mark.parametrize("seed", [3, 11, 29])
def test_merge_kernel_fuzz_vs_reference(seed):
    rng = np.random.default_rng(seed)
    docs = [
        rng.integers(0, 6, rng.integers(0, 40)).tolist() for _ in range(60)
    ]
    v, o = _flat(docs)
    for _ in range(30):
        a, b = int(rng.integers(0, 6)), int(rng.integers(0, 6))
        nv, no = merge_pairs_kernel(v, o, a, b, 1000)
        assert _unflat(nv, no) == [ref_merge(d, a, b, 1000) for d in docs]


def test_apply_merges_sequential_consumes_new_ids():
    # second merge uses the first merge's output id
    v, o = _flat([[1, 2, 1, 2, 3]])
    nv, no = apply_merges_kernel(v, o, [(1, 2, 50), (50, 50, 51)])
    assert _unflat(nv, no) == [[51, 3]]


def test_learn_bpe_matches_reference(spark):
    rng = np.random.default_rng(17)
    docs = [
        rng.integers(0, 8, rng.integers(2, 60)).tolist() for _ in range(80)
    ]
    sdf = spark.createDataFrame(
        [(f"d{i}", d) for i, d in enumerate(docs)], "doc_id string, tokens array<int>"
    )
    got = learn_bpe(sdf, 6, vocab_base=100)
    want, _ = ref_learn(docs, 6, base=100)
    assert got == want


def test_learn_bpe_tolerates_empty_and_singleton_docs(spark):
    """Review r5 finding: slice(tokens, 1, size-1) raised
    INVALID_PARAMETER_VALUE on empty docs; the clamped adjacent_pairs
    must skip them instead (the kernel already supported them)."""
    sdf = spark.createDataFrame(
        [("d0", [1, 2, 1, 2]), ("d1", []), ("d2", [9]), ("d3", [1, 2])],
        "doc_id string, tokens array<int>",
    )
    got = learn_bpe(sdf, 2, vocab_base=100)
    want, _ = ref_learn([[1, 2, 1, 2], [], [9], [1, 2]], 2, base=100)
    assert got == want and got[0]["t1"] == 1 and got[0]["t2"] == 2
