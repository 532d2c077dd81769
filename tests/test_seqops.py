"""S2/S3 sequence ops: reverse / complement / revcomp, mirroring the
reference's revcomp involution tests (src/test.rs:740-763)."""

import numpy as np
from pyspark.sql import functions as F

from tokseq.seqops import complement, complement_np, revcomp, revcomp_np, reverse_seq


def test_revcomp_np_involution_and_mirror():
    rng = np.random.default_rng(3)
    for n in [0, 1, 2, 7, 64, 1001]:
        x = rng.integers(0, 4, n).astype(np.int64)
        rc = revcomp_np(x)
        assert np.array_equal(revcomp_np(rc), x)  # involution
        assert np.array_equal(rc, (x ^ 2)[::-1])  # mirror of complement
        assert np.array_equal(complement_np(complement_np(x)), x)


def test_revcomp_column_matches_numpy(spark):
    rng = np.random.default_rng(4)
    rows = [
        ([int(v) for v in rng.integers(0, 4, int(n))],)
        for n in [0, 1, 5, 33, 257]
    ]
    df = spark.createDataFrame(rows, "tokens array<int>")
    out = df.select(
        "tokens",
        revcomp("tokens").alias("rc"),
        revcomp(revcomp("tokens")).alias("rc2"),
        reverse_seq("tokens").alias("rev"),
        complement("tokens").alias("comp"),
    ).collect()
    for r in out:
        x = np.array(r["tokens"], dtype=np.int64)
        assert np.array_equal(np.array(r["rc"], np.int64), revcomp_np(x))
        assert r["rc2"] == r["tokens"]  # involution, Spark-side
        assert np.array_equal(np.array(r["rev"], np.int64), x[::-1])
        assert np.array_equal(np.array(r["comp"], np.int64), x ^ 2)


def test_revcomp_wider_alphabet_mask(spark):
    """A 4-bit alphabet complements with mask 15; involution must hold
    for any mask."""
    x = np.array([0, 3, 9, 15, 7], dtype=np.int64)
    assert np.array_equal(revcomp_np(revcomp_np(x, 15), 15), x)
    df = spark.createDataFrame([([0, 3, 9, 15, 7],)], "tokens array<int>")
    r = df.select(revcomp(revcomp("tokens", 15), 15).alias("x")).collect()[0]
    assert r["x"] == [0, 3, 9, 15, 7]


def test_cmp_lcp_matches_numpy(spark):
    """P6 cmp_lcp (reference packed_seq.rs:1054-1109): equal arrays,
    proper prefixes (prefix sorts first), shared prefixes, empties."""
    import pyspark.sql.functions as F

    from tokseq.seqops import cmp_lcp, cmp_lcp_np, lcp, lcp_np

    rng = np.random.default_rng(9)
    cases = [
        ([], []), ([], [1]), ([1, 2, 3], [1, 2, 3]),
        ([1, 2], [1, 2, 3]), ([1, 2, 9], [1, 2, 3]), ([5], [4, 9]),
    ]
    for _ in range(30):
        base = rng.integers(0, 4, int(rng.integers(0, 20))).tolist()
        a = base + rng.integers(0, 4, int(rng.integers(0, 10))).tolist()
        b = base + rng.integers(0, 4, int(rng.integers(0, 10))).tolist()
        cases.append(([int(x) for x in a], [int(x) for x in b]))
    df = spark.createDataFrame(cases, "a array<int>, b array<int>")
    got = df.select(
        "a", "b", lcp("a", "b").alias("l"), cmp_lcp("a", "b").alias("cl")
    ).collect()
    for r in got:
        a, b = np.array(r["a"], np.int64), np.array(r["b"], np.int64)
        want_cmp, want_lcp = cmp_lcp_np(a, b)
        assert r["l"] == lcp_np(a, b), (r["a"], r["b"])
        assert (r["cl"]["cmp"], r["cl"]["lcp"]) == (want_cmp, want_lcp), (r["a"], r["b"])
        # antisymmetry against python's list ordering
        assert want_cmp == (0 if list(a) == list(b) else (-1 if list(a) < list(b) else 1))
