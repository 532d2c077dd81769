"""Sequence-semantic operators (SURVEY §2.2 S1-S3): complement,
reverse, and reverse-complement over token-array columns, with numpy
kernels for the engine side.

Reference parity: ``to_revcomp`` (/root/reference/src/packed_seq.rs:537-579)
reverses the packed sequence and complements each 2-bit code; in the
reference's alphabet the complement is ``code ^ 2``
(src/packed_seq.rs:295-297), and revcomp is an involution
(src/test.rs:740-763). The ops take the XOR mask as a parameter so
wider token alphabets can supply their own complement mask.

All column ops are pure Catalyst expressions (``transform`` /
``reverse``) — no shuffle, no Python in the hot path; they run
element-wise inside whole-stage codegen at any scale.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_COMPLEMENT_MASK = 2


def complement(col: Column | str, mask: int = DEFAULT_COMPLEMENT_MASK) -> Column:
    """Element-wise complement of a token array: t -> t XOR mask."""
    return F.transform(col, lambda c: c.bitwiseXOR(F.lit(mask)))


def reverse_seq(col: Column | str) -> Column:
    """Whole-sequence reverse of a token array (S2)."""
    return F.reverse(col)


def revcomp(col: Column | str, mask: int = DEFAULT_COMPLEMENT_MASK) -> Column:
    """Reverse-complement of a token array (S3): reverse(t XOR mask).
    Involution: revcomp(revcomp(x)) == x."""
    return F.reverse(complement(col, mask))


def lcp(a: Column | str, b: Column | str) -> Column:
    """Longest-common-prefix length of two token arrays (reference
    ``cmp_lcp``, /root/reference/src/packed_seq.rs:1054-1109), as a
    pure Catalyst expression: zip_with pads the shorter side with
    nulls, so the first null-safe inequality marks the first mismatch
    (including the length mismatch); no mismatch means equal arrays."""
    eq = F.zip_with(a, b, lambda x, y: x.eqNullSafe(y))
    pos = F.array_position(eq, F.lit(False))
    return (
        F.when(pos == 0, F.size(a)).otherwise(pos - 1).cast("int")
    )


def cmp_lcp(a: Column | str, b: Column | str) -> Column:
    """struct(cmp int, lcp int): three-way LOGICAL token-order
    comparison plus LCP length, the reference's ``cmp_lcp`` pair.
    cmp is -1/0/1 for a < / == / > b; a proper prefix sorts first."""
    eq = F.zip_with(a, b, lambda x, y: x.eqNullSafe(y))
    pos = F.array_position(eq, F.lit(False))
    l = F.when(pos == 0, F.size(a)).otherwise(pos - 1).cast("int")
    # F.get is 0-based and yields null out of bounds (the padded side)
    ae = F.get(a, l)
    be = F.get(b, l)
    cmp = (
        F.when(pos == 0, 0)
        .when(ae.isNull(), -1)
        .when(be.isNull(), 1)
        .when(ae < be, -1)
        .otherwise(1)
    )
    return F.struct(cmp.cast("int").alias("cmp"), l.alias("lcp"))


def lcp_np(a: np.ndarray, b: np.ndarray) -> int:
    n = min(len(a), len(b))
    neq = np.flatnonzero(a[:n] != b[:n])
    return int(neq[0]) if len(neq) else n


def cmp_lcp_np(a: np.ndarray, b: np.ndarray) -> tuple[int, int]:
    l = lcp_np(a, b)
    if l == len(a) and l == len(b):
        return 0, l
    if l == len(a):
        return -1, l
    if l == len(b):
        return 1, l
    return (-1 if a[l] < b[l] else 1), l


def complement_np(arr: np.ndarray, mask: int = DEFAULT_COMPLEMENT_MASK) -> np.ndarray:
    return arr ^ mask


def revcomp_np(arr: np.ndarray, mask: int = DEFAULT_COMPLEMENT_MASK) -> np.ndarray:
    return (arr ^ mask)[::-1]
