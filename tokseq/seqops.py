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


def complement_np(arr: np.ndarray, mask: int = DEFAULT_COMPLEMENT_MASK) -> np.ndarray:
    return arr ^ mask


def revcomp_np(arr: np.ndarray, mask: int = DEFAULT_COMPLEMENT_MASK) -> np.ndarray:
    return (arr ^ mask)[::-1]
