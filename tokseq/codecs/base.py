"""Codec protocol + registry.

A codec turns one column chunk (a 1-D non-negative int array, the
values of one ``tokens`` slice) into ``(payload: bytes, bit_width: int,
min_val: int)`` and back. ``bit_width`` and ``min_val`` are the only
out-of-band metadata — they live as columns of the encoded DataFrame;
anything else a codec needs is a small fixed header inside the payload.

This is the Spark-era analog of the reference's ``Seq``/``SeqVec``
trait pair (/root/reference/src/traits.rs:21-267): ``encode`` plays
``push_ascii`` (bulk pack), ``decode`` plays ``iter_bp``+``collect``
(streaming unpack), and the (payload, n_values, bit_width) triple plays
``from_raw_parts`` (/root/reference/src/packed_seq.rs:375-378).

Invariant (the master roundtrip property, mirroring
/root/reference/src/test.rs:10-40): for every codec c and every valid
chunk v: ``c.decode(*c.encode(v), n=len(v)) == v`` element-wise.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict

import numpy as np


@dataclass(frozen=True)
class Encoded:
    payload: bytes
    bit_width: int  # effective width the floor is computed against
    min_val: int    # frame of reference (0 for codecs that don't shift)


class Codec:
    """Protocol: subclass-or-duck-typed; registered by name."""

    name: str = "?"

    def encode(self, values: np.ndarray) -> Encoded:  # pragma: no cover
        raise NotImplementedError

    def decode(self, payload: bytes, n: int, bit_width: int, min_val: int) -> np.ndarray:
        raise NotImplementedError  # pragma: no cover


_REGISTRY: Dict[str, Codec] = {}


def register(codec: Codec) -> Codec:
    _REGISTRY[codec.name] = codec
    return codec


def get_codec(name: str) -> Codec:
    return _REGISTRY[name]


def all_codecs() -> Dict[str, Codec]:
    return dict(_REGISTRY)


def as_int64(values) -> np.ndarray:
    """Normalize a chunk to a contiguous signed int array.

    int32 input is kept as int32 (tokens live in [0, 2^31) so
    frame-shift arithmetic cannot overflow it, and halving the working
    width matters: the encode kernel is memory-bandwidth-bound at high
    core counts). Anything else widens to int64; shift-heavy math
    inside pack_bits_le upcasts as needed (SURVEY §7.2 'max-value
    saturation')."""
    v = np.ascontiguousarray(values)
    if v.dtype == np.int32:
        return v
    return v.astype(np.int64, copy=False)
