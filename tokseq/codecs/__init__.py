"""Pure-numpy codec kernels (no Spark import).

Importing this package registers all codecs:
bitpack, for, rle, dict, pfor, split, split3, pfor_ef, fsst.
"""

# On-disk payload format version. v2 (round 3): dict/split/split3 pad
# every value/dictionary stream to an 8-FIELD multiple so same-width
# streams concatenate across chunks for batched decode. v1 stores are
# NOT readable by the v2 decoders (stream offsets shift) — EncodeJob
# stamps this version into a store-level marker and refuses to
# resume-append onto or decode a store with a different/missing stamp
# (engine/pipeline.py), so the break is loud instead of silently wrong.
FORMAT_VERSION = 2

from .base import Codec, Encoded, all_codecs, get_codec  # noqa: F401
from .bitpack import (  # noqa: F401
    bit_length,
    pack_bits_le,
    packed_size,
    unpack_bits_le,
    unpack_bits_u8,
)
from .simple import BITPACK, DICT, FOR, PFOR, RLE, SPLIT, SPLIT3  # noqa: F401
from .ef import PFOR_EF  # noqa: F401
from .fsst import FSST  # noqa: F401
