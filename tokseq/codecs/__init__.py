"""Pure-numpy codec kernels (no Spark import).

Importing this package registers all codecs:
bitpack, for, rle, dict, pfor, split, split3, pfor_ef, fsst.
"""

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
