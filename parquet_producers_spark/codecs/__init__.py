"""Lightweight per-column codecs with statistics-driven auto-selection.

Public surface:
    encode_array / decode_array   — (blob, params) round trip, any codec
    column_stats / choose_codec   — stats + auto-selection
    CODECS                        — registry (plain, dict, rle, bitpack,
                                    for, delta, fsst)
"""

from .base import CODECS, decode_array, encode_array  # noqa: F401
from . import basic as _basic  # noqa: F401  (registers plain/dict/rle/ints)
from . import fsst as _fsst    # noqa: F401  (registers fsst)
from . import linedict as _linedict  # noqa: F401  (registers linedict)
from .select import Choice, ColumnStats, choose_codec, column_stats  # noqa: F401
