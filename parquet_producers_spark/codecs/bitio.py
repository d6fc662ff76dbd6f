"""Vectorized bit-level primitives shared by the integer codecs.

Everything here is pure numpy over contiguous buffers — no per-element
Python. These are the building blocks for the ``bitpack``, ``for``
(frame-of-reference) and ``delta`` codecs (SURVEY.md §2.3) and for the
FSST code-stream serialization.
"""

from __future__ import annotations

import numpy as np


def bit_width(max_value: int) -> int:
    """Minimum bits needed to represent values in [0, max_value]."""
    if max_value < 0:
        raise ValueError("bit_width requires a non-negative max")
    return max(1, int(max_value).bit_length())


# widths up to this use word-padded packing (k = 64//w values per u64
# word); the ≤6% padding loss buys ~4× less memory traffic than the
# bit-matrix path, which matters when 32 executor cores pack at once
WORDPAD_MAX_WIDTH = 21


def pack_uints(values: np.ndarray, width: int) -> bytes:
    """Pack non-negative integers into a ``width``-bit stream.

    Narrow widths use word-padded packing (shift + or-reduce across a
    (n/k, k) view — ~16 bytes of traffic per value); wide widths fall
    back to the dense bit-matrix path. Pure numpy either way.
    """
    n = len(values)
    if n == 0:
        return b""
    if width > 64:
        raise ValueError(f"width {width} > 64")
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if width <= WORDPAD_MAX_WIDTH:
        k = 64 // width
        pad = (-n) % k
        if pad:
            v = np.concatenate((v, np.zeros(pad, dtype=np.uint64)))
        m = v.reshape(-1, k)
        shifts = (np.arange(k, dtype=np.uint64) * np.uint64(width))
        words = np.bitwise_or.reduce(m << shifts, axis=1)
        return words.tobytes()
    bits = np.unpackbits(v.byteswap().view(np.uint8).reshape(n, 8), axis=1)
    return np.packbits(bits[:, 64 - width:].ravel()).tobytes()


def unpack_uints(data: bytes, width: int, n: int) -> np.ndarray:
    """Inverse of :func:`pack_uints`; returns uint64 array of length n."""
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if width <= WORDPAD_MAX_WIDTH:
        k = 64 // width
        words = np.frombuffer(data, dtype=np.uint64)
        shifts = (np.arange(k, dtype=np.uint64) * np.uint64(width))
        mask = np.uint64((1 << width) - 1)
        vals = (words[:, None] >> shifts) & mask
        return vals.ravel()[:n]
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8), count=n * width)
    full = np.zeros((n, 64), dtype=np.uint8)
    full[:, 64 - width:] = bits.reshape(n, width)
    return np.packbits(full, axis=1).view(">u8").ravel().astype(np.uint64)


def zigzag_encode(values: np.ndarray) -> np.ndarray:
    """Map signed ints to unsigned so small magnitudes stay small."""
    v = values.astype(np.int64)
    return ((v << 1) ^ (v >> 63)).view(np.uint64)


def zigzag_decode(values: np.ndarray) -> np.ndarray:
    v = values.astype(np.uint64)
    return ((v >> np.uint64(1)).view(np.int64)) ^ -(v & np.uint64(1)).view(np.int64)


def pack_bools(mask: np.ndarray) -> bytes:
    return np.packbits(mask.astype(np.uint8)).tobytes()


def unpack_bools(data: bytes, n: int) -> np.ndarray:
    return np.unpackbits(np.frombuffer(data, dtype=np.uint8), count=n).astype(bool)
