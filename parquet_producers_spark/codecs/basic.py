"""Plain, dictionary, RLE, bit-pack, frame-of-reference and delta codecs.

All kernels consume/produce ``pyarrow.Array`` and operate vectorized on
numpy views of the Arrow buffers — no per-row Python (north_rule).
Null handling lives in ``base.encode_array``; every kernel here may
assume a null-free input.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import bitio
from .base import concat_blobs, decode_child, encode_child, register, split_blobs

# --------------------------------------------------------------------------
# plain — Arrow IPC round trip; the universal fallback (preserves any type)
# --------------------------------------------------------------------------


def encode_plain(arr: pa.Array) -> tuple[bytes, dict]:
    batch = pa.record_batch([arr], names=["v"])
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, batch.schema) as w:
        w.write_batch(batch)
    return sink.getvalue().to_pybytes(), {}


def decode_plain(data: bytes, params: dict) -> pa.Array:
    with pa.ipc.open_stream(pa.BufferReader(data)) as r:
        table = r.read_all()
    return table.column("v").combine_chunks()


register("plain", encode_plain, decode_plain)


# --------------------------------------------------------------------------
# integer codecs: bitpack / frame-of-reference / delta (+ zigzag)
# cf. PAPERS.md "Can Delta Compete with Frame-of-Reference..." VLDB 2024
# --------------------------------------------------------------------------

_INT_TYPES = {
    "int8": np.int8, "int16": np.int16, "int32": np.int32, "int64": np.int64,
    "uint8": np.uint8, "uint16": np.uint16, "uint32": np.uint32, "uint64": np.uint64,
}


def _int_values(arr: pa.Array) -> tuple[np.ndarray, str]:
    t = str(arr.type)
    if t not in _INT_TYPES:
        raise TypeError(f"integer codec on non-integer type {t}")
    return arr.to_numpy(zero_copy_only=False), t


def _restore_int(values: np.ndarray, itype: str) -> pa.Array:
    return pa.array(values.astype(_INT_TYPES[itype]), type=pa.type_for_alias(itype))


def encode_for(arr: pa.Array) -> tuple[bytes, dict]:
    """Frame-of-reference: subtract min, bit-pack the offsets."""
    vals, itype = _int_values(arr)
    if len(vals) == 0:
        return b"", {"itype": itype, "ref": 0, "width": 1}
    ref = int(vals.min())
    offs = (vals.astype(np.int64) - ref).astype(np.uint64)
    width = bitio.bit_width(int(offs.max()))
    return bitio.pack_uints(offs, width), {"itype": itype, "ref": ref, "width": width}


def decode_for(data: bytes, params: dict) -> pa.Array:
    n = params["n"]
    offs = bitio.unpack_uints(data, params["width"], n)
    return _restore_int(offs.astype(np.int64) + params["ref"], params["itype"])


register("for", encode_for, decode_for)


def encode_bitpack(arr: pa.Array) -> tuple[bytes, dict]:
    """Bit-pack non-negative ints at their natural width (FOR with ref=0)."""
    vals, itype = _int_values(arr)
    if len(vals) == 0:
        return b"", {"itype": itype, "width": 1}
    if vals.min() < 0:
        raise ValueError("bitpack requires non-negative values; use 'for'")
    width = bitio.bit_width(int(vals.max()))
    return bitio.pack_uints(vals.astype(np.uint64), width), {"itype": itype, "width": width}


def decode_bitpack(data: bytes, params: dict) -> pa.Array:
    vals = bitio.unpack_uints(data, params["width"], params["n"])
    return _restore_int(vals.astype(np.int64), params["itype"])


register("bitpack", encode_bitpack, decode_bitpack)


def encode_delta(arr: pa.Array) -> tuple[bytes, dict]:
    """First value + zigzag(diff) bit-packed — wins on monotone columns."""
    vals, itype = _int_values(arr)
    if len(vals) == 0:
        return b"", {"itype": itype, "first": 0, "width": 1}
    v = vals.astype(np.int64)
    diffs = bitio.zigzag_encode(np.diff(v, prepend=v[0]))
    width = bitio.bit_width(int(diffs.max())) if len(diffs) else 1
    return bitio.pack_uints(diffs, width), {
        "itype": itype, "first": int(v[0]), "width": width,
    }


def decode_delta(data: bytes, params: dict) -> pa.Array:
    n = params["n"]
    diffs = bitio.zigzag_decode(bitio.unpack_uints(data, params["width"], n))
    vals = np.cumsum(diffs)  # first diff is 0 relative to params["first"]
    return _restore_int(vals + params["first"], params["itype"])


register("delta", encode_delta, decode_delta)


# --------------------------------------------------------------------------
# dictionary — arrow dictionary_encode; indices bit-packed, values nested
# --------------------------------------------------------------------------


def encode_dict(arr: pa.Array, values_codec: str | None = None) -> tuple[bytes, dict]:
    n = len(arr)
    if n == 0:
        return b"", {"card": 0, "width": 1, "values": {"codec": "plain"}, "lens": [0, 0]}
    denc = pc.dictionary_encode(arr)
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    indices = denc.indices.to_numpy(zero_copy_only=False).astype(np.uint64)
    dictionary = denc.dictionary
    width = bitio.bit_width(max(len(dictionary) - 1, 1))
    idx_blob = bitio.pack_uints(indices, width)
    if values_codec is None:
        # long text dictionaries benefit from fsst; short ones from plain
        values_codec = "fsst" if (
            pa.types.is_string(dictionary.type)
            and dictionary.nbytes > 64 * len(dictionary)
        ) else "plain"
    vblob, vparams = encode_child(dictionary, values_codec)
    vparams["n"] = len(dictionary)
    data, lens = concat_blobs(idx_blob, vblob)
    return data, {"card": len(dictionary), "width": width, "values": vparams, "lens": lens}


def decode_dict(data: bytes, params: dict) -> pa.Array:
    n = params["n"]
    if n == 0 or params["card"] == 0:
        vp = params["values"]
        return pa.array([], type=pa.string() if vp.get("otype") != "large_string" else pa.large_string())
    idx_blob, vblob = split_blobs(data, params["lens"])
    indices = bitio.unpack_uints(idx_blob, params["width"], n).astype(np.int64)
    dictionary = decode_child(vblob, params["values"])
    return dictionary.take(pa.array(indices))


register("dict", encode_dict, decode_dict)


# --------------------------------------------------------------------------
# RLE — run ends on any comparable type; run values nested, lengths packed
# --------------------------------------------------------------------------


def encode_rle(arr: pa.Array, values_codec: str = "plain") -> tuple[bytes, dict]:
    n = len(arr)
    if n == 0:
        return b"", {"runs": 0, "lwidth": 1, "values": {"codec": "plain"}, "lens": [0, 0]}
    changed = pc.invert(
        pc.equal(arr.slice(1), arr.slice(0, n - 1))
    ).to_numpy(zero_copy_only=False)
    starts = np.concatenate(([0], np.flatnonzero(changed) + 1))
    lengths = np.diff(np.concatenate((starts, [n]))).astype(np.uint64) - 1  # ≥0
    values = arr.take(pa.array(starts))
    lwidth = bitio.bit_width(int(lengths.max())) if len(lengths) else 1
    len_blob = bitio.pack_uints(lengths, lwidth)
    vblob, vparams = encode_child(values, values_codec)
    vparams["n"] = len(values)
    data, lens = concat_blobs(len_blob, vblob)
    return data, {"runs": len(values), "lwidth": lwidth, "values": vparams, "lens": lens}


def decode_rle(data: bytes, params: dict) -> pa.Array:
    runs = params["runs"]
    if runs == 0:
        return pa.array([], type=pa.string())
    len_blob, vblob = split_blobs(data, params["lens"])
    lengths = bitio.unpack_uints(len_blob, params["lwidth"], runs).astype(np.int64) + 1
    values = decode_child(vblob, params["values"])
    idx = np.repeat(np.arange(runs), lengths)
    return values.take(pa.array(idx))


register("rle", encode_rle, decode_rle)
