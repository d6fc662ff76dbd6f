"""Line-granularity dictionary coding for source-text columns.

Source code repeats whole lines constantly (imports, braces, common
statements) — matches far longer than FSST's 8-byte symbol cap. This
codec splits each value on ``\n``, dictionary-encodes the distinct
lines (per chunk), bit-packs the line-id stream and per-row line
counts, and compresses the line dictionary itself with FSST. Every
step is an Arrow C++ kernel (``split_pattern``, ``dictionary_encode``,
``take``, ``binary_join``) or numpy bit-packing — no per-row Python.

``join(split(s, "\\n"), "\\n") == s`` for any string, so the round trip
is bit-identical; values without newlines degrade gracefully to whole-
value dictionary coding (the selector simply measures whether it wins).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import bitio
from .base import concat_blobs, decode_child, encode_child, register, split_blobs


def encode_linedict(arr: pa.Array) -> tuple[bytes, dict]:
    otype = str(arr.type)
    n = len(arr)
    if n == 0:
        return b"", {"otype": otype, "n_lines": 0, "card": 0,
                     "iwidth": 1, "cwidth": 1,
                     "values": {"codec": "plain"}, "lens": [0, 0, 0]}
    split = pc.split_pattern(arr, "\n")
    counts = pc.list_value_length(split).to_numpy(zero_copy_only=False
                                                  ).astype(np.uint64)
    flat = pc.list_flatten(split)
    denc = pc.dictionary_encode(flat)
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    indices = denc.indices.to_numpy(zero_copy_only=False).astype(np.uint64)
    dictionary = denc.dictionary
    iwidth = bitio.bit_width(max(len(dictionary) - 1, 1))
    cwidth = bitio.bit_width(int(counts.max())) if len(counts) else 1
    vblob, vparams = encode_child(
        dictionary.cast(pa.large_string()) if dictionary.nbytes > 2**31 - 1
        else dictionary, "fsst")
    vparams["n"] = len(dictionary)
    blob, lens = concat_blobs(
        bitio.pack_uints(counts, cwidth),
        bitio.pack_uints(indices, iwidth),
        vblob,
    )
    return blob, {"otype": otype, "n_lines": int(len(indices)),
                  "card": len(dictionary), "iwidth": iwidth,
                  "cwidth": cwidth, "values": vparams, "lens": lens}


def decode_linedict(data: bytes, params: dict) -> pa.Array:
    n = params["n"]
    str_type = (pa.large_string() if params["otype"] == "large_string"
                else pa.string())
    if n == 0 or params["card"] == 0:
        return pa.array([], type=str_type)
    cnt_blob, idx_blob, vblob = split_blobs(data, params["lens"])
    counts = bitio.unpack_uints(cnt_blob, params["cwidth"], n).astype(np.int64)
    indices = bitio.unpack_uints(
        idx_blob, params["iwidth"], params["n_lines"]).astype(np.int64)
    dictionary = decode_child(vblob, params["values"])
    lines = dictionary.take(pa.array(indices))
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    lst = pa.LargeListArray.from_arrays(pa.array(offsets), lines)
    joined = pc.binary_join(lst, "\n")
    return joined.cast(str_type)


register("linedict", encode_linedict, decode_linedict)
