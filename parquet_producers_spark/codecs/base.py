"""Codec framework: registry, null handling, optional entropy cascade.

A codec turns one Arrow array (one column chunk) into ``(blob, params)``
where ``blob`` is bytes and ``params`` is a JSON-safe dict, and back —
bit-identically. The reference delegates all of this to Parquet.Net
(reference: Parquet.Producers/ParquetProducerPlatformOptions.cs:17,
README.md:104 "Parquet performs compression on columns..."); here it is
explicit engine capability (SURVEY.md §2.3, BASELINE.json north_rule).

Layering
--------
``encode_array`` / ``decode_array`` are the only entry points the Spark
layer uses. They handle, in order:

1. **nulls** — validity bitmap is split off (packed bits) and the codec
   only ever sees the compacted non-null values;
2. **the codec itself** — looked up in ``CODECS`` by name, possibly with
   nested child codecs (dict values, RLE run values);
3. **optional entropy cascade** — a final general-purpose pass (zstd via
   ``pyarrow.Codec``) on the lightweight-encoded blob, recorded in
   params. The lightweight codecs do the structural work; the cascade is
   measured separately in the bench so both numbers are honest.

All kernels are numpy / pyarrow.compute over contiguous buffers: zero
per-row Python.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np
import pyarrow as pa

from . import bitio

# name -> (encode(arr) -> (bytes, params), decode(bytes, params) -> pa.Array)
CODECS: dict[str, tuple[Callable, Callable]] = {}


def register(name: str, encode: Callable, decode: Callable) -> None:
    CODECS[name] = (encode, decode)


def encode_child(arr: pa.Array, codec: str) -> tuple[bytes, dict]:
    """Encode a nested array (e.g. a dictionary) with a named codec."""
    enc, _ = CODECS[codec]
    blob, params = enc(arr)
    params["codec"] = codec
    return blob, params


def decode_child(blob: bytes, params: dict) -> pa.Array:
    _, dec = CODECS[params["codec"]]
    return dec(blob, params)


def concat_blobs(*blobs: bytes) -> tuple[bytes, list[int]]:
    """Join child blobs into one; lengths go to params for splitting."""
    return b"".join(blobs), [len(b) for b in blobs]


def split_blobs(data: bytes, lengths: list[int]) -> list[bytes]:
    out, pos = [], 0
    for ln in lengths:
        out.append(data[pos:pos + ln])
        pos += ln
    return out


_ZSTD = pa.Codec("zstd", compression_level=3)


def encode_array(
    arr: pa.Array,
    codec: str,
    cascade: bool = False,
) -> tuple[bytes, dict[str, Any]]:
    """Top-level encode: null split → codec → optional zstd cascade."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    params: dict[str, Any] = {"codec": codec, "n": n}
    if arr.null_count > 0:
        mask = arr.is_valid().to_numpy(zero_copy_only=False)
        params["validity"] = True
        arr = arr.drop_null()
        params["nv"] = len(arr)
        vbits = bitio.pack_bools(mask)
        params["vlen"] = len(vbits)
    else:
        vbits = b""
    enc, _ = CODECS[codec]
    blob, cparams = enc(arr)
    params.update(cparams)
    params["codec"] = codec  # codec wins over any child leftovers
    data = vbits + blob
    if cascade:
        packed = _ZSTD.compress(data, asbytes=True)
        if len(packed) < len(data):
            params["wrap"] = "zstd"
            params["unwrapped"] = len(data)
            data = packed
    return data, params


def decode_array(data: bytes, params: dict[str, Any]) -> pa.Array:
    """Inverse of :func:`encode_array`; returns the original array."""
    if params.get("wrap") == "zstd":
        data = _ZSTD.decompress(data, params["unwrapped"], asbytes=True)
    n = params["n"]
    if params.get("validity"):
        vlen = params["vlen"]
        mask = bitio.unpack_bools(data[:vlen], n)
        data = data[vlen:]
    else:
        mask = None
    _, dec = CODECS[params["codec"]]
    if mask is None:
        return dec(data, params)
    child_params = dict(params)
    child_params["n"] = params["nv"]
    values = dec(data, child_params)
    if len(values) == 0:
        # all-null chunk: nothing to take from (index 0 would be out of
        # bounds on the empty values array)
        return pa.nulls(n, type=values.type)
    # re-expand compacted values to full length with nulls
    import pyarrow.compute as pc

    idx = np.cumsum(mask) - 1
    taken = values.take(pa.array(np.where(mask, idx, 0)))
    return pc.if_else(pa.array(mask), taken, pa.nulls(n, type=values.type))
