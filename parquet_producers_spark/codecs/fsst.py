"""FSST-family string compression, fully vectorized over Arrow buffers.

FSST (cf. PAPERS.md — "FSST: Fast Random Access String Compression",
VLDB 2020) replaces frequent substrings of up to 8 bytes with short
codes from a per-chunk symbol table. This implementation keeps the FSST
contract — per-chunk symbol table, symbols ≤ 8 bytes, bit-identical
round trip — built by iterative **pairing rounds** (a Re-Pair-style
construction): round r pairs the most frequent adjacent code pairs into
new codes, so 3 rounds compose symbols up to 2³ = 8 bytes.

Execution model (the part that matters at 32 concurrent workers):

* pair frequencies come from a bounded sample;
* substitution runs **cache-blocked**: the code stream is split at
  string boundaries into ~128 Ki-code blocks, and every per-round
  temporary lives in a per-process scratch arena reused across blocks
  and chunks (``out=`` ufuncs, no fresh allocations). DRAM traffic per
  round drops from ~20 full-stream temporaries to read+write of the
  stream itself — the difference between a memory-bandwidth-bound and
  a compute-bound kernel when 32 executor cores run this at once;
* overlaps (only adjacent matches can overlap) are resolved by keeping
  alternating positions within each run of consecutive candidates —
  deterministic, O(n), no per-symbol loop.

The reference gets string compression implicitly from Parquet.Net
(reference: README.md:104); this codec is the explicit engine-side
replacement mandated by BASELINE.json's north_rule.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import bitio
from .base import concat_blobs, register, split_blobs

BOUND = np.uint16(0xFFFF)  # string-boundary sentinel (never pairs)
DEAD = np.uint16(0xFFFE)   # tombstone for consumed pair tails

MAX_SYMBOL_LEN = 8
ROUND_CAPS = (96, 48, 40)      # new symbols per pairing round
MIN_PAIR_COUNT = 8             # a pair must appear this often to earn a code
COUNT_SAMPLE = 2_000_000       # pair-frequency stats from ≤ this many codes
BLOCK_CODES = 1 << 17          # ~128Ki codes per substitution block


def _string_bytes(arr: pa.Array) -> tuple[np.ndarray, np.ndarray, str]:
    """Zero-copy offsets + data bytes of a string/large_string array."""
    otype = str(arr.type)
    if otype == "string":
        width, dt = 4, np.int32
    elif otype == "large_string":
        width, dt = 8, np.int64
    else:
        raise TypeError(f"fsst on non-string type {otype}")
    bufs = arr.buffers()
    offsets = np.frombuffer(
        bufs[1], dtype=dt, count=len(arr) + 1, offset=arr.offset * width
    ).astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)[offsets[0]: offsets[-1]]
    return offsets - offsets[0], data, otype


def _build_blocks(offsets: np.ndarray, data: np.ndarray) -> list[np.ndarray]:
    """Code stream (bytes + BOUND sentinel after each string), split at
    string boundaries into ~BLOCK_CODES blocks so pairs never span
    blocks and per-block temporaries stay cache-resident."""
    n_str = len(offsets) - 1
    total = len(data) + n_str
    out = np.empty(total, dtype=np.uint16)
    sentinel_at = offsets[1:] + np.arange(n_str)
    out[sentinel_at] = BOUND
    mask = np.ones(total, dtype=bool)
    mask[sentinel_at] = False
    out[mask] = data
    if total <= BLOCK_CODES:
        return [out]
    targets = np.arange(BLOCK_CODES, total, BLOCK_CODES)
    idx = np.minimum(np.searchsorted(sentinel_at, targets), n_str - 1)
    cuts = np.unique(sentinel_at[idx] + 1)
    cuts = cuts[cuts < total]
    return np.split(out, cuts)


class _Scratch:
    """Per-process reusable buffers (module-global: Spark python workers
    are reused across tasks, so the arena persists across chunks)."""

    def __init__(self, m: int):
        self.u8a = np.empty(m, np.uint8)
        self.u8b = np.empty(m, np.uint8)
        self.i16a = np.empty(m, np.int16)
        self.i32a = np.empty(m, np.int32)
        self.i32b = np.empty(m, np.int32)
        self.i32c = np.empty(m, np.int32)
        self.b1 = np.empty(m, bool)
        self.b2 = np.empty(m, bool)
        self.b3 = np.empty(m, bool)


_SCRATCH: _Scratch | None = None


def _scratch(m: int) -> _Scratch:
    global _SCRATCH
    if _SCRATCH is None or len(_SCRATCH.i32a) < m:
        _SCRATCH = _Scratch(max(m, BLOCK_CODES + 1))
    return _SCRATCH


def _sample_pair_counts(blocks: list[np.ndarray]):
    """Adjacent-pair frequencies from ≤ COUNT_SAMPLE codes, spread over
    evenly-spaced blocks."""
    total = sum(len(b) for b in blocks)
    keys = []
    budget = min(total, COUNT_SAMPLE)
    step = max(1, int(np.ceil(total / budget)))
    for i, b in enumerate(blocks):
        if i % step or len(b) < 2:
            continue
        keys.append((b[:-1].astype(np.uint32) << np.uint32(16)) | b[1:])
    if not keys:
        return np.empty(0, np.uint32), np.empty(0, np.int64)
    return np.unique(np.concatenate(keys), return_counts=True)


def _select_pairs(blocks, sym_len, cap):
    """Pick this round's pairs (sorted key array — L1-resident lookup)."""
    uniq, counts = _sample_pair_counts(blocks)
    if len(uniq) == 0:
        return None
    hi, lo = uniq >> np.uint32(16), uniq & np.uint32(0xFFFF)
    good = (
        (hi < DEAD) & (lo < DEAD)
        & (counts >= MIN_PAIR_COUNT)
        & (sym_len[hi] + sym_len[lo] <= MAX_SYMBOL_LEN)
    )
    uniq, counts = uniq[good], counts[good]
    if len(uniq) == 0:
        return None
    sel = np.sort(uniq[np.argsort(counts)[::-1][:cap]])
    pairs = [(int(k >> np.uint32(16)), int(k & np.uint32(0xFFFF))) for k in sel]
    # two-level compact lookup: code→left-id, code→right-id (64 KB each)
    # + a (≤97)² rank grid — everything cache-resident at 32-way
    # concurrency, unlike a (lefts × 64Ki) table which thrashes L3
    lefts = np.unique(sel >> np.uint32(16)).astype(np.int64)
    rights = np.unique(sel & np.uint32(0xFFFF)).astype(np.int64)
    nl, nr = len(lefts), len(rights)
    lid = np.full(1 << 16, nl, dtype=np.uint8)      # nl = invalid row
    rid = np.full(1 << 16, nr, dtype=np.uint8)      # nr = invalid col
    lid[lefts] = np.arange(nl, dtype=np.uint8)
    rid[rights] = np.arange(nr, dtype=np.uint8)
    grid = np.full((nl + 1) * (nr + 1), -1, dtype=np.int16)
    rows = lid[sel >> np.uint32(16)].astype(np.int64)
    cols = rid[sel & np.uint32(0xFFFF)].astype(np.int64)
    grid[rows * (nr + 1) + cols] = np.arange(len(sel), dtype=np.int16)
    return (lid, rid, grid, nr + 1), pairs


def _substitute_block(
    block: np.ndarray, lookup: tuple, first_code: int, sc: _Scratch,
) -> np.ndarray:
    """Apply this round's pairs to one block, scratch-only temporaries."""
    lid, rid, grid, stride = lookup
    m = len(block) - 1
    if m < 1:
        return block
    a, b = block[:-1], block[1:]
    flat = sc.i32a[:m]
    np.take(lid, a, out=sc.u8a[:m])
    np.take(rid, b, out=sc.u8b[:m])
    np.copyto(flat, sc.u8a[:m])
    np.multiply(flat, stride, out=flat)
    np.add(flat, sc.u8b[:m], out=flat, casting="unsafe")
    rank = sc.i16a[:m]
    np.take(grid, flat, out=rank)
    cand = sc.b1[:m]
    np.greater_equal(rank, 0, out=cand)
    if not cand.any():
        return block
    prev = sc.b2[:m]
    prev[0] = False
    prev[1:] = cand[:-1]
    np.logical_not(prev, out=prev)
    np.logical_and(cand, prev, out=prev)          # prev := run_start
    pcount = sc.i32b[:m]
    np.cumsum(cand, out=pcount)
    base = sc.i32c[:m]
    np.multiply(pcount, prev, out=base)
    np.maximum.accumulate(base, out=base)
    np.subtract(pcount, base, out=pcount)
    np.bitwise_and(pcount, 1, out=pcount)
    keep = sc.b3[:m]
    np.equal(pcount, 0, out=keep)
    np.logical_and(keep, cand, out=keep)
    kept_rank = rank[keep]
    if len(kept_rank) == 0:
        return block
    a[keep] = (first_code + kept_rank).astype(np.uint16)
    b[keep] = DEAD
    return block[block != DEAD]


def encode_fsst(arr: pa.Array) -> tuple[bytes, dict]:
    n = len(arr)
    offsets, data, otype = _string_bytes(arr)
    if len(data) == 0:
        return b"", {"otype": otype, "syms": 0, "codes": 0,
                     "cwidth": 1, "swidth": 1, "lens": [0, 0, 0]}
    blocks = _build_blocks(offsets, data)
    sc = _scratch(max(len(b) for b in blocks))
    sym_len = np.ones(1 << 16, dtype=np.int64)  # code → expanded byte length
    table: list[tuple[int, int]] = []
    for cap in ROUND_CAPS:
        picked = _select_pairs(blocks, sym_len, cap)
        if picked is None:
            break
        lookup, pairs = picked
        first_code = 256 + len(table)
        blocks = [
            _substitute_block(blk, lookup, first_code, sc) for blk in blocks
        ]
        for left, right in pairs:
            sym_len[256 + len(table)] = sym_len[left] + sym_len[right]
            table.append((left, right))
    codes = blocks[0] if len(blocks) == 1 else np.concatenate(blocks)
    # recover per-string code counts from the sentinels, then drop them
    sent = np.flatnonzero(codes == BOUND)
    counts = np.diff(np.concatenate(([-1], sent))) - 1
    codes = codes[codes != BOUND].astype(np.uint64)
    cwidth = bitio.bit_width(255 + len(table))
    swidth = bitio.bit_width(int(counts.max())) if n else 1
    tbl = np.asarray(table, dtype=np.uint16).tobytes() if table else b""
    blob, lens = concat_blobs(
        tbl,
        bitio.pack_uints(counts.astype(np.uint64), swidth),
        bitio.pack_uints(codes, cwidth),
    )
    return blob, {"otype": otype, "syms": len(table), "codes": int(len(codes)),
                  "cwidth": cwidth, "swidth": swidth, "lens": lens}


def decode_fsst(data: bytes, params: dict) -> pa.Array:
    n = params["n"]
    otype = params["otype"]
    str_type = pa.large_string() if otype == "large_string" else pa.string()
    if params["codes"] == 0 and params["syms"] == 0 and not data:
        # all strings empty (or no rows)
        off_dt = np.int64 if otype == "large_string" else np.int32
        offs = np.zeros(n + 1, dtype=off_dt)
        return pa.Array.from_buffers(
            str_type, n, [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(b"")]
        )
    tbl_blob, cnt_blob, code_blob = split_blobs(data, params["lens"])
    pairs = np.frombuffer(tbl_blob, dtype=np.uint16).reshape(-1, 2)
    # expansion table: ≤ MAX symbols, constant-bounded python loop
    exps: list[bytes] = [bytes([i]) for i in range(256)]
    for left, right in pairs:
        exps.append(exps[left] + exps[right])
    exp_lens = np.fromiter((len(e) for e in exps), dtype=np.int64)
    exp_starts = np.concatenate(([0], np.cumsum(exp_lens)[:-1]))
    exp_buf = np.frombuffer(b"".join(exps), dtype=np.uint8)

    counts = bitio.unpack_uints(cnt_blob, params["swidth"], n).astype(np.int64)
    codes = bitio.unpack_uints(
        code_blob, params["cwidth"], params["codes"]
    ).astype(np.int64)
    lens_of = exp_lens[codes]
    total = int(lens_of.sum())
    cum = np.concatenate(([0], np.cumsum(lens_of)[:-1]))
    gather = np.repeat(exp_starts[codes] - cum, lens_of) + np.arange(total)
    out = exp_buf[gather]

    code_offs = np.concatenate(([0], np.cumsum(counts)))
    byte_cum = np.concatenate(([0], np.cumsum(lens_of)))
    byte_offs = byte_cum[code_offs]
    off_dt = np.int64 if otype == "large_string" else np.int32
    return pa.Array.from_buffers(
        str_type, n,
        [None, pa.py_buffer(byte_offs.astype(off_dt).tobytes()),
         pa.py_buffer(out.tobytes())],
    )


register("fsst", encode_fsst, decode_fsst)
