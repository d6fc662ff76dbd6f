"""FSST-family string compression, fully vectorized over Arrow buffers.

FSST (cf. PAPERS.md — "FSST: Fast Random Access String Compression",
VLDB 2020) replaces frequent substrings of up to 8 bytes with 1-byte-ish
codes from a per-chunk symbol table. This implementation keeps the FSST
contract — per-chunk symbol table, symbols ≤ 8 bytes, random-access
decode, bit-identical round trip — but builds the table by iterative
**pairing rounds** (a Re-Pair-style construction) so that both encode
and decode are pure numpy array passes with no per-byte Python:

* round r pairs the most frequent adjacent code pairs into new codes;
  3 rounds compose symbols of up to 2³ = 8 bytes (the FSST cap);
* pair matching is one vectorized key-build + one argsort per round;
  overlap resolution (only possible for ``l == r``) keeps alternating
  positions within each run;
* the final code stream is bit-packed at the minimal width, string
  boundaries are kept as a separately-packed code-count column.

The reference gets its string compression implicitly from Parquet.Net
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
ROUND_CAPS = (96, 48, 40)      # new symbols per pairing round (sum < 0xFE00-256)
MIN_PAIR_COUNT = 8             # a pair must appear this often to earn a code
COUNT_SAMPLE = 4_000_000       # pair-frequency stats from ≤ this many codes


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


def _build_stream(offsets: np.ndarray, data: np.ndarray) -> np.ndarray:
    """Interleave a BOUND sentinel after every string's bytes."""
    n_str = len(offsets) - 1
    out = np.empty(len(data) + n_str, dtype=np.uint16)
    sentinel_at = offsets[1:] + np.arange(n_str)
    out[sentinel_at] = BOUND
    mask = np.ones(len(out), dtype=bool)
    mask[sentinel_at] = False
    out[mask] = data
    return out


def _pairing_round(
    codes: np.ndarray, next_code: int, sym_len: np.ndarray, cap: int
) -> tuple[np.ndarray, list[tuple[int, int]]]:
    """One vectorized pairing round. Returns compacted codes + new pairs.

    Matching policy: a position is a candidate iff its adjacent pair is
    one of the ``cap`` most frequent pairs this round; overlaps (only
    adjacent candidates can overlap) are resolved by keeping alternating
    positions within each maximal run of consecutive candidates —
    deterministic, maximal, and O(n) with no per-symbol loop.
    """
    if len(codes) < 2 or cap <= 0:
        return codes, []
    uniq, counts = _pair_counts(codes)
    hi, lo = uniq >> np.uint32(16), uniq & np.uint32(0xFFFF)
    # drop sentinel-containing pairs, rare pairs, over-long symbols
    good = (
        (hi < DEAD) & (lo < DEAD)
        & (counts >= MIN_PAIR_COUNT)
        & (sym_len[hi] + sym_len[lo] <= MAX_SYMBOL_LEN)
    )
    uniq, counts = uniq[good], counts[good]
    if len(uniq) == 0:
        return codes, []
    sel_sorted = np.sort(uniq[np.argsort(counts)[::-1][:cap]])

    # rank lookup via a (distinct-lefts × 64Ki) table: two gathers, no sort
    lefts = np.unique(sel_sorted >> np.uint32(16)).astype(np.int64)
    lid = np.full(1 << 16, -1, dtype=np.int16)
    lid[lefts] = np.arange(len(lefts), dtype=np.int16)
    tab = np.full((len(lefts), 1 << 16), -1, dtype=np.int16)
    tab[lid[sel_sorted >> np.uint32(16)], sel_sorted & np.uint32(0xFFFF)] = (
        np.arange(len(sel_sorted), dtype=np.int16)
    )
    a, b = codes[:-1], codes[1:]
    la = lid[a]
    rank_pos = tab[np.maximum(la, 0), b]
    rank_pos[la < 0] = -1
    cand = rank_pos >= 0
    if not cand.any():
        return codes, []
    # alternate within each maximal run of consecutive candidates —
    # adjacent matches overlap; non-adjacent never do. All mask math.
    prev = np.empty_like(cand)
    prev[0] = False
    prev[1:] = cand[:-1]
    run_start = cand & ~prev
    pcount = cand.cumsum(dtype=np.int32)
    base = np.maximum.accumulate(np.where(run_start, pcount, 0))
    keep = cand & (((pcount - base) & 1) == 0)
    rk = rank_pos[keep].astype(np.int64)
    # a selected pair must still clear MIN_PAIR_COUNT after overlap loss
    good_rank = np.bincount(rk, minlength=len(sel_sorted)) >= MIN_PAIR_COUNT
    if not good_rank.any():
        return codes, []
    keep &= good_rank[np.maximum(rank_pos, 0)]
    new_code = (next_code + np.cumsum(good_rank) - 1).astype(np.uint16)
    codes[:-1][keep] = new_code[rank_pos[keep]]
    tail = np.empty(len(codes), dtype=bool)
    tail[0] = False
    tail[1:] = keep
    codes[tail] = DEAD
    pairs = [
        (int(sel_sorted[r] >> np.uint32(16)), int(sel_sorted[r] & np.uint32(0xFFFF)))
        for r in np.flatnonzero(good_rank)
    ]
    return codes[codes != DEAD], pairs


def _pair_counts(codes: np.ndarray, max_sample: int = COUNT_SAMPLE):
    """Adjacent-pair frequencies, from contiguous sample blocks when large."""
    n = len(codes)
    if n <= max_sample:
        key = (codes[:-1].astype(np.uint32) << np.uint32(16)) | codes[1:]
        return np.unique(key, return_counts=True)
    nblk = 8
    blk = max_sample // nblk
    starts = np.linspace(0, n - blk, nblk).astype(np.int64)
    keys = [
        (codes[s: s + blk - 1].astype(np.uint32) << np.uint32(16))
        | codes[s + 1: s + blk]
        for s in starts
    ]
    return np.unique(np.concatenate(keys), return_counts=True)


def encode_fsst(arr: pa.Array) -> tuple[bytes, dict]:
    n = len(arr)
    offsets, data, otype = _string_bytes(arr)
    if len(data) == 0:
        return b"", {"otype": otype, "syms": 0, "codes": 0,
                     "cwidth": 1, "swidth": 1, "lens": [0, 0, 0]}
    codes = _build_stream(offsets, data)
    sym_len = np.ones(1 << 16, dtype=np.int64)  # code → expanded byte length
    table: list[tuple[int, int]] = []
    for cap in ROUND_CAPS:
        codes, pairs = _pairing_round(codes, 256 + len(table), sym_len, cap)
        if not pairs:
            break
        for left, right in pairs:
            sym_len[256 + len(table)] = sym_len[left] + sym_len[right]
            table.append((left, right))
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
