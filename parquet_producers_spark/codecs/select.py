"""Statistics-driven codec auto-selection (SURVEY.md §2.3, north_rule).

Per column chunk we compute cheap stats (cardinality, run count, value
range, monotonicity, byte widths) with ``pyarrow.compute``, shortlist
candidate codecs from a rule table, then *measure* each shortlisted
candidate on a bounded sample slice and pick the smallest. Stats prune,
samples decide — guessing from stats alone mispredicts FSST-vs-dict on
real text.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

from .base import encode_array

SAMPLE_ROWS = 512  # candidate codecs are measured on this many rows


@dataclass
class ColumnStats:
    n: int
    n_nulls: int
    n_distinct: int
    n_runs: int
    nbytes: int
    vmin: int | None = None
    vmax: int | None = None
    monotone_frac: float | None = None
    avg_len: float | None = None

    def as_dict(self) -> dict[str, Any]:
        return {k: v for k, v in self.__dict__.items() if v is not None}


def column_stats(arr: pa.Array) -> ColumnStats:
    n = len(arr)
    if n == 0:
        return ColumnStats(0, 0, 0, 0, 0)
    if pa.types.is_nested(arr.type):
        # lists/structs/maps have no equal/count_distinct kernels and go
        # straight to the plain codec — skip the stats that need them
        return ColumnStats(n, arr.null_count, n, n, arr.nbytes)
    n_runs = 1
    if n > 1:
        eq = pc.equal(arr.slice(1), arr.slice(0, n - 1))
        n_runs = n - pc.sum(eq).as_py() if pc.sum(eq).as_py() is not None else n
    st = ColumnStats(
        n=n,
        n_nulls=arr.null_count,
        n_distinct=pc.count_distinct(arr).as_py(),
        n_runs=n_runs,
        nbytes=arr.nbytes,
    )
    t = arr.type
    if pa.types.is_integer(t):
        nn = arr.drop_null() if arr.null_count else arr
        if len(nn):
            st.vmin = pc.min(nn).as_py()
            st.vmax = pc.max(nn).as_py()
            if n > 1:
                import numpy as np

                v = nn.to_numpy(zero_copy_only=False)
                st.monotone_frac = float((np.diff(v) >= 0).mean()) if len(v) > 1 else 1.0
    elif pa.types.is_string(t) or pa.types.is_large_string(t):
        st.avg_len = (arr.nbytes - 4 * n) / max(n, 1)
    return st


def candidate_codecs(arr: pa.Array, stats: ColumnStats) -> list[str]:
    """Rule table: shortlist codecs worth measuring for this chunk."""
    t = arr.type
    n = max(stats.n, 1)
    cands = ["plain"]
    if pa.types.is_integer(t):
        cands.append("for")
        if stats.vmin is not None and stats.vmin >= 0:
            cands.append("bitpack")
        if stats.monotone_frac is not None and stats.monotone_frac > 0.5:
            cands.append("delta")
        if stats.n_runs / n < 0.5:
            cands.append("rle")
        if stats.n_distinct / n < 0.05:
            cands.append("dict")
    elif pa.types.is_string(t) or pa.types.is_large_string(t):
        if stats.n_distinct / n < 0.6:
            cands.append("dict")
        if stats.n_runs / n < 0.5:
            cands.append("rle")
        if (stats.avg_len or 0) >= 4 and stats.n_distinct / n > 0.01:
            cands.append("fsst")
        if (stats.avg_len or 0) >= 60:
            cands.append("linedict")  # long text → line-repeat structure
    return cands


@dataclass
class Choice:
    codec: str
    sample_sizes: dict[str, int] = field(default_factory=dict)


# rough single-core encode speed (MB/s, measured in this sandbox) —
# used by the 'balanced' profile to avoid paying a 40× slowdown for a
# few percent of size
CODEC_SPEED = {
    "plain": 2000, "bitpack": 800, "for": 800, "delta": 700,
    "rle": 500, "dict": 400, "linedict": 150, "fsst": 8,
}

# a slow codec must beat every faster candidate's size by this margin
PROFILE_SLACK = {"size": 0.0, "balanced": 0.20, "fast": 0.50}

# codecs whose sample encode is expensive enough to gate (MB/s ≤ ~10)
SLOW_CODECS = {"fsst"}
# …measured only when the best fast candidate is worse than this ratio
SLOW_WORTH_TRYING = 0.5


def choose_codec(arr: pa.Array, stats: ColumnStats | None = None,
                 cascade: bool = False, profile: str = "size") -> Choice:
    """Pick the codec with the smallest measured size on a sample slice."""
    choice, _blob, _params = encode_auto(arr, stats, cascade=cascade,
                                         profile=profile, want_blob=False)
    return choice


def encode_auto(
    arr: pa.Array,
    stats: ColumnStats | None = None,
    cascade: bool = False,
    profile: str = "size",
    want_blob: bool = True,
) -> tuple[Choice, bytes | None, dict | None]:
    """Stats → shortlist → measure candidates on a sample → encode with
    the winner. When the sample IS the whole chunk, the winner's sample
    blob is reused — candidates are never encoded twice on full data.

    Profiles: ``size`` picks the smallest outright; ``balanced``/``fast``
    admit every candidate within PROFILE_SLACK of the smallest and pick
    the fastest admitted one (CODEC_SPEED) — the throughput-vs-ratio
    knob a 100 TB deployment actually needs.
    """
    if stats is None:
        stats = column_stats(arr)
    cands = candidate_codecs(arr, stats)
    full = stats.n <= SAMPLE_ROWS
    sample = arr if full else arr.slice(0, SAMPLE_ROWS)
    # fast candidates first; a slow candidate (fsst) is only *measured*
    # when no fast codec reached a decent ratio — otherwise the sample
    # encode of the slow codec dominates the whole chunk's encode time
    fast = [c for c in cands if c not in SLOW_CODECS]
    slow = [c for c in cands if c in SLOW_CODECS]
    results: dict[str, tuple[bytes, dict]] = {}
    for name in fast:
        try:
            results[name] = encode_array(sample, name, cascade=cascade)
        except (ValueError, TypeError):
            continue
    best_fast = min(len(v[0]) for v in results.values())
    if slow and best_fast > SLOW_WORTH_TRYING * max(sample.nbytes, 1):
        for name in slow:
            try:
                results[name] = encode_array(sample, name, cascade=cascade)
            except (ValueError, TypeError):
                continue
    sizes = {k: len(v[0]) for k, v in results.items()}
    smin = min(sizes.values())
    slack = PROFILE_SLACK.get(profile, 0.0)
    admitted = [k for k, s in sizes.items() if s <= smin * (1 + slack)]
    best = max(admitted, key=lambda k: (CODEC_SPEED.get(k, 1), -sizes[k]))
    choice = Choice(best, sizes)
    if not want_blob:
        return choice, None, None
    if full:
        blob, params = results[best]
    else:
        blob, params = encode_array(arr, best, cascade=cascade)
    return choice, blob, params
