"""Property-based tests (hypothesis) for the dedup/fingerprint math:
the pigeonhole banding of simhash pairs is lossless for ANY signature
set, and winnowing guarantees a shared fingerprint for any shared run
of ≥ k+w-1 tokens."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_producers_spark.functions.dedup import _simhash_segments


@given(
    bits=st.integers(min_value=4, max_value=64),
    max_hamming=st.integers(min_value=0, max_value=7),
)
def test_simhash_segments_partition_bits(bits, max_hamming):
    """Segments are disjoint, cover all bits, and number r+1 — the
    precondition of the pigeonhole argument."""
    segs = _simhash_segments(bits, max_hamming)
    assert len(segs) == max_hamming + 1
    covered = []
    for lo, w in segs:
        covered.extend(range(lo, lo + w))
    assert covered == list(range(bits))


@given(
    sig_a=st.integers(min_value=0, max_value=(1 << 16) - 1),
    flip_bits=st.lists(st.integers(min_value=0, max_value=15),
                       max_size=3, unique=True),
)
@settings(max_examples=200)
def test_pigeonhole_pairs_share_a_segment(sig_a, flip_bits):
    """Any pair within hamming r agrees exactly on ≥1 of the r+1
    segments (the no-false-negatives core of simhash_near_pairs)."""
    sig_b = sig_a
    for b in flip_bits:
        sig_b ^= 1 << b
    segs = _simhash_segments(16, 3)
    assert any(
        (sig_a >> lo) & ((1 << w) - 1) == (sig_b >> lo) & ((1 << w) - 1)
        for lo, w in segs
    )


def _winnow_py(tokens: list[str], k: int, w: int) -> set[int]:
    """Reference (pure-python) winnowing mirror of
    functions.text.winnow_fingerprints: hash k-grams, min per w-window."""
    import hashlib

    def h(s: str) -> int:
        return int(hashlib.md5((s + "#31").encode()).hexdigest()[:15], 16)

    grams = [" ".join(tokens[i:i + k])
             for i in range(max(len(tokens) - k, 0) + 1)]
    grams = [g for g in grams if g]
    hs = [h(g) for g in grams]
    return {min(hs[i:i + w]) for i in range(len(hs))}


@given(
    prefix_a=st.lists(st.sampled_from("abcdefg"), max_size=6),
    prefix_b=st.lists(st.sampled_from("hijklmn"), max_size=6),
    shared=st.lists(st.sampled_from("opqrstu"), min_size=8, max_size=15),
)
@settings(max_examples=100)
def test_winnowing_guarantee(prefix_a, prefix_b, shared):
    """Two token streams sharing a run of ≥ k+w-1 tokens share at least
    one winnowed fingerprint (k=5, w=4 ⇒ run of 8)."""
    a = _winnow_py(prefix_a + shared, k=5, w=4)
    b = _winnow_py(prefix_b + shared, k=5, w=4)
    assert a & b


def test_winnow_python_mirror_matches_spark(spark):
    """The pure-python winnowing used in the property test equals the
    Spark operator on a concrete document set."""
    from parquet_producers_spark.functions.text import winnow_fingerprints

    rows = [
        (0, "the quick brown fox jumps over the lazy dog again today"),
        (1, "a b c d e f g h i j k l m"),
        (2, "the quick brown fox jumps over the lazy dog differently"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df, k=5, w=4).collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
    want = {i: _winnow_py(t.split(" "), 5, 4) for i, t in rows}
    assert got == want
    assert got[0] & got[2]  # shared 8-token prefix run ⇒ shared fp
