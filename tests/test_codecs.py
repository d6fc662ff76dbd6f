"""Codec round-trip tests: encode→decode must be bit-identical.

Mirrors the reference's golden-output discipline (SURVEY.md §5 — strict
equality on actual Parquet bytes) at the codec granularity.
"""

from __future__ import annotations

import hashlib
import random

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_producers_spark.codecs import (
    CODECS,
    choose_codec,
    column_stats,
    decode_array,
    encode_array,
)
from parquet_producers_spark.codecs import bitio


def roundtrip(arr: pa.Array, codec: str, cascade: bool = False) -> pa.Array:
    blob, params = encode_array(arr, codec, cascade=cascade)
    out = decode_array(blob, params)
    assert len(out) == len(arr)
    return out


def assert_identical(a: pa.Array, b: pa.Array):
    assert a.cast(b.type).equals(b) or b.cast(a.type).equals(a), f"{a} != {b}"


# ---------------------------------------------------------------- bitio


@given(st.lists(st.integers(min_value=0, max_value=2**40 - 1), max_size=500))
@settings(max_examples=50, deadline=None)
def test_pack_uints_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    w = max(1, int(arr.max()).bit_length()) if len(arr) else 1
    out = bitio.unpack_uints(bitio.pack_uints(arr, w), w, len(arr))
    assert np.array_equal(out, arr)


@given(st.lists(st.integers(min_value=-(2**50), max_value=2**50), max_size=300))
@settings(max_examples=50, deadline=None)
def test_zigzag_roundtrip(vals):
    arr = np.array(vals, dtype=np.int64)
    assert np.array_equal(bitio.zigzag_decode(bitio.zigzag_encode(arr)), arr)


# ------------------------------------------------------------- integers


INT_CODECS = ["plain", "for", "delta"]


@pytest.mark.parametrize("codec", INT_CODECS + ["rle", "dict"])
def test_int_roundtrip(codec):
    rng = np.random.default_rng(42)
    arr = pa.array(np.sort(rng.integers(-1000, 10000, size=5000)), type=pa.int64())
    assert_identical(roundtrip(arr, codec), arr)


def test_bitpack_roundtrip_and_rejects_negative():
    arr = pa.array(np.arange(1000, dtype=np.int32))
    assert_identical(roundtrip(arr, "bitpack"), arr)
    with pytest.raises(ValueError):
        encode_array(pa.array([-1, 2], type=pa.int64()), "bitpack")


@given(st.lists(st.integers(min_value=-(2**31), max_value=2**31), max_size=400))
@settings(max_examples=30, deadline=None)
def test_int_codecs_property(vals):
    arr = pa.array(vals, type=pa.int64())
    for codec in INT_CODECS:
        assert_identical(roundtrip(arr, codec), arr)


def test_delta_monotone_is_tiny():
    arr = pa.array(np.arange(100_000, dtype=np.int64) * 7 + 3)
    blob, _ = encode_array(arr, "delta")
    assert len(blob) < 100_000  # ~1 byte for 8-byte values


def test_nulls_roundtrip():
    arr = pa.array([1, None, 3, None, 5], type=pa.int64())
    out = roundtrip(arr, "for")
    assert out.to_pylist() == [1, None, 3, None, 5]
    sarr = pa.array(["a", None, "a", "b", None])
    out = roundtrip(sarr, "dict")
    assert out.to_pylist() == ["a", None, "a", "b", None]


# --------------------------------------------------------------- strings


def _fake_code(rng: random.Random, n: int) -> list[str]:
    kws = ["def ", "return ", "import ", "for i in range(", "self.", "():\n",
           "    ", "= np.", "spark.read", "#", "x", "y", "data", "]\n"]
    return ["".join(rng.choice(kws) for _ in range(rng.randint(3, 60))) for _ in range(n)]


@pytest.mark.parametrize("codec", ["plain", "dict", "rle", "fsst"])
def test_string_roundtrip(codec):
    rng = random.Random(7)
    vals = sorted(_fake_code(rng, 2000))  # sorted → runs exist
    arr = pa.array(vals, type=pa.string())
    assert_identical(roundtrip(arr, codec), arr)


def test_fsst_compresses_code():
    rng = random.Random(11)
    arr = pa.array(_fake_code(rng, 3000), type=pa.string())
    blob, params = encode_array(arr, "fsst")
    assert params["syms"] > 0
    assert len(blob) < arr.nbytes * 0.75, (len(blob), arr.nbytes)
    out = decode_array(blob, params)
    assert_identical(out, arr)
    # per-row sha256 equality — the north_rule invariant
    for orig, dec in zip(arr.to_pylist(), out.to_pylist()):
        assert hashlib.sha256(orig.encode()).digest() == hashlib.sha256(dec.encode()).digest()


def test_fsst_edge_cases():
    for vals in ([], [""], ["", "", ""], ["a"], ["ab" * 4000], ["x", "", "yy", ""],
                 ["日本語のテキスト" * 10, "ascii", ""]):
        arr = pa.array(vals, type=pa.string())
        assert_identical(roundtrip(arr, "fsst"), arr)


@given(st.lists(st.text(max_size=80), max_size=200))
@settings(max_examples=40, deadline=None)
def test_fsst_property(vals):
    arr = pa.array(vals, type=pa.string())
    assert_identical(roundtrip(arr, "fsst"), arr)


@given(st.lists(st.text(alphabet="abc \n", max_size=40), max_size=300))
@settings(max_examples=40, deadline=None)
def test_string_codecs_property(vals):
    arr = pa.array(vals, type=pa.string())
    for codec in ["dict", "rle", "plain"]:
        assert_identical(roundtrip(arr, codec), arr)


def test_cascade_shrinks_or_noop():
    rng = random.Random(3)
    arr = pa.array(_fake_code(rng, 1000))
    plain_blob, _ = encode_array(arr, "plain")
    casc_blob, params = encode_array(arr, "plain", cascade=True)
    assert len(casc_blob) <= len(plain_blob)
    assert_identical(decode_array(casc_blob, params), arr)


# ------------------------------------------------------------- selection


def test_stats_and_selection_rules():
    sorted_ints = pa.array(np.arange(10_000, dtype=np.int64))
    st_ = column_stats(sorted_ints)
    assert st_.monotone_frac == 1.0
    assert choose_codec(sorted_ints).codec == "delta"

    low_card = pa.array(["py", "rs", "go"] * 5000)
    ch = choose_codec(low_card)
    assert ch.codec in ("dict", "rle")

    sorted_keys = pa.array(sorted(["repo%03d" % (i % 20) for i in range(8000)]))
    assert choose_codec(sorted_keys).codec in ("rle", "dict")

    rng = random.Random(5)
    text = pa.array(_fake_code(rng, 4000))
    assert choose_codec(text).codec in ("fsst", "linedict")

    # flat text (no line repeats, unique rows): linedict degenerates to
    # whole-value dictionary whose dictionary is itself fsst'd, so the
    # winner is one of the two fsst-backed codecs — and the slow-codec
    # gate must have opened (fsst measured in the sample sizes)
    flat = pa.array([
        "".join(rng.choice(["ab", "cd", "ef", "gh", str(i)]) for _ in range(60))
        for i in range(3000)
    ])
    ch = choose_codec(flat)
    assert ch.codec in ("fsst", "linedict")
    assert "fsst" in ch.sample_sizes or ch.codec == "linedict"


def test_every_registered_codec_has_decode():
    assert set(CODECS) >= {"plain", "dict", "rle", "bitpack", "for", "delta", "fsst"}


# -------------------------------------------------------------- linedict


@pytest.mark.parametrize("vals", [
    [],
    [""],
    ["no newline at all"],
    ["a\nb\nc", "a\nb\nc", "x"],
    ["line1\n" * 50 + "tail", "", "\n", "\n\n\n"],
    ["import os\nimport sys\n" * 20, "def f():\n    return 1\n"],
])
def test_linedict_edge_cases(vals):
    arr = pa.array(vals, type=pa.string())
    assert_identical(roundtrip(arr, "linedict"), arr)


@given(st.lists(st.text(alphabet="ab\n ", max_size=60), max_size=150))
@settings(max_examples=40, deadline=None)
def test_linedict_property(vals):
    arr = pa.array(vals, type=pa.string())
    assert_identical(roundtrip(arr, "linedict"), arr)


def test_linedict_wins_on_code():
    from parquet_producers_spark.datagen import generate_batch

    df = generate_batch(np.arange(2000), 100_000, 42)
    arr = pa.array(df.content.tolist())
    blob, params = encode_array(arr, "linedict")
    assert len(blob) < arr.nbytes / 8  # >8x on line-repetitive code
    assert params["values"]["codec"] == "fsst"  # dictionary fsst-compressed
    from parquet_producers_spark.codecs import choose_codec

    assert choose_codec(arr).codec == "linedict"


def test_all_null_chunk_roundtrip():
    """An all-null column chunk (e.g. a run of null sort keys) must
    round-trip: the validity re-expansion can't take from the empty
    values array."""
    import json

    import pyarrow as pa

    from parquet_producers_spark.encoder import (
        column_stats,
        decode_array,
        encode_auto,
    )

    for typ in (pa.string(), pa.int64(), pa.float64(), pa.bool_()):
        arr = pa.array([None] * 200, typ)
        for profile in ("fast", "size"):
            for cascade in (False, True):
                _, blob, params = encode_auto(
                    arr, column_stats(arr), cascade=cascade, profile=profile)
                params["atype"] = str(arr.type)
                out = decode_array(blob, json.loads(json.dumps(params)))
                assert (len(out) == 200 and out.null_count == 200
                        and out.type == typ)
