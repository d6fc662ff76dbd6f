"""Deterministic synthetic source-code corpus (north_rule input table).

Generates the ``(repo, path, commit, lang, content)`` table described by
BASELINE.json's ``input_hint`` / FIXTURES.md §1:

* zipf-skewed rows-per-repo (mega-repo skew → salting target),
* a sprinkling of giant files (content length skew),
* code-like content built from per-language line banks (shared
  substructure → realistic dict/RLE/FSST behavior),
* fully deterministic per row id — independent of partitioning — via a
  vectorized splitmix64 counter RNG, so any two runs (or a resume)
  produce identical bytes.

The Spark path generates distributed via ``spark.range(n).mapInPandas``;
the pandas path is reused by unit tests without a session.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa

SCHEMA_HINT = "repo string, path string, commit string, lang string, content string"

LANGS = ["python", "java", "go", "rust", "cpp", "js", "ruby", "scala"]

_LINE_TEMPLATES = {
    "python": [
        "import numpy as np", "import os", "def {f}({a}, {b}):",
        "    return {a} + {b}", "    for i in range(len({a})):",
        "        {b}[i] = {a}[i] * 2", "class {F}:", "    def __init__(self):",
        "        self.{a} = None", "if __name__ == '__main__':", "    main()",
        "# TODO: fix {f} handling", "{a} = {f}({b})", "print({a})",
        "    raise ValueError(f'bad {a}: {{{a}}}')", "from typing import Any",
    ],
    "java": [
        "public class {F} {{", "    private final int {a};",
        "    public int get{F}() {{ return {a}; }}", "}}",
        "import java.util.List;", "    // {f} implementation",
        "    public static void main(String[] args) {{",
        "        System.out.println({a});", "    for (int i = 0; i < {a}; i++) {{",
    ],
    "go": [
        "package {f}", "import \"fmt\"", "func {F}({a} int) int {{",
        "    return {a} * 2", "}}", "    if err != nil {{",
        "        return fmt.Errorf(\"{f}: %w\", err)", "    }}",
        "var {a} = make([]int, 0, 16)", "type {F} struct {{",
    ],
}
for _l in LANGS:
    _LINE_TEMPLATES.setdefault(_l, _LINE_TEMPLATES["python"])

_IDENTS = ["count", "buf", "idx", "total", "value", "result", "node", "key",
           "data", "row", "offset", "batch", "chunk", "cursor", "state", "acc"]
_FUNCS = ["process", "encode", "decode", "merge", "scan", "flush", "read",
          "write", "update", "resolve", "apply", "build"]

_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64: uint64 counter → uint64 hash."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * _M1
    z = (z ^ (z >> np.uint64(27))) * _M2
    return z ^ (z >> np.uint64(31))


def _u01(x: np.ndarray, salt: int) -> np.ndarray:
    return _splitmix64(x + np.uint64(salt * 0x9E3779B9)).astype(np.float64) / 2**64


def _line_bank(lang: str, seed: int, size: int = 256) -> np.ndarray:
    """Deterministic bank of code-like lines for one language."""
    import zlib

    # crc32, NOT builtin hash(): the builtin is randomized per process
    # via PYTHONHASHSEED, which would make driver-side generation
    # non-reproducible (Spark workers only agree because PySpark pins
    # PYTHONHASHSEED=0)
    rng = np.random.default_rng(seed + zlib.crc32(lang.encode()) % 65536)
    tmpl = _LINE_TEMPLATES[lang]
    lines = []
    for i in range(size):
        t = tmpl[int(rng.integers(len(tmpl)))]
        lines.append(t.format(
            f=_FUNCS[int(rng.integers(len(_FUNCS)))] + str(int(rng.integers(40))),
            F="C" + _FUNCS[int(rng.integers(len(_FUNCS)))].title() + str(int(rng.integers(30))),
            a=_IDENTS[int(rng.integers(len(_IDENTS)))] + str(int(rng.integers(50))),
            b=_IDENTS[int(rng.integers(len(_IDENTS)))],
        ))
    return np.array(lines, dtype=object)


_BANKS: dict[tuple[str, int], tuple[np.ndarray, np.ndarray, np.ndarray]] = {}


def _bank_arrays(lang: str, seed: int):
    """Line bank as (flat utf8 bytes, starts, lens) for vectorized joins."""
    key = (lang, seed)
    if key not in _BANKS:
        lines = [ln.encode() + b"\n" for ln in _line_bank(lang, seed)]
        lens = np.array([len(b) for b in lines], dtype=np.int64)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        _BANKS[key] = (np.frombuffer(b"".join(lines), dtype=np.uint8), starts, lens)
    return _BANKS[key]


def generate_batch(ids: np.ndarray, n_files: int, seed: int = 42) -> pd.DataFrame:
    """Generate rows for the given global row ids (deterministic)."""
    ids = ids.astype(np.uint64)
    n = len(ids)
    n_repos = max(int(n_files ** 0.55), 4)
    # zipf-ish: u^3 concentrates mass on low repo ids → mega-repo skew
    repo_id = (n_repos * _u01(ids, 1) ** 3).astype(np.int64)
    lang_id = np.where(
        _u01(ids, 2) < 0.9, repo_id % len(LANGS),
        (_splitmix64(ids + np.uint64(3)) % np.uint64(len(LANGS))).astype(np.int64),
    )
    commit_id = (_splitmix64(ids + np.uint64(4)) % np.uint64(32)).astype(np.int64)

    # line counts: lognormal-ish body, ~1/1000 giant files (100×)
    base = (8 + 120 * _u01(ids, 5) ** 2).astype(np.int64)
    giant = _splitmix64(ids + np.uint64(6)) % np.uint64(997) == 0
    n_lines = np.where(giant, base * 100, base)

    # vectorized content: sample line-bank indices per row, join via arrow
    contents = np.empty(n, dtype=object)
    for li, lang in enumerate(LANGS):
        sel = np.flatnonzero(lang_id == li)
        if len(sel) == 0:
            continue
        flat, starts, lens = _bank_arrays(lang, seed)
        counts = n_lines[sel]
        total = int(counts.sum())
        row_of = np.repeat(np.arange(len(sel)), counts)
        slot = np.arange(total) - np.repeat(
            np.concatenate(([0], np.cumsum(counts)[:-1])), counts
        )
        line_idx = (
            _splitmix64(ids[sel][row_of] * np.uint64(1315423911) + slot.astype(np.uint64))
            % np.uint64(len(lens))
        ).astype(np.int64)
        # gather variable-length lines into one buffer
        ll = lens[line_idx]
        out_total = int(ll.sum())
        cum = np.concatenate(([0], np.cumsum(ll)[:-1]))
        gather = np.repeat(starts[line_idx] - cum, ll) + np.arange(out_total)
        buf = flat[gather]
        line_bytes_per_row = np.add.reduceat(ll, np.concatenate(
            ([0], np.cumsum(counts)[:-1]))) if len(counts) else np.empty(0, np.int64)
        offs = np.concatenate(([0], np.cumsum(line_bytes_per_row))).astype(np.int64)
        arr = pa.Array.from_buffers(
            pa.large_string(), len(sel),
            [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(buf.tobytes())],
        )
        contents[sel] = arr.to_pandas().to_numpy()

    d1 = _splitmix64(ids + np.uint64(7)) % np.uint64(12)
    d2 = _splitmix64(ids + np.uint64(8)) % np.uint64(24)
    ext = np.array(["py", "java", "go", "rs", "cc", "js", "rb", "scala"])[lang_id]
    df = pd.DataFrame({
        "repo": pd.Series(repo_id).map(lambda r: f"org{r % 97:02d}/repo{r:05d}"),
        "path": [
            f"src/mod{a:02d}/pkg{b:02d}/file_{i}.{e}"
            for a, b, i, e in zip(d1, d2, ids, ext)
        ],
        "commit": pd.Series(
            (_splitmix64((repo_id.astype(np.uint64) << np.uint64(8))
                         + commit_id.astype(np.uint64))).astype("uint64")
        ).map(lambda h: f"{h:016x}{h ^ 0xabcdef:016x}"[:40]),
        "lang": np.array(LANGS, dtype=object)[lang_id],
        "content": contents,
    })
    return df


def source_code_df(spark, n_files: int, seed: int = 42, partitions: int | None = None):
    """Distributed deterministic generation of the source-code table."""
    partitions = partitions or max(8, n_files // 20_000)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield generate_batch(pdf["id"].to_numpy(), n_files, seed)

    return (
        spark.range(0, n_files, 1, partitions)
        .mapInPandas(gen, schema=SCHEMA_HINT)
    )
