"""Deterministic, leakage-safe dataset splits — the last step of a
training-data pipeline: assign every document to train/val/test as a
pure function of a KEY, so (a) assignments are reproducible across
runs/clusters with no RNG state, and (b) keying by the near-dup
COMPONENT id (from :func:`..functions.dedup.connected_components`)
puts a whole duplicate cluster into ONE split — near-dups of training
documents can never leak into eval.

Pure column expressions over the portable 60-bit hash (md5-derived,
bit-identical in Spark and DuckDB), so the assignment is fully
oracle-verifiable and free of Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .text import portable_hash64, portable_hash64_sql

# hash buckets for fraction arithmetic: integer thresholds, no float
# comparisons that could straddle an engine-rounding boundary
SPLIT_BUCKETS = 1_000_000


def _thresholds(fractions: dict[str, float]) -> list[tuple[str, int]]:
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1: {fractions}")
    out, acc = [], 0.0
    for name, frac in fractions.items():  # caller-supplied order
        acc += frac
        out.append((name, int(round(acc * SPLIT_BUCKETS))))
    out[-1] = (out[-1][0], SPLIT_BUCKETS)  # close rounding gaps exactly
    return out


def split_expr(key: Column, fractions: dict[str, float],
               seed: int = 11) -> Column:
    """'train'/'val'/… as a pure function of ``key``."""
    bucket = F.pmod(portable_hash64(key.cast("string"), seed),
                    F.lit(SPLIT_BUCKETS))
    ths = _thresholds(fractions)
    expr = F.when(bucket < ths[0][1], F.lit(ths[0][0]))
    for name, hi in ths[1:]:
        expr = expr.when(bucket < hi, F.lit(name))
    return expr


def split_sql(key_expr: str, fractions: dict[str, float],
              seed: int = 11) -> str:
    """The DuckDB re-derivation of :func:`split_expr` (same md5
    arithmetic, same integer thresholds)."""
    h = portable_hash64_sql(f"CAST({key_expr} AS VARCHAR)", seed)
    bucket = f"(({h}) % {SPLIT_BUCKETS})"
    ths = _thresholds(fractions)
    cases = " ".join(
        f"WHEN {bucket} < {hi} THEN '{name}'" for name, hi in ths
    )
    return f"CASE {cases} END"


def assign_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float] | None = None,
    seed: int = 11,
    out_col: str = "split",
) -> DataFrame:
    """Add a split column keyed on ``key_col``.

    Pass the near-dup ``component_id`` as the key (join the output of
    ``connected_components`` first) for leakage-safe splits: every row
    of a component shares the key, hence the split. At 100 TB this is
    one projection — no shuffle, no RNG, rerunnable anywhere with the
    same answer.
    """
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    return df.withColumn(out_col, split_expr(F.col(key_col), fractions,
                                             seed))


def sequence_pack(
    df: DataFrame, budget: int, n_shards: int = 8,
    text_col: str = "text", lang_col: str = "lang",
) -> DataFrame:
    """Token-budget sequence packing — assign each doc a (pack bin,
    offset) so a trainer can assemble fixed-size sequences without a
    second pass. Streaming first-fit in deterministic doc order: a
    doc starts at the running token offset of its (lang, shard)
    stream; its bin is ``offset // budget``. Docs longer than the
    budget occupy their own bin(s), like any packer must.

    Scale shape: the only window runs PER (lang, shard) — shard is a
    portable ``doc_id % n_shards``, so no corpus-wide single-partition
    window (the classic sequence-packing scale trap); shards pack
    independently on every executor.
    """
    toks = F.size(F.split(F.col(text_col), " ")).cast("bigint")
    shard = (F.col("doc_id") % n_shards).cast("int")
    # partition by the ALIASED names: the window resolves against the
    # select below, where lang_col is already renamed to "lang"
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.select(
        "doc_id", F.col(lang_col).alias("lang"), shard.alias("shard"),
        toks.alias("n_tokens"),
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens"))
    # SQL `div` keeps exact bigint semantics; `/` is double division and
    # loses integer precision past 2**53 — a reachable cumulative token
    # offset for one (lang, shard) stream at corpus scale
    return out.select(
        "doc_id", "lang", "shard", "n_tokens", start.alias("_start"),
    ).select(
        "doc_id", "lang", "shard", "n_tokens",
        F.expr(f"_start div {int(budget)}").alias("bin_id"),
        (F.col("_start") % budget).cast("bigint").alias("bin_offset"),
    )


def stratified_sample(
    df: DataFrame, rates: dict[str, float], key_col: str = "doc_id",
    lang_col: str = "lang", default_rate: float = 1.0, seed: int = 23,
) -> DataFrame:
    """Deterministic per-language downsampling — rebalance a corpus
    whose language mix is skewed (the usual case: one dominant
    language) by keeping each doc iff its portable hash falls under
    its language's rate. Pure column expression: reproducible across
    runs and engines, no RNG state, no shuffle (the filter rides the
    scan), and the SAME doc survives at any parallelism.
    """
    bucket = F.pmod(portable_hash64(F.col(key_col).cast("string"), seed),
                    F.lit(SPLIT_BUCKETS))
    rate = F.lit(int(round(default_rate * SPLIT_BUCKETS)))
    for lang, r in sorted(rates.items()):
        rate = F.when(F.col(lang_col) == lang,
                      F.lit(int(round(r * SPLIT_BUCKETS)))).otherwise(rate)
    return df.filter(bucket < rate)


def stratified_sample_sql(rates: dict[str, float], key_expr: str = "doc_id",
                          lang_expr: str = "lang",
                          default_rate: float = 1.0, seed: int = 23) -> str:
    """WHERE-clause mirror of :func:`stratified_sample` for the oracle."""
    cases = " ".join(
        "WHEN {} = '{}' THEN {}".format(
            lang_expr, lang.replace("'", "''"),
            int(round(r * SPLIT_BUCKETS)))
        for lang, r in sorted(rates.items()))
    h = portable_hash64_sql(f"CAST({key_expr} AS VARCHAR)", seed)
    return (f"({h} % {SPLIT_BUCKETS} + {SPLIT_BUCKETS}) % {SPLIT_BUCKETS}"
            f" < CASE {cases} ELSE {int(round(default_rate * SPLIT_BUCKETS))} END")
