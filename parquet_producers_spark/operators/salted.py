"""Salted two-stage aggregation — the reference's documented skew idiom
(op 26, reference README.md:32-43: compound key ``(k, R)`` with a random
factor + associative re-aggregation), engine-side and deterministic.

At 100 TB a hot key (mega-repo, viral document) overloads one reducer;
stage 1 aggregates on ``(key, salt)`` so the hot key fans across
``n_salts`` reducers, stage 2 re-aggregates the partials on ``key``.
The salt is a deterministic hash of a spread column (not random — reruns
must be bit-identical, SURVEY.md §7.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    spread_col: str,
    partial_aggs: list[Column],
    final_aggs: list[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``partial_aggs`` aggregate raw rows per ``(key, salt)``;
    ``final_aggs`` must re-aggregate the partials per ``key``
    (sum of counts, sum of sums, max of maxes, ...).
    """
    salt = F.pmod(F.hash(F.col(spread_col)), F.lit(n_salts)).alias("__salt")
    partial = df.groupBy(*key_cols, salt).agg(*partial_aggs)
    return partial.groupBy(*key_cols).agg(*final_aggs)
