"""Custom join operators Spark lacks natively: as-of join and binned
range join (task mandate: compose from existing DataFrame ops where
semantics allow — both do).

As-of join — "for each left row, the latest right row at or before its
timestamp, per key" — is the union + ordered-window trick: tag both
sides, union, and carry the last right-side values forward over an
event-time window partitioned by key. One shuffle, no Python, no
row explosion (contrast a naive t_l >= t_r join which is quadratic
per key).

Range join — left value in [lo, hi) of a right interval table — joins
on overlapping fixed-width *bins* first (equi-join the optimizer can
hash/broadcast) and filters exactly afterwards. Candidate fan-out is
bounded by interval_width/bin_width instead of |right| per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row: the right row with the greatest
    ``right_ts <= left_ts`` sharing ``on`` keys (nulls when none)."""
    lcols = left.columns
    tagged_r = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.lit(1).alias("__is_right"),
        *[F.col(c).alias(c + suffix) for c in value_cols],
    )
    tagged_l = left.select(
        "*",
        F.col(left_ts).alias("__t"),
        F.lit(0).alias("__is_right"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(c + suffix)
          for c in value_cols],
    )
    unioned = tagged_l.unionByName(tagged_r, allowMissingColumns=True)
    # right rows sort before left rows at the same instant (<= semantics)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t"), F.desc("__is_right"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "*",
        *[F.last(F.col(c + suffix), ignorenulls=True).over(w)
          .alias(c + "__filled") for c in value_cols],
    )
    out = filled.filter(F.col("__is_right") == 0).select(
        *lcols,
        *[F.col(c + "__filled").alias(c + suffix) for c in value_cols],
    )
    return out


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_lo: str,
    right_hi: str,
    bin_width: float,
) -> DataFrame:
    """Inner join on ``right_lo <= left_val < right_hi`` via bin
    equi-join + exact filter. Right intervals are exploded into the
    bins they overlap (sequence), so the join key is a plain long —
    broadcastable when right is small, shuffle-hash otherwise.

    The explode is clamped to the bins the LEFT side actually occupies
    (one tiny min/max aggregate broadcast onto the right): an open-ended
    interval like [200k, 1e12) would otherwise materialize a
    (hi-lo)/bin_width-element array — ~20M longs for that band — in a
    single row. Bins outside the left's range can't match anything, so
    clamping changes no results."""
    lb = left.withColumn(
        "__bin", F.floor(F.col(left_val) / F.lit(bin_width)).cast("long"))
    lrange = lb.agg(F.min("__bin").alias("__lmin"),
                    F.max("__bin").alias("__lmax"))
    start = F.greatest(
        F.floor(F.col(right_lo) / F.lit(bin_width)).cast("long"),
        F.col("__lmin"))
    stop = F.least(
        F.floor((F.col(right_hi) - F.lit(1e-9)) / F.lit(bin_width)
                ).cast("long"),
        F.col("__lmax"))
    rb = (
        right.join(F.broadcast(lrange))
        .withColumn(
            "__bins",
            # the null check is load-bearing: on an EMPTY left side
            # __lmin/__lmax are null and greatest/least skip nulls, so
            # without it the clamp silently reverts to the unclamped
            # explode — the ~20M-element-array hazard this clamp exists
            # to prevent (the join result is empty either way)
            F.when(F.col("__lmin").isNotNull() & (start <= stop),
                   F.sequence(start, stop))
            .otherwise(F.array().cast("array<long>")),
        )
        .withColumn("__bin", F.explode("__bins"))
        .drop("__bins", "__lmin", "__lmax")
    )
    return (
        lb.join(rb, "__bin")
        .filter((F.col(left_val) >= F.col(right_lo))
                & (F.col(left_val) < F.col(right_hi)))
        .drop("__bin")
    )
