"""Leakage-safe deterministic splits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet_producers_spark.functions.splits import (
    _thresholds,
    assign_split,
)


def test_fractions_must_sum_to_one():
    with pytest.raises(ValueError):
        _thresholds({"train": 0.5, "val": 0.1})


def test_split_is_deterministic_and_proportional(spark):
    keys = spark.range(20000).withColumnRenamed("id", "k")
    a = assign_split(keys, "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in
              a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 20000 - 0.8) < 0.02
    assert abs(counts["val"] / 20000 - 0.1) < 0.01
    # pure function of the key: re-assignment is identical
    b = assign_split(keys, "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert a.exceptAll(b).count() == 0


def test_split_by_component_has_no_leakage(spark, sf_dir):
    """Keyed on the near-dup component id, a whole duplicate cluster
    must land in exactly one split — no component straddles splits."""
    from parquet_producers_spark.functions.dedup import (
        connected_components,
        simhash,
        simhash_near_pairs,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .filter(F.col("doc_id") < 300)
    sig = simhash(d, "text", bits=16)
    comp = connected_components(
        simhash_near_pairs(sig, max_hamming=0, bits=16),
        vertices=d.select("doc_id"))
    assigned = assign_split(d.join(comp, "doc_id"), "component_id")
    spans = (
        assigned.groupBy("component_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert spans == 0
    # and multi-doc components exist, so the property is non-vacuous
    multi = (assigned.groupBy("component_id").count()
             .filter(F.col("count") > 1).count())
    assert multi > 0


def test_stratified_sample_rates_and_determinism(spark):
    from parquet_producers_spark.functions.splits import stratified_sample

    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "fr") for i in range(4000)],
        "doc_id long, lang string")
    kept = stratified_sample(df, {"en": 0.25}, default_rate=1.0)
    counts = {r["lang"]: r["n"] for r in
              kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["fr"] == 2000                      # default rate 1.0
    assert abs(counts["en"] / 2000 - 0.25) < 0.05    # ~rate, hash-exact set
    # deterministic: same ids at any parallelism
    a = sorted(r["doc_id"] for r in kept.collect())
    b = sorted(r["doc_id"] for r in
               stratified_sample(df.repartition(13), {"en": 0.25}).collect())
    assert a == b
