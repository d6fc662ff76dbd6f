"""Sorted key–value producer stages: grouped flat-map + incremental
reconcile + CDC — the reference's core semantics, re-expressed as
DataFrame joins/unions/windows + one ``applyInPandas`` per stage.

Reference behavior being reproduced (see SURVEY.md §2.1 ops 6, 11-20):

* ``Produce`` — a grouped flat-map ``(SK, [SV]) → [(TK, TV)]``
  (reference: Parquet.Producers/ParquetProduction.cs:10-11). Here:
  ``updates.groupBy(sk).applyInPandas(produce)``.
* A stage owns three tables (reference: Producer.cs:58-60):
  **content** ``(tk…, sk…, value…)``, **mappings** ``(sk…, tk…)``,
  **updates-out** ``(type, tk…, value…)``.
* Incremental update semantics (reference:
  ParquetProduction.cs:279-374 instruction generation, :376-453
  mapping reconcile, :463-704 content reconcile + CDC emission,
  PendingDeleteState.cs:6-97 delete suppression), restated set-wise:

  - every updated SK deletes all its previous ``(sk, tk)`` pairs
    (discovered via the update×mappings join);
  - new content = prev content minus touched ``(tk, sk)`` pairs,
    plus produced rows;
  - CDC out: produced rows → ``Add`` iff the TK had no prior row
    (first produced row only; the rest ``Update``); retained rows of a
    touched TK are re-emitted as ``Update`` (consumers always see the
    full value set of a touched key — reference README.md:211-214);
    ``Delete(tk)`` iff a deletion touched the TK and no row survives.

This module is NOT a port: the reference's cursor machinery
(Cursor.cs, SingleUseSequence.cs, MergeSorter.cs) has no counterpart
here — Spark's shuffle sort and joins replace it wholesale.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

UPDATE_TYPE = "type"  # 'Add' | 'Update' | 'Delete'


@dataclass
class Stage:
    """One producer stage: SK→TK grouped flat-map with incremental state."""

    name: str
    sk_cols: list[str]
    tk_cols: list[str]
    value_cols: list[str]
    # produce(key: tuple, values: pd.DataFrame) -> pd.DataFrame[tk+value]
    produce: Callable[[tuple, pd.DataFrame], pd.DataFrame]
    out_ddl: str  # spark DDL for tk_cols + value_cols, e.g. "word string, id int"
    preserve_col: Optional[str] = None  # surrogate-id column kept stable per TK
    # general PreserveKeyValues hook (reference
    # ParquetProducerOptions.cs:16-28 passes the whole previous value to
    # an arbitrary user action). Two DataFrame-native forms:
    # * preserve_cols — produced rows of an EXISTING TK inherit these
    #   value columns from that TK's example previous row (min-SK row);
    #   novel TKs keep what produce emitted. Pure column ops, no Python.
    # * preserve_merge — arbitrary logic: pandas callable receiving the
    #   produced batch plus `__prev_<col>` example columns (null for
    #   novel TKs), returning the final value columns. Arrow-batched.
    preserve_cols: list[str] = field(default_factory=list)
    preserve_merge: Optional[Callable[[pd.DataFrame], pd.DataFrame]] = None
    sources: list["Stage"] = field(default_factory=list)
    # persisted content sort order (reference Comparers.By/Reverse,
    # Util/Comparers.cs:11-28 — e.g. the wordcount scenario stores
    # content ordered by count DESCENDING, ParquetProductionTests.cs:317).
    # Entries are (column, "asc"|"desc"); None → tk+sk ascending.
    content_sort: Optional[list[tuple[str, str]]] = None

    @property
    def content_cols(self) -> list[str]:
        return self.tk_cols + self.sk_cols + self.value_cols

    @property
    def has_preserve(self) -> bool:
        return bool(self.preserve_col or self.preserve_cols
                    or self.preserve_merge)


def _empty(spark: SparkSession, ddl: str) -> DataFrame:
    return spark.createDataFrame([], schema=ddl)


def empty_state(spark: SparkSession, stage: Stage, updates: DataFrame):
    """(content, mappings) empty frames typed from the updates schema +
    the stage's output DDL (parsed by Spark — safe for decimal(p,s) and
    other comma-bearing types)."""
    from pyspark.sql.types import StructType

    out_fields = {
        f.name: f for f in _empty(spark, stage.out_ddl).schema.fields
    }
    sk_fields = {
        f.name: f for f in updates.schema.fields if f.name in stage.sk_cols
    }
    content = spark.createDataFrame([], StructType(
        [out_fields[c] for c in stage.tk_cols]
        + [sk_fields[c] for c in stage.sk_cols]
        + [out_fields[c] for c in stage.value_cols]
    ))
    mappings = spark.createDataFrame([], StructType(
        [sk_fields[c] for c in stage.sk_cols]
        + [out_fields[c] for c in stage.tk_cols]
    ))
    return content, mappings


class UpdateContractViolation(ValueError):
    pass


def validate_updates(updates: DataFrame, sk_cols: list[str]) -> None:
    """Input-contract validation (reference op 23,
    ParquetProduction.cs:326-337: per key either ONE Delete or ≥1
    upserts, never mixed, no duplicate deletes). The reference enforces
    sortedness too; Spark doesn't need sorted input, so the per-key
    discipline is the surviving contract. One aggregation, fails fast."""
    from pyspark.sql import functions as F

    bad = (
        updates.groupBy(*sk_cols)
        .agg(
            F.sum(F.when(F.col(UPDATE_TYPE) == "Delete", 1).otherwise(0)
                  ).alias("n_del"),
            F.sum(F.when(F.col(UPDATE_TYPE) != "Delete", 1).otherwise(0)
                  ).alias("n_up"),
        )
        .filter((F.col("n_del") > 1)
                | ((F.col("n_del") > 0) & (F.col("n_up") > 0)))
        .limit(5)
        .collect()
    )
    if bad:
        raise UpdateContractViolation(
            f"update stream violates one-delete-or-upserts per key: "
            f"{[tuple(r) for r in bad]}"
        )


def run_produce(stage: Stage, upserts: DataFrame,
                method: str = "sorted") -> DataFrame:
    """Grouped flat-map. Returns upsert instructions ``(tk…, sk…, value…)``.

    Two physical strategies, same semantics (produce always sees a
    key's full group):

    * ``sorted`` (default) — hash-repartition on SK, sort within
      partitions, then ONE ``mapInPandas`` per partition that walks the
      sorted batches and groups in pandas, carrying the tail key across
      Arrow batch boundaries. This is the Spark shape of the
      reference's bounded sorted-group cursor (op 7,
      SingleUseSequence.cs) and is ~10× faster than per-group UDF
      dispatch when keys are numerous and small (measured 13.2s → 1.2s
      on 5k-doc word split).
    * ``grouped`` — plain ``groupBy(sk).applyInPandas``; simplest,
      fine for few large groups.
    """
    sk_cols = stage.sk_cols
    out_cols = stage.tk_cols + stage.value_cols
    sk_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in upserts.schema.fields if f.name in sk_cols
    )
    schema = f"{stage.out_ddl}, {sk_ddl}"

    produce = stage.produce

    def finish(key: tuple, out: pd.DataFrame | None) -> pd.DataFrame | None:
        if out is None or len(out) == 0:
            return None
        out = out[out_cols].copy()
        for c, v in zip(sk_cols, key):
            out[c] = v
        return out

    if method == "grouped":
        def wrapped(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            out = finish(key, produce(key, pdf))
            if out is None:
                return pd.DataFrame(columns=out_cols + sk_cols)
            return out

        return (
            upserts.groupBy(*sk_cols)
            .applyInPandas(wrapped, schema=schema)
            .select(*stage.content_cols)
        )

    def emit(body: pd.DataFrame):
        import numpy as np

        # dropna=False: null source keys form a group like any other —
        # the 'grouped' (Spark groupBy) path keeps null keys, so the
        # sorted path must too or the two strategies silently diverge.
        #
        # The produce() calls themselves are the contract (one call per
        # key, the key's full group); everything AROUND them is
        # vectorized (guide §4.2): one concat over all produced frames
        # and np.repeat-materialized key columns, instead of the former
        # per-key copy + scalar column assign + per-key concat, which
        # measured 0.81 s vs 0.03 s per 1.5k-key partition — the
        # harness, not the user function, dominated the stage.
        keys, outs, lens = [], [], []
        for key, g in body.groupby(sk_cols, sort=False, dropna=False):
            key = key if isinstance(key, tuple) else (key,)
            out = produce(key, g)
            if out is None or len(out) == 0:
                continue
            keys.append(key)
            outs.append(out[out_cols])
            lens.append(len(out))
        if outs:
            big = pd.concat(outs, ignore_index=True)
            for ci, c in enumerate(sk_cols):
                big[c] = np.repeat([k[ci] for k in keys], lens)
            yield big

    def scan(batches):
        carry = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if len(pdf) == 0:
                continue
            # the tail key may continue in the next Arrow batch — carry
            # it (null-safe compare: NaN keys are one group here too)
            last = pdf[sk_cols].iloc[-1]
            tail = pd.concat(
                [(pdf[c] == last[c]) | (pdf[c].isna() & pd.isna(last[c]))
                 for c in sk_cols], axis=1,
            ).all(axis=1).to_numpy()
            carry = pdf[tail]
            body = pdf[~tail]
            if len(body):
                yield from emit(body)
        if carry is not None and len(carry):
            yield from emit(carry)

    n = int(upserts.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return (
        upserts.repartition(n, *sk_cols)
        .sortWithinPartitions(*sk_cols)
        .mapInPandas(scan, schema=schema)
        .select(*stage.content_cols)
    )


def update_stage(
    stage: Stage,
    prev_content: DataFrame,
    prev_mappings: DataFrame,
    updates: DataFrame,
    validate: bool = False,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """One incremental wave. Returns (content, mappings, updates_out).

    ``updates`` rows: (type, sk…, source-value…); per key either one
    Delete or ≥1 upserts carrying the key's full new value set
    (reference README.md:139-144). ``validate=True`` enforces that
    contract up front (op 23).
    """
    if validate:
        validate_updates(updates, stage.sk_cols)
    sk, tk = stage.sk_cols, stage.tk_cols
    pair_cols = tk + sk

    upd_keys = updates.select(*sk).distinct()
    upserts = updates.filter(F.col(UPDATE_TYPE) != "Delete")

    # Phase 1 — instructions (reference ParquetProduction.cs:279-374).
    # The produce UDF is the dominant cost of a wave and its result
    # feeds content AND mappings AND updates-out — three separate write
    # actions downstream (Pipeline.update). Spark does not reuse
    # exchanges across jobs, so without a checkpoint the UDF would
    # re-execute once per write (3-4× the wave cost at scale). Lazy
    # localCheckpoint: first materialization computes + stores, later
    # jobs reuse the stored blocks; blocks are freed when the frame is
    # GC'd after the wave.
    produced = run_produce(stage, upserts).localCheckpoint(eager=False)
    deletions = prev_mappings.join(upd_keys, sk, "inner").select(*sk, *tk)

    # Phase 2 — reconcile (reference :376-453 mappings, :463-704 content)
    touched_pairs = (
        deletions.select(*pair_cols)
        .unionByName(produced.select(*pair_cols))
        .distinct()
    )
    retained = prev_content.join(touched_pairs, pair_cols, "left_anti")

    produced_final = (
        # preserve adds windows/joins over prev_content on top of the
        # checkpointed produce — itself reused by content + CDC, so pin it
        _apply_preserve(stage, produced, prev_content)
        .localCheckpoint(eager=False)
        if stage.has_preserve else produced
    )
    # content feeds its own write AND the delete-suppression scan of the
    # updates-out write (survivor_tks below) — same reuse argument
    content = (
        retained.unionByName(produced_final.select(*stage.content_cols))
        .localCheckpoint(eager=False)
    )

    # one mapping row per produced row — duplicates intentional, matching
    # the reference (ParquetProductionTests.cs:224-229 asserts (1,1)×3)
    mappings = (
        prev_mappings.join(upd_keys, sk, "left_anti")
        .unionByName(produced.select(*sk, *tk))
    )

    # CDC derivation (reference :553-697 + PendingDeleteState.cs)
    tk_existed = prev_content.select(*tk).distinct()
    touched_tks = touched_pairs.select(*tk).distinct()

    first_w = Window.partitionBy(*tk).orderBy(*sk, *stage.value_cols)
    prod_events = (
        produced_final
        .join(tk_existed.withColumn("__existed", F.lit(1)), tk, "left")
        .withColumn("__rn", F.row_number().over(first_w))
        .withColumn(
            UPDATE_TYPE,
            F.when(F.col("__existed").isNull() & (F.col("__rn") == 1), "Add")
            .otherwise("Update"),
        )
        .select(UPDATE_TYPE, *tk, *stage.value_cols)
    )
    reemit_events = (
        retained.join(touched_tks, tk, "left_semi")
        .select(F.lit("Update").alias(UPDATE_TYPE), *tk, *stage.value_cols)
    )
    survivor_tks = content.select(*tk).distinct()
    delete_events = (
        deletions.select(*tk).distinct()
        .join(survivor_tks, tk, "left_anti")
        .select(
            F.lit("Delete").alias(UPDATE_TYPE), *tk,
            *[F.lit(None).cast(dict(zip(
                [f.name for f in content.schema.fields],
                [f.dataType for f in content.schema.fields]))[c]).alias(c)
              for c in stage.value_cols],
        )
    )
    updates_out = prod_events.unionByName(reemit_events).unionByName(delete_events)
    return content, mappings, updates_out


def bootstrap_stage(
    spark: SparkSession, stage: Stage, updates: DataFrame
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """First wave from empty state (reference 'bootstrapping'
    README.md:45-59) — fast path: with no previous state there are no
    deletions, nothing retained and no touched-pair anti-joins; content
    IS the produced set and every first-row-per-TK is an Add."""
    sk, tk = stage.sk_cols, stage.tk_cols
    upserts = updates.filter(F.col(UPDATE_TYPE) != "Delete")
    # content/mappings/updates-out are three downstream write actions
    # over this one frame — checkpoint so produce runs once (see
    # update_stage for the full argument)
    produced = run_produce(stage, upserts).localCheckpoint(eager=False)
    if stage.has_preserve:
        prev_content, _ = empty_state(spark, stage, updates)
        produced = _apply_preserve(stage, produced, prev_content)
    content = produced.select(*stage.content_cols)
    mappings = produced.select(*sk, *tk)
    first_w = Window.partitionBy(*tk).orderBy(*sk, *stage.value_cols)
    updates_out = (
        produced
        .withColumn("__rn", F.row_number().over(first_w))
        .withColumn(
            UPDATE_TYPE,
            F.when(F.col("__rn") == 1, "Add").otherwise("Update"),
        )
        .select(UPDATE_TYPE, *tk, *stage.value_cols)
    )
    return content, mappings, updates_out


def _global_rank(df: DataFrame, key_cols: list[str],
                 out_col: str) -> DataFrame:
    """1-based rank of each DISTINCT-keyed row by global key order,
    computed WITHOUT a single-partition window: range-partition on the
    keys (global order across partitions), count rows per partition,
    prefix-sum the counts on the driver (one tiny collect — #partitions
    rows, not data rows), then ``offset + row_number within partition``.
    Equivalent to ``dense_rank().over(Window.orderBy(keys))`` on
    distinct keys, but every exchange is many-partition — safe when the
    input is the whole dataset (bootstrap), not just a wave delta."""
    spark = df.sparkSession
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    parted = (
        df.repartitionByRange(n, *key_cols)
        .sortWithinPartitions(*key_cols)
        .withColumn("__pid", F.spark_partition_id())
        # eager localCheckpoint pins the partitioned DATA: the counts
        # job and the rank job must see the identical partitioning, and
        # a mere persist() could silently recompute (resampling the
        # range boundaries) after executor loss — checkpointed blocks
        # either survive or fail the job, never skew it. Blocks are
        # freed when the frame is GC'd (no cross-wave cache leak).
        .localCheckpoint(eager=True)
    )
    counts = {
        r["__pid"]: r["n"]
        for r in parted.groupBy("__pid").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    if not offsets:
        return df.select(*key_cols, F.lit(None).cast("int").alias(out_col))
    off_df = spark.createDataFrame(offsets, "__pid int, __off long")
    w = Window.partitionBy("__pid").orderBy(*key_cols)
    return (
        parted.join(F.broadcast(off_df), "__pid")
        .withColumn(out_col, (F.col("__off") + F.row_number().over(w))
                    .cast("int"))
        .drop("__pid", "__off")
    )


def _tk_examples(stage: Stage, prev_content: DataFrame,
                 cols: list[str]) -> DataFrame:
    """Per-TK example previous row (min-SK — deterministic, unlike the
    reference's 'any example'): (tk…, __prev_<col>…)."""
    tk = stage.tk_cols
    example_w = Window.partitionBy(*tk).orderBy(*stage.sk_cols)
    return (
        prev_content
        .withColumn("__rn", F.row_number().over(example_w))
        .filter(F.col("__rn") == 1)
        .select(*tk, *[F.col(c).alias(f"__prev_{c}") for c in cols])
    )


def _apply_preserve(
    stage: Stage, produced: DataFrame, prev_content: DataFrame
) -> DataFrame:
    """PreserveKeyValues (reference op 20:
    ParquetProducerOptions.cs:16-28, README.md:218-232): produced rows
    of a TK that already existed may keep values from that TK's
    previous row. Three forms (see Stage):

    * ``preserve_col`` — surrogate-id: existing TKs inherit their id;
      brand-new TKs get ``max(prev ids) + rank(tk among new tks)`` —
      deterministic and parallel, replacing the reference tests'
      mutable ``nextId++`` (ParquetProductionTests.cs:573). The novel-
      key rank is distributed (:func:`_global_rank`), so bootstrapping
      the full dataset never funnels through one partition.
    * ``preserve_cols`` — inherit listed value columns verbatim.
    * ``preserve_merge`` — arbitrary pandas merge of produced row +
      previous example values.
    """
    tk = stage.tk_cols
    out = produced

    if stage.preserve_col:
        col = stage.preserve_col
        examples = _tk_examples(stage, prev_content, [col]).withColumnRenamed(
            f"__prev_{col}", "__example")
        new_tks = _global_rank(
            out.select(*tk).distinct()
            .join(examples.select(*tk), tk, "left_anti"),
            tk, "__new_id",
        )
        max_prev = prev_content.agg(
            F.coalesce(F.max(col), F.lit(0)).alias("__max_prev")
        )
        out = (
            out.join(examples, tk, "left")
            .join(new_tks, tk, "left")
            .join(F.broadcast(max_prev))
            .withColumn(
                col,
                F.coalesce(F.col("__example"),
                           F.col("__max_prev") + F.col("__new_id")),
            )
            .drop("__example", "__new_id", "__max_prev")
        )

    if stage.preserve_cols:
        examples = _tk_examples(stage, prev_content, stage.preserve_cols)
        out = out.join(examples, tk, "left")
        for c in stage.preserve_cols:
            out = out.withColumn(
                c, F.coalesce(F.col(f"__prev_{c}"), F.col(c)))
        out = out.drop(*[f"__prev_{c}" for c in stage.preserve_cols])

    if stage.preserve_merge is not None:
        value_cols = stage.value_cols
        merge = stage.preserve_merge
        examples = _tk_examples(stage, prev_content, value_cols)
        joined = out.join(examples, tk, "left")
        schema = joined.drop(
            *[f"__prev_{c}" for c in value_cols]).schema

        def run(batches):
            for pdf in batches:
                res = merge(pdf)
                yield res[[f.name for f in schema.fields]]

        out = joined.mapInPandas(run, schema=schema)

    return out.select(*produced.columns)
