"""Zone-planned sorted-merge read of the encoded chunk store.

``decode_chunks(ordered=True)`` reproduces encode order with a TOTAL
sort (Spark ``orderBy``: a sampling job + range shuffle of decoded
rows) — the expensive path the reference never pays, because its
consumers iterate sorted runs and k-way merge them
(Parquet.Producers/ParquetSortedMerge.cs:10-52 merges pre-sorted
sequences instead of re-sorting).

This module is that consumer, Spark-first: the chunk table's KEY ZONE
maps (``key_min``/``key_max``, written by every encode) already
describe where each sorted run's chunks live, so globally ordered
output needs no sampling and no global sort —

1. **Plan** (driver, metadata only): distinct chunk zones → ``R``
   DISJOINT key ranges cut at chunk boundaries, weighted by row counts
   (the same planning input Spark's range partitioner must sample a
   data pass to estimate).
2. **Assign**: each chunk joins (broadcast) every range its zone
   overlaps — after consolidation runs are disjoint and the fan-out is
   ~1; overlapping incremental waves are where the merge actually
   merges.
3. **Decode + exact filter + merge, one task per range**: the group
   key IS the range, so each task receives every chunk its range
   overlaps (compressed bytes — the ONLY shuffle in the plan), decodes
   them, drops rows outside the range's half-open bounds (the zone
   plan is never a correctness filter, duplicates from multi-range
   chunks can't survive), and concatenates the runs.
4. **Local sort, no exchange**: a ``sortWithinPartitions`` on
   ``(range_id, key)`` — ranges are already whole inside their task's
   partition, so this is a partition-local sort with no shuffle;
   ranges tile the key space in id order, so reading (or writing)
   ranges in order IS the k-way merge of all runs.

Scale shape: decoded ROWS are never shuffled at all — the one
exchange moves compressed chunk blobs clustered by range (≈4× smaller
than the rows they decode to), where ``orderBy`` pays a sampling job
plus a skew-prone range exchange of full decoded rows. Memory rule:
one range decodes inside one task, so size ``n_ranges`` such that
``total_rows / n_ranges`` fits an executor's Python worker (the
planner balances ranges by row count; ``n_ranges`` may exceed core
count freely).

Ordering contract: zones compare as STRINGS (they are ``str()`` of the
key — encoder.py:169), so the produced order is the key's string
order. Use string keys (the north-rule corpus sorts on repo/path
strings) or zero-pad numerics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .encoder import CHUNK_ARROW_SCHEMA, _arrow_type, _spark_type


def _ident_cols(chunks: DataFrame) -> list[str]:
    """A chunk's identity: any layout columns (slice_id, enc_version,
    …) + (part_id, chunk_seq) — same rule decode_chunks uses."""
    layout = [c for c in chunks.columns
              if c not in {f.name for f in CHUNK_ARROW_SCHEMA}]
    return layout + ["part_id", "chunk_seq"]


def plan_key_ranges(
    chunks: DataFrame,
    n_ranges: int | None = None,
) -> list[tuple[str | None, str | None]]:
    """Cut the key space into ``n_ranges`` half-open ranges
    ``[lo, hi)`` (``None`` = unbounded) from the chunk table's zone
    maps — a driver-side pass over CHUNK METADATA (one row per chunk,
    no blobs, no data), cut points at chunk ``key_min`` boundaries and
    weighted by per-chunk row counts so ranges balance even when runs
    overlap or skew."""
    ident = _ident_cols(chunks)
    zones = (
        chunks.groupBy(*ident)
        .agg(F.first("key_min").alias("mn"),
             F.first("key_max").alias("mx"),
             F.first("n_rows").alias("rows"))
        .collect()
    )
    if any(z["mn"] is None for z in zones) or not zones:
        raise ValueError(
            "sorted read needs key zones on every chunk — "
            "encode with a key_col")
    zones.sort(key=lambda z: (z["mn"], z["mx"]))
    total = sum(z["rows"] for z in zones)
    r = n_ranges or max(1, min(
        len(zones),
        int(chunks.sparkSession.conf.get("spark.sql.shuffle.partitions"))))
    cuts: list[str] = []
    cum = 0
    nxt = total / r
    for z in zones[1:]:
        cum += z["rows"]
        if cum >= nxt and (not cuts or z["mn"] > cuts[-1]):
            cuts.append(z["mn"])
            nxt = cum + total / r
    bounds = [None] + cuts + [None]
    return [(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)]


def read_sorted(
    chunks: DataFrame,
    key: str,
    n_ranges: int | None = None,
) -> DataFrame:
    """Decode the chunk store globally ordered by ``key``'s string
    order WITHOUT a total sort: zone-planned ranges, per-range decode +
    exact bounds, one hash shuffle on ``range_id``, local sort.

    Returns the decoded columns plus ``range_id``; within every output
    partition rows are physically sorted by ``(range_id, key)`` and
    range ids tile the key space, so consuming ranges in id order (or
    :func:`write_sorted`'s directory layout) yields the full table in
    key order — the reference's sorted-consumer semantics
    (Parquet.Producers/ParquetSortedRead.cs:12-49) re-expressed as a
    plan, not an iterator.

    Plan shape (the point of the module): ONE exchange total, and it
    moves compressed chunk blobs clustered by ``range_id`` — decoded
    rows never shuffle. Each range decodes + merges wholly inside its
    group task, then ``sortWithinPartitions`` orders without an
    exchange (ranges are already whole in their partition)."""
    import pandas as pd

    spark = chunks.sparkSession
    # plan_key_ranges raises on any zone-less chunk — the null guard
    # rides the same metadata job instead of paying its own
    ranges = plan_key_ranges(chunks, n_ranges)
    ident = _ident_cols(chunks)

    # assignment = broadcast theta-join of the chunk rows against the
    # tiny range list on zone overlap (chunk [key_min,key_max] ∩ range
    # [lo,hi), string order) — no driver-side fan-out, so the plan
    # holds at any chunk count
    rdf = spark.createDataFrame(
        pd.DataFrame({"range_id": range(len(ranges)),
                      "lo": [r[0] for r in ranges],
                      "hi": [r[1] for r in ranges]}),
        schema="range_id int, lo string, hi string")
    fat = chunks.join(
        F.broadcast(rdf),
        (F.col("lo").isNull() | (F.col("key_max") >= F.col("lo")))
        & (F.col("hi").isNull() | (F.col("key_min") < F.col("hi"))),
        "inner")

    # group-decode per RANGE: the group key is (range_id, bounds), so
    # the groupBy's hash exchange — the plan's only shuffle — moves the
    # compressed blobs of each range onto one task, which reassembles
    # every overlapping chunk, bound-filters, and concatenates the runs
    import json

    import pyarrow as pa

    from .encoder import decode_array

    heads = (
        chunks.groupBy("col_idx", "column")
        .agg(F.first("params").alias("params"))
        .orderBy("col_idx")
        .collect()
    )
    fields = [
        pa.field(r["column"], _arrow_type(json.loads(r["params"])["atype"]))
        for r in heads
    ]
    from .encoder import emit_schema

    col_names = [f.name for f in fields]
    data_schema = pa.schema(fields)
    out_schema = pa.schema([pa.field("range_id", pa.int32())] + fields)
    out_emit = emit_schema(list(out_schema))
    spark_schema = ", ".join(
        ["range_id int"]
        + [f"{f.name} {_spark_type(f.type)}" for f in fields])

    def dec(gkey, tin):
        # ARROW-NATIVE grouped decode (applyInArrow): blobs arrive and
        # decoded columns leave as Arrow — no pandas object conversion
        # in either direction (to_pandas on decoded strings was the
        # single largest cost of the pandas variant)
        import numpy as np
        import pyarrow.compute as pc

        def _py(v):
            return v.as_py() if hasattr(v, "as_py") else v

        rid, lo, hi = int(_py(gkey[0])), _py(gkey[1]), _py(gkey[2])
        # group the ≤ (chunks × columns) METADATA rows by chunk ident —
        # the loop never touches data rows
        ident_cols = [tin.column(c) for c in ident]
        by_chunk: dict[tuple, list[int]] = {}
        for i in range(tin.num_rows):
            by_chunk.setdefault(
                tuple(_py(c[i]) for c in ident_cols), []).append(i)
        colc, datac, parc = (tin.column("column"), tin.column("data"),
                             tin.column("params"))
        tables = []
        for rows in by_chunk.values():
            arrays = {
                _py(colc[i]): decode_array(
                    _py(datac[i]), json.loads(_py(parc[i])))
                for i in rows
            }
            tbl = pa.table([arrays[c] for c in col_names],
                           schema=data_schema)
            ks = pc.cast(tbl.column(key), pa.string())
            mask = None
            if lo is not None:
                mask = pc.greater_equal(ks, lo)
            if hi is not None:
                m = pc.less(ks, hi)
                mask = m if mask is None else pc.and_(mask, m)
            if mask is not None:
                tbl = tbl.filter(mask)
            if tbl.num_rows:
                tables.append(tbl)
        data = (pa.concat_tables(tables) if tables
                else data_schema.empty_table())
        cols = [pa.array(np.full(data.num_rows, rid, np.int32))]
        cols += [data.column(c) for c in col_names]
        tbl = pa.table(cols, schema=out_schema)
        return tbl if out_schema == out_emit else tbl.cast(out_emit)

    out = fat.groupBy("range_id", "lo", "hi").applyInArrow(
        dec, schema=spark_schema)
    # partition-local sort, NO exchange: every range is whole inside
    # its group's partition, so (range_id, key) order within partitions
    # + range tiling = global key order across ranges in id order
    return out.sortWithinPartitions("range_id", F.col(key).cast("string"))


def write_sorted(
    chunks: DataFrame,
    key: str,
    out_dir: str,
    n_ranges: int | None = None,
) -> None:
    """Materialize the sorted-merge read as a sorted table layout:
    ``range_id=NNN`` directories in key order, each file internally
    sorted — the reference's sorted-parquet PRODUCER output
    (its whole pipeline contract: sorted runs in, sorted table out)
    with no global sort in the plan."""
    (read_sorted(chunks, key, n_ranges)
     .write.mode("overwrite").partitionBy("range_id").parquet(out_dir))
