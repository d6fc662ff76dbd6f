"""Chunk-table compaction (rewrite_data_files analogue): runts merge
into full chunks, survivors pass through byte-identical, row multiset
is preserved exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet_producers_spark.compaction import compact_chunks, compaction_plan
from parquet_producers_spark.datagen import source_code_df
from parquet_producers_spark.encoder import decode_chunks, encode_partitions

N_FILES = 3000
CHUNK = 512


@pytest.fixture(scope="module")
def runty_chunks(spark):
    """Encode in 12 partitions with chunk_rows=512: each partition's
    trailing slice is a runt (3000/12 = 250 rows per partition → every
    chunk is a runt in 8 partitions; mixed in the rest)."""
    src = source_code_df(spark, N_FILES, seed=7, partitions=4)
    return encode_partitions(
        src, sort_cols=["repo", "path"], partitions=12, chunk_rows=CHUNK,
    ).localCheckpoint(eager=True)


def _multiset(df):
    return sorted(tuple(r) for r in df.collect())


def test_compaction_preserves_rows_and_reduces_chunks(spark, runty_chunks):
    before = decode_chunks(runty_chunks, ordered=False)
    compacted = compact_chunks(
        runty_chunks, sort_cols=["repo", "path"], chunk_rows=CHUNK,
        partitions=4,
    ).localCheckpoint(eager=True)
    after = decode_chunks(compacted, ordered=False)

    assert _multiset(after) == _multiset(before)  # bit-identical multiset

    n_before = runty_chunks.select("part_id", "chunk_seq").distinct().count()
    n_after = compacted.select("part_id", "chunk_seq").distinct().count()
    assert n_after < n_before

    # every rewritten chunk except at most the last is exactly full
    runt_after = (
        compacted.select("part_id", "chunk_seq", "n_rows").distinct()
        .filter(F.col("n_rows") < CHUNK).count()
    )
    assert runt_after <= compacted.select("part_id").distinct().count()


def test_compaction_passes_full_chunks_through_untouched(spark, runty_chunks):
    compacted = compact_chunks(
        runty_chunks, sort_cols=["repo", "path"], chunk_rows=CHUNK,
        partitions=4,
    )
    full_before = {
        (r["part_id"], r["chunk_seq"], r["column"]): bytes(r["data"])
        for r in runty_chunks.filter(F.col("n_rows") >= CHUNK).collect()
    }
    full_after = {
        (r["part_id"], r["chunk_seq"], r["column"]): bytes(r["data"])
        for r in compacted.join(
            runty_chunks.select("part_id", "chunk_seq").distinct(),
            ["part_id", "chunk_seq"], "left_semi",
        ).collect()
    }
    assert full_after == full_before  # same identities, same encoded bytes


def test_compaction_new_part_ids_do_not_collide(spark, runty_chunks):
    compacted = compact_chunks(
        runty_chunks, sort_cols=["repo", "path"], chunk_rows=CHUNK,
        partitions=4,
    )
    max_old = runty_chunks.agg(F.max("part_id")).first()[0]
    rewritten = compacted.filter(F.col("part_id") > max_old)
    assert rewritten.count() > 0
    # rewritten region is key-clustered: zone maps are orderable
    zones = (
        rewritten.filter(F.col("column") == "repo")
        .select("part_id", "chunk_seq", "key_min", "key_max")
        .collect()
    )
    for z in zones:
        assert z["key_min"] <= z["key_max"]


def test_compaction_plan_counts_runts_without_reading_blobs(spark, runty_chunks):
    plan = compaction_plan(runty_chunks, runt_threshold=CHUNK)
    rows = {r["column"]: r for r in plan.collect()}
    assert set(rows) == {"repo", "path", "commit", "lang", "content"}
    manifest = runty_chunks.select("column", "n_rows", "enc_bytes").collect()
    for col in rows:
        expect_runts = sum(
            1 for m in manifest if m["column"] == col and m["n_rows"] < CHUNK)
        assert rows[col]["runt_chunks"] == expect_runts
        assert rows[col]["runt_bytes"] + rows[col]["carried_bytes"] == sum(
            m["enc_bytes"] for m in manifest if m["column"] == col)


def test_compaction_rejects_layout_columns(spark, runty_chunks):
    with pytest.raises(ValueError, match="layout"):
        compact_chunks(runty_chunks.withColumn("slice_id", F.lit(0)),
                       sort_cols=["repo"])


def test_compact_stage_writes_new_version_with_lineage(spark, tmp_path):
    """Versioned-layout integration: v=1 encoded with runty parameters,
    compact_stage writes v=2 — decoded parity, fewer chunks, manifests
    carry compacted_from, slice discipline preserved, resume skips."""
    import json

    from parquet_producers_spark.compaction import compact_stage
    from parquet_producers_spark.datagen import source_code_df
    from parquet_producers_spark.storage import (
        encode_run,
        list_versions,
        manifest_path,
        read_chunks,
    )

    root = str(tmp_path)
    src = source_code_df(spark, 1500, seed=11, partitions=3).cache()
    encode_run(
        spark, src, root, "code", version=1,
        sort_cols=["repo", "path"], n_slices=3, chunk_rows=192,
        partitions_per_slice=2,
    )
    v1 = read_chunks(spark, root, "code", 1).localCheckpoint(eager=True)

    res = compact_stage(spark, root, "code", version=1, chunk_rows=192,
                        partitions_per_slice=1)
    assert [r.skipped for r in res] == [False, False, False]
    assert list_versions(root, "code") == [1, 2]
    v2 = read_chunks(spark, root, "code", 2).localCheckpoint(eager=True)

    # decoded parity across versions
    a = sorted(tuple(r) for r in decode_chunks(v1, ordered=False).collect())
    b = sorted(tuple(r) for r in decode_chunks(v2, ordered=False).collect())
    assert a == b

    # fewer chunks, same slice partitioning
    def n_chunks(df):
        return df.select("slice_id", "part_id", "chunk_seq").distinct().count()
    assert n_chunks(v2) < n_chunks(v1)
    assert (sorted(r.slice_id for r in v2.select("slice_id").distinct().collect())
            == [0, 1, 2])

    # every rewritten row still lives in the slice its key hashes to
    from pyspark.sql import functions as F
    dec = decode_chunks(v2.filter(F.col("slice_id") == 1), ordered=False)
    derived = dec.withColumn(
        "s", F.pmod(F.hash(F.col("repo")), F.lit(3))).select("s").distinct().collect()
    assert [r.s for r in derived] == [1]

    # manifests carry lineage
    with open(manifest_path(root, "code", 2, 0)) as f:
        m = json.load(f)
    assert m["compacted_from"] == 1
    assert m["metrics"]["rows"] > 0

    # resume: second call skips every slice
    res2 = compact_stage(spark, root, "code", version=1, chunk_rows=192)
    assert [r.skipped for r in res2] == [True, True, True]
    src.unpersist()


def test_compact_if_needed_policy_gate(spark, tmp_path):
    """Healthy table → no-op returning the same version; runty table →
    compaction runs and the new version is returned."""
    from parquet_producers_spark.compaction import compact_if_needed
    from parquet_producers_spark.datagen import source_code_df
    from parquet_producers_spark.storage import encode_run, list_versions

    root = str(tmp_path)
    src = source_code_df(spark, 1500, seed=11, partitions=3).cache()

    # runty: chunk_rows=192 leaves a ~58-row runt per partition
    encode_run(spark, src, root, "runty", version=1,
               sort_cols=["repo", "path"], n_slices=3, chunk_rows=192,
               partitions_per_slice=2)
    assert compact_if_needed(spark, root, "runty", 1, chunk_rows=192,
                             partitions_per_slice=1) == 2
    assert list_versions(root, "runty") == [1, 2]

    # healthy: huge chunk_rows → one sub-threshold chunk per partition is
    # inevitable, but lower the runt bar so the fraction stays under it
    encode_run(spark, src, root, "healthy", version=1,
               sort_cols=["repo", "path"], n_slices=3, chunk_rows=192,
               partitions_per_slice=2)
    assert compact_if_needed(spark, root, "healthy", 1, chunk_rows=192,
                             runt_threshold=8) == 1
    assert list_versions(root, "healthy") == [1]
    src.unpersist()


def test_compact_chunks_noop_on_healthy_table(spark, runty_chunks):
    """A table with zero runts (the steady state after a compaction):
    compact_chunks returns it unchanged instead of crashing on the
    empty runt set's decode."""
    from parquet_producers_spark.compaction import compact_chunks

    # the fixture's chunks all hold ≥200 rows, so against a 200-row
    # runt bar the table is healthy and the runt set is empty
    assert runty_chunks.filter(F.col("n_rows") < 200).count() == 0

    out = compact_chunks(runty_chunks, sort_cols=["repo", "path"],
                         chunk_rows=CHUNK, runt_threshold=200)
    assert out.count() == runty_chunks.count()
    max_pid = runty_chunks.agg(F.max("part_id")).first()[0]
    assert out.filter(F.col("part_id") > max_pid).count() == 0  # no rewrites


def test_compact_if_needed_uses_manifest_chunk_rows(spark, tmp_path):
    """A maintain run without an explicit chunk_rows must judge runts
    against the geometry recorded in the stage manifests — NOT the
    global default (which would reclassify a custom-geometry stage as
    100% runts and rewrite everything)."""
    import json

    from parquet_producers_spark.compaction import compact_if_needed
    from parquet_producers_spark.storage import (
        encode_run,
        manifest_path,
        read_chunks,
    )

    root = str(tmp_path)
    src = source_code_df(spark, 1500, seed=11, partitions=3).cache()
    encode_run(spark, src, root, "code", version=1,
               sort_cols=["repo", "path"], n_slices=3, chunk_rows=192,
               partitions_per_slice=2)
    with open(manifest_path(root, "code", 1, 0)) as f:
        assert json.load(f)["chunk_rows"] == 192

    # no chunk_rows argument: geometry comes from the manifest (192),
    # the runty stage compacts, and the rewrite keeps 192-row chunks
    assert compact_if_needed(spark, root, "code", 1,
                             partitions_per_slice=1) == 2
    v2 = read_chunks(spark, root, "code", 2)
    assert v2.agg(F.max("n_rows")).first()[0] <= 192
    with open(manifest_path(root, "code", 2, 0)) as f:
        assert json.load(f)["chunk_rows"] == 192
    src.unpersist()


@pytest.mark.parametrize("n_docs,chunk,parts", [
    (700, 64, 5),    # many small partitions, heavy runt tail
    (901, 128, 3),   # odd size, remainder-heavy
    (256, 256, 2),   # partitions smaller than a chunk: all runts
])
def test_compaction_multiset_parametrized(spark, n_docs, chunk, parts):
    """Across geometries (remainders, all-runt, mixed): compaction
    preserves the exact row multiset and never collides chunk ids."""
    from parquet_producers_spark.compaction import compact_chunks

    src = source_code_df(spark, n_docs, seed=5, partitions=3)
    chunks = encode_partitions(
        src, sort_cols=["repo", "path"], partitions=parts, chunk_rows=chunk,
    ).localCheckpoint(eager=True)
    comp = compact_chunks(
        chunks, sort_cols=["repo", "path"], chunk_rows=chunk, partitions=2,
    ).localCheckpoint(eager=True)
    assert _multiset(decode_chunks(comp, ordered=False)) == \
        _multiset(decode_chunks(chunks, ordered=False))
    # (part_id, chunk_seq, column) identities stay unique after rewrite
    assert comp.select("part_id", "chunk_seq", "column").distinct().count() \
        == comp.count()
