"""Snapshot-manifest table layout (the Iceberg-shaped input layer):
atomic commits, manifest-driven scans, time travel, append vs replace,
and feeding the file list to the direct-scan encoder."""

from __future__ import annotations

import pytest

from parquet_producers_spark.sources.snapshots import (
    commit_snapshot,
    list_snapshots,
    read_snapshot,
    snapshot_files,
)


def test_append_replace_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    s1 = commit_snapshot(spark, df1, t)
    assert s1 == 1 and list_snapshots(t) == [1]
    assert sorted((r.id, r.v) for r in read_snapshot(spark, t).collect()) == [
        (1, "a"), (2, "b")]

    df2 = spark.createDataFrame([(3, "c")], "id int, v string")
    s2 = commit_snapshot(spark, df2, t, mode="append")
    assert s2 == 2
    assert sorted(r.id for r in read_snapshot(spark, t).collect()) == [1, 2, 3]
    # time travel: snapshot 1 unchanged
    assert sorted(r.id for r in read_snapshot(spark, t, 1).collect()) == [1, 2]

    df3 = spark.createDataFrame([(9, "z")], "id int, v string")
    s3 = commit_snapshot(spark, df3, t, mode="replace")
    assert s3 == 3
    assert [r.id for r in read_snapshot(spark, t).collect()] == [9]
    # all history still readable
    assert sorted(r.id for r in read_snapshot(spark, t, 2).collect()) == [1, 2, 3]

    with pytest.raises(ValueError):
        read_snapshot(spark, t, 7)

    files = snapshot_files(t, 2)
    assert sum(f["rows"] or 0 for f in files) == 3
    assert all(f["path"].endswith(".parquet") for f in files)


def test_snapshot_feeds_direct_encoder(spark, tmp_path):
    """snapshot file list → encode_files (manifest-driven direct-scan
    encode, the north-rule input path)."""
    import hashlib

    from parquet_producers_spark.datagen import source_code_df
    from parquet_producers_spark.encoder import decode_chunks, encode_files

    t = str(tmp_path / "code_tbl")
    src = (
        source_code_df(spark, 400, seed=13, partitions=2)
        .repartitionByRange(3, "repo", "path")
        .sortWithinPartitions("repo", "path")
    )
    commit_snapshot(spark, src, t)
    paths = [f["path"] for f in snapshot_files(t)]
    decoded = decode_chunks(encode_files(spark, paths, key_col="repo"),
                            ordered=False)

    def digest(df):
        h = hashlib.sha256()
        for r in df.orderBy("repo", "path").collect():
            h.update((r.repo + r.path + r.content).encode())
        return h.hexdigest()

    assert digest(decoded) == digest(read_snapshot(spark, t))


def test_snapshot_diff_incremental_scan(spark, tmp_path):
    """snapshot_diff reads exactly the rows of files added between two
    snapshots (append mode) — the changed-data feed for incremental
    pipeline waves — and the full file set after a replace."""
    from parquet_producers_spark.sources.snapshots import (
        commit_snapshot,
        read_snapshot,
        snapshot_diff,
    )

    t = str(tmp_path / "tbl")
    s1 = commit_snapshot(spark, spark.createDataFrame(
        [(1, "a"), (2, "b")], "id int, v string").coalesce(1), t)
    s2 = commit_snapshot(spark, spark.createDataFrame(
        [(3, "c")], "id int, v string").coalesce(1), t, mode="append")
    got = sorted(tuple(r) for r in snapshot_diff(spark, t, s1, s2).collect())
    assert got == [(3, "c")]
    # latest default + self-diff is empty
    assert snapshot_diff(spark, t, s1).count() == 1
    assert snapshot_diff(spark, t, s2, s2).count() == 0
    # replace commit: every file is new relative to s2
    s3 = commit_snapshot(spark, spark.createDataFrame(
        [(9, "z")], "id int, v string").coalesce(1), t, mode="replace")
    assert [tuple(r) for r in snapshot_diff(spark, t, s2, s3).collect()] == [
        (9, "z")]
    assert sorted(tuple(r) for r in read_snapshot(spark, t, s3).collect()) \
        == [(9, "z")]
